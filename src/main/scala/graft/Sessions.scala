package graft

import org.apache.spark.sql.SparkSession

/** The single place every entry point (Bench / Verify / QTime / Plans /
  * Smoke / RefBench and the test suite) builds its SparkSession.
  *
  * Session-critical flags live here so a new entry point can never miss
  * them — in particular `spark.sql.legacy.parquet.nanosAsLong`, which
  * lets a TIMESTAMP(NANOS) events fixture (the r<=7 vintage) read as
  * nanos-long instead of failing outright, and the pinned UTC timezone,
  * which makes `Tables.normalizeEventTs`'s NTZ→TIMESTAMP cast for the
  * current timestamp[us] vintage an exact reinterpretation. Either way
  * a raw ts must flow through `Tables.events` / `normalizeEventTs`
  * before any timestamp query sees it.
  */
object Sessions {

  /** Local session with the project-standard configs. `shufflePartitions`
    * defaults to the core count (never Spark's 200 — we size shuffles to
    * the machine; a real cluster deployment would size to executors). */
  def local(
      cores: String,
      shufflePartitions: Option[String] = None,
      appName: String = "graft",
      logLevel: String = "WARN",
      extra: Map[String, String] = Map.empty): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.getOrElse(cores))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    extra.foreach { case (k, v) => b.config(k, v) }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel(logLevel)
    s
  }

  /** Core count from SPARK_GRAFT_CPUS, falling back to `defaultCpus`. */
  def fromEnv(defaultCpus: String, appName: String = "graft", logLevel: String = "WARN"): SparkSession =
    local(sys.env.getOrElse("SPARK_GRAFT_CPUS", defaultCpus), appName = appName, logLevel = logLevel)
}
