package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query-name filter (local iteration
    // only — the driver always runs the full registry with 2 args)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(',').toSet) else None
    val spark = Sessions.fromEnv("4", appName = "graft-verify")
    new java.io.File(outDir).mkdirs()
    // A failing query MUST leave a loud artifact: an output dir containing an
    // _ERROR sentinel (and no parquet), plus an entry in verify_failed.json.
    // The driver's DuckDB compare then records an err row instead of
    // silently dropping the query from the board (r7 postmortem: 4 broken
    // queries vanished and the board read 107/107 green).
    val failed = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
        System.err.println(s"[verify] $name FAILED: $msg")
        failed(name) = msg.linesIterator.take(3).mkString(" | ")
        // sentinel write is best-effort: an environmental failure (disk
        // full, unwritable outDir) must degrade THIS query's artifact,
        // not abort the run and lose everyone else's
        try {
          val dir = Paths.get(s"$outDir/$name")
          Files.createDirectories(dir)
          Files.writeString(dir.resolve("_ERROR"), msg)
        } catch { case e2: Throwable =>
          System.err.println(s"[verify] $name sentinel write failed: $e2")
        }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // under a local-iteration filter, restrict the oracle dump to the
    // filtered queries so the compare tool's completeness check (every
    // oracle key must have an output dir) stays meaningful; the driver
    // always runs unfiltered and gets the full registry
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Sidecar listing the failures (empty object when all green) — keeps
    // oracle_sql.json's schema stable for the driver while making any
    // breakage grep-able from the artifact dir.
    val failedJson = failed
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/verify_failed.json"), failedJson)
    if (failed.nonEmpty)
      System.err.println(
        s"[verify] ${failed.size} of ${SparkEntry.queries.size} queries FAILED: " +
          failed.keys.mkString(", "))
    spark.stop()
  }
}
