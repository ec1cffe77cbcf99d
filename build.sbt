ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pythonvectordbspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Pass the forked app's stdout straight through instead of routing it via
// sbt's logger: every round's driver-captured bench artifact has
// `parsed: null` because each output line arrives prefixed with "[info] ",
// which defeats line-wise JSON parsing. With StdoutOutput the JSON lines
// Bench/Verify print start at column 0 and parse as-is.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// Heap: SPARK_DRIVER_MEM wins; otherwise size to the machine (1/8 of
// physical, clamped to [4g, 16g]). Empirically the SWEET SPOT is moderate:
// the round-1 bench at -Xmx8g ran the 50-query sweep in 161s flat, while
// -Xmx48g runs showed erratic 10-40s per-query outliers (lazily-committed
// G1 old gen + giant young collections). Small heaps also keep JVM startup
// working on modest dev/CI hosts.
val driverHeapGb: Int = sys.env.get("SPARK_DRIVER_MEM") match {
  case Some(m) => m.toLowerCase.stripSuffix("g").toInt
  case None =>
    val physGb = try {
      val kb = scala.io.Source.fromFile("/proc/meminfo").getLines()
        .find(_.startsWith("MemTotal")).map(_.replaceAll("[^0-9]", "").toLong)
        .getOrElse(32L * 1024 * 1024)
      (kb / 1024 / 1024).toInt
    } catch { case _: Throwable => 32 }
    math.max(4, math.min(16, physGb / 8))
}
javaOptions ++= jdk17AddOpens ++ Seq(
  // SIMD kernels (graft.functions.SimdKernels) use the JDK Vector API;
  // on a real cluster add this to spark.executor.extraJavaOptions too
  "--add-modules", "jdk.incubator.vector",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${driverHeapGb}g",
  sys.env.get("GRAFT_GC_LOG").map(f => s"-Xlog:gc*:file=$f:time,uptime")
    .getOrElse("-Dgraft.gclog=off"),
)
// (scalac resolves jdk.incubator.vector from the jrt image without flags;
// only the runtime JVM needs --add-modules above)
