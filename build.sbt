ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "quanterrapipelinespark"
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
// forward the forked JVM's stdout RAW (no "[info] " prefix): Bench/Main
// print machine-parsed JSON lines that must reach the caller verbatim
run / outputStrategy := Some(StdoutOutput)
Compile / run / outputStrategy := Some(StdoutOutput)
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
// Heap budgeted against the environment AS FOUND at sbt load (round-5
// fix: round 4's fixed 16g pre-touched heap, stacked on five resident
// 4g pre-touched workers and a RAM-backed working set, was OOM-killed
// (exit 137) in the driver's environment where sbt, DuckDB, and the
// harness share the box). SPARK_DRIVER_MEM still overrides; the default
// derives from MemAvailable with a reserve for the bench's worker JVMs
// (<=5 x 4g), the tmpfs working set (~12g peak), and co-tenants.
val memAvailGb: Long = {
  try {
    val src = scala.io.Source.fromFile("/proc/meminfo")
    try src.getLines().find(_.startsWith("MemAvailable"))
      .map(_.split("\\s+")(1).toLong / (1024 * 1024)).getOrElse(64L)
    finally src.close()
  } catch { case _: Throwable => 64L }
}
// SPARK_DRIVER_MEM accepts any JVM -Xmx size string ('16g', '16384m',
// '17179869184'); whole-GiB values also feed the pre-touch budget below.
// Non-GiB forms pass through to -Xmx verbatim (r5 advice fix: the bare
// stripSuffix("g").toLong threw NumberFormatException at sbt load for
// previously accepted values like '16384m').
val driverMemOverride: Option[String] = sys.env.get("SPARK_DRIVER_MEM")
val driverHeapGb: Long = driverMemOverride match {
  case Some(m) if m.toLowerCase.matches("\\d+g") =>
    m.toLowerCase.stripSuffix("g").toLong
  case Some(m) if m.toLowerCase.matches("\\d+m") =>
    math.max(1L, m.toLowerCase.stripSuffix("m").toLong / 1024)
  case Some(_) => 16L // opaque form: assume the documented default budget
  case None    => math.max(6L, math.min(16L, memAvailGb - 40L))
}
val driverXmx: String =
  driverMemOverride.filterNot(_.toLowerCase.matches("\\d+g"))
    .getOrElse(s"${driverHeapGb}g")
javaOptions ++= jdk17AddOpens ++ Seq(
  // ParallelGC: G1's humongous-allocation handling collapses on this
  // workload's fat binary rows (multi-second young pauses); the
  // throughput collector is 3-30x faster end-to-end here.
  "-XX:+UseParallelGC",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$driverXmx",
)
// Bench/Main runs pre-touch the whole heap at startup: on this guest a
// lazily grown heap faults fresh pages through the host-side page path
// DURING measured work, and the penalty grows with thread count — the
// same fix that made the executor-pair workers clean (Bench.scala).
// Scoped to `run` so test JVMs keep fast startup. Pre-touch COMMITS the
// whole heap, so it is enabled only when MemAvailable leaves the full
// reserve on top of it; on a tight box the run keeps a lazy heap and
// survives (Bench.scala notes which mode ran).
Compile / run / javaOptions ++= {
  if (memAvailGb >= driverHeapGb + 48L)
    Seq(s"-Xms${driverHeapGb}g", "-XX:+AlwaysPreTouch",
      "-Dgraft.bench.heap=pretouched")
  else Seq("-Dgraft.bench.heap=lazy")
}
