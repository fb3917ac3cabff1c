ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "graphemspark"
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
// Heap is CLAMPED: the sf0.1 bench was measured fastest at 8 GB — a
// 60-90 GB heap (driver-supplied SPARK_DRIVER_MEM) regressed the same
// workload 3-6x via GC thrash (huge young gen, poor locality). Honor
// smaller requests, cap the top end.
def heapMb(s: String): Long = {
  val t = s.trim.toLowerCase
  try {
    if (t.endsWith("g")) t.dropRight(1).toDouble.toLong * 1024L
    else if (t.endsWith("m")) t.dropRight(1).toDouble.toLong
    else if (t.endsWith("k")) t.dropRight(1).toDouble.toLong / 1024L
    else t.toDouble.toLong / (1024L * 1024L) // bare bytes
  } catch { case _: NumberFormatException => 8192L }
}
// SPARK_GRAFT_HEAP_MB bypasses the clamp explicitly (e.g. a genuinely
// larger scale factor that needs the headroom); otherwise clamping is
// logged so a silently-capped request is visible in the sbt output.
val graftHeapMb: Long = sys.env.get("SPARK_GRAFT_HEAP_MB").map(_.trim.toLong).getOrElse {
  val requested = heapMb(sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
  val clamped = math.max(1024L, math.min(requested, 12288L))
  if (clamped != requested)
    println(s"[graft] SPARK_DRIVER_MEM=${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")} " +
      s"clamped to ${clamped} MB (8-12 GB is the measured GC sweet spot; " +
      "set SPARK_GRAFT_HEAP_MB to override)")
  clamped
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${graftHeapMb}m",
  "-XX:+UseG1GC",
)
// Pass forked-run stdout through UNPREFIXED: the bench/verify mains
// print one machine-readable JSON line that the driver parses; sbt's
// default logger prefixes it with "[info] " and breaks that parse.
run / outputStrategy := Some(StdoutOutput)
