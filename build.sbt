ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "backendetlspark"
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
// Pass the forked JVM's stdout through RAW (no `[info] ` prefix): the
// bench/verify drivers parse the last stdout lines as JSON, and sbt's
// logger prefix breaks `json.loads` on an otherwise-valid line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Drop the `[success] Total time: …` trailer: the bench driver keeps only
// the LAST 2000 chars of stdout, and the 75-char trailer printed after the
// bench JSON line comes straight out of the line's head-room (BENCH_r03
// lost its head exactly this way).
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 24g default: the bench JVM runs ~64 queries × 2 passes in one heap;
  // at 8g, GC pauses from earlier queries' garbage were charged to whichever
  // query ran next (BENCH_r03 showed 6 s for a scan+agg that runs in 0.6 s
  // isolated). The container has 128 GiB.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
