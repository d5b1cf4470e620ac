ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "localsqlspark"
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
// The driver's bench contract wants the forked main's FINAL stdout line to
// be bare parseable JSON. By default sbt re-logs forked stdout behind
// "[info] " decoration (LoggedOutput) and then prints its own "[success]"
// line — BENCH_rNN.json `parsed` was null for 15 straight rounds because of
// exactly this. StdoutOutput passes the forked JVM's stdout through
// undecorated; showSuccess drops the trailing "[success] Total time" line so
// the tiny JSON line printed by Bench/Verify mains is genuinely last.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command engine, not a task — exclude
// it from the unused-key lint false positive
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
  // local[32] with a 100+-query workload needs real heap headroom: at
  // 8g the storage pool + shuffle spill churn degenerates into full-GC
  // stalls that add 20-40s to whichever heavy query hits the pressure
  // point (measured: same query 1s in isolation, 26-40s mid-suite).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
)
