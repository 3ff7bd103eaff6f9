ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dcosbcassandraspark"
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
// The round driver invokes Bench via sbt and parses JSON out of the
// captured stdout; sbt's default LoggedOutput prefixes every forked
// process line with "[info] ", which breaks that parse (BENCH_r01 and
// BENCH_r02 both recorded "parsed": null). StdoutOutput passes the
// forked process's stdout/stderr through verbatim so the bare
// {"metric":...} lines reach the driver unprefixed.
outputStrategy := Some(StdoutOutput)
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dlog4j2.configurationFile=file:log4j2.properties",
  "-Dspark.sql.session.timeZone=UTC",
  // 24g default (r16, guide §5): local[32] runs 32 concurrent tasks'
  // sort/agg/join buffers plus cached blocks in ONE JVM; at 8g the
  // full 316-query bench ran GC-bound (measured A/B, same session,
  // comparable canaries: 286.8 s at 8g vs 257.6 s at 24g, median
  // per-query ratio 0.853). The box has 128 GiB; SPARK_DRIVER_MEM
  // still overrides for constrained hosts.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
