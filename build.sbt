ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "realtimespark"
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
// The driver's bench harness parses the LAST stdout line of
// `sbt "runMain graft.Bench"` as JSON; two sbt behaviors broke that for
// seven straight rounds (BENCH_r10..r16 all parsed:null):
//  1. the trailing "[success] Total time: ..." banner lands AFTER
//     Bench's closing JSON line — suppressed via showSuccess,
//  2. the default LoggedOutput strategy prefixes every forked-process
//     stdout line with "[info] ", so the closing line was never bare
//     JSON — StdoutOutput passes the child's stdout through verbatim.
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // The full Bench sweep JIT-compiles thousands of generated classes
  // (180 queries × 3 passes + the streaming path); the JVM's default
  // 240 MB code cache fills mid-suite, the JIT silently disables, and
  // everything after runs interpreted — measured as the streaming knee
  // collapsing 4× (320k/s clean-JVM vs 80k/s in-suite) and warm passes
  // reading SLOWER than one-shot. Reserved ≠ committed, so the larger
  // cap costs nothing when unused.
  "-XX:ReservedCodeCacheSize=1g",
)
