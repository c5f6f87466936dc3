ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kenshinbackupspark"
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
// The perf driver tail-parses `sbt -batch "runMain graft.Bench"` stdout
// for the bench's final `{"metric":"total",...}` JSON line. With sbt's
// default LoggedOutput every program line gets an `[info] ` prefix and
// sbt appends `[success] Total time: ...` after the run — 17 rounds of
// driver artifacts show `parsed: null` because of exactly that
// decoration. StdoutOutput passes forked-run output through raw, and
// showSuccess/showTiming suppress the epilogue so the bench's own total
// line is the absolute final stdout line.
run / outputStrategy := Some(StdoutOutput)
showSuccess := false
showTiming := false
// the two keys work (verified: no [success] epilogue on runMain) but
// sbt's unused-key lint cannot see their consumer — exclude them
Global / excludeLintKeys ++= Set(showSuccess, showTiming)
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
  // 103 bench queries x whole-stage-codegen classes overflow the default
  // 240m code cache late in the run; once full the JIT disables itself and
  // whichever query runs last absorbs seconds of deoptimized execution
  // (BENCH_r04/r05 billed it to q_ts_find_metrics, measured 0.7s alone).
  "-XX:ReservedCodeCacheSize=512m",
) ++
  // diagnostics hook for controlled bench experiments (e.g.
  // SPARK_GRAFT_EXTRA_JVM="-XX:+PrintCodeCache" to read JIT cache
  // occupancy at exit); unset in normal runs
  sys.env.get("SPARK_GRAFT_EXTRA_JVM")
    .map(_.split(" ").toSeq).getOrElse(Seq.empty)
