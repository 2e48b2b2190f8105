ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "etlschoolspark"
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
// Forked run output must reach stdout WITHOUT sbt's "[info] " prefix:
// the bench driver tail-parses the JSON line and a prefixed line is
// unparseable (BENCH_r03 "parsed": null).
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
  // ~70 distinct query plans × whole-stage-codegen classes overflow the
  // default 240 MB JIT code cache mid-run; HotSpot then silently stops
  // compiling and later queries run interpreted at ~10x. Measured: the
  // full sf0.1 bench drops from 150 s to ~100 s with headroom here.
  "-XX:ReservedCodeCacheSize=1g",
  // Bench calls System.gc() between queries to retire each query's
  // garbage (isolation: a long concurrent-GC window otherwise taxes the
  // NEXT query, measured up to 10x). As a stop-the-world full collection
  // that isolation itself cost ~0.35 s/query (measured round 6: 162-query
  // sf0.1 bench 175.8 s with STW explicit GC, 119.7 s with none). A
  // CONCURRENT explicit cycle keeps the isolation and drops the pause:
  // same bench 132.2 s. JIT tiering is NOT the issue (C1-only: 178.9 s).
  "-XX:+ExplicitGCInvokesConcurrent",
)
