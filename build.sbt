ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "graphdatasciencespark"
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
// Forked run output goes straight to this process's stdout/stderr with NO
// "[info] " prefix — the driver json-parses graft.Bench's stdout line, and
// sbt's default logger-wrapping broke that in round 1 (BENCH_r01 parsed:null).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Compile / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // 48g default: the machine has 128 GiB and local[32] at sf0.1 GC-thrashes
  // in 8g (BENCH_r02's louvain ran 4× slower than the same build at 48g —
  // the driver's bench env does not set SPARK_DRIVER_MEM).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // Pin Xms = Xmx: the periodic System.gc() (ContextCleaner driver, see
  // Bench.scala) otherwise SHRINKS the committed heap to ~4-6 GiB, and the
  // next allocation-heavy query regrows it through a storm of young GCs
  // (measured: 106 young pauses / 11.3 s STW over a 146 s six-query run,
  // with per-query wall swinging 13->40 s run-to-run purely on GC state).
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // ... and make that System.gc() a CONCURRENT G1 cycle instead of a
  // stop-the-world full collection (0.25-1.7 s pauses each, heap-shrink
  // included): reference processing at remark still drives ContextCleaner.
  "-XX:+ExplicitGCInvokesConcurrent",
  // 10-23s G1 pauses at high parallelism showed up as fake anti-scaling in
  // the 2->8 grids (a single-JVM local-mode artifact: allocation rate grows
  // with cores while the shared heap doesn't; real clusters have per-executor
  // heaps). SPARK_JVM_EXTRA lets benches pin GC flags without a rebuild.
) ++ sys.env.get("SPARK_JVM_EXTRA").map(_.trim.split("\\s+").toSeq).getOrElse(Seq.empty)
