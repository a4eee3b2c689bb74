ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sketchmlflinkspark"
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
// Forked run output must pass through unprefixed: sbt's default
// LoggedOutput strategy writes "[info] <line>" and can glue program
// stdout onto log noise, which corrupted the driver-parsed bench JSON
// (BENCH_r04 "parsed": null). StdoutOutput inherits this process's
// stdout directly.
run / outputStrategy := Some(StdoutOutput)
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // Thousand-round driver loops (TrainBpe at 8k merges) generate
  // enough Janino classes to fill the default ~240 MB code cache;
  // once it fills, HotSpot disables JIT compilation and every later
  // query runs interpreted. 512 MB keeps the longest measured run
  // (250 batch rounds × ~10 codegen'd stages) compiled throughout.
  "-XX:ReservedCodeCacheSize=512m",
)
// AQE's post-shuffle coalescing targets BYTES (minPartitionSize
// default 1m), which serializes CPU-BOUND stages over small data: at
// gate scale the 8-gram window of q_dedup_substring coalesced to 2
// tasks on a 32-core session (measured 0.86 s of a 1.4 s key; 64k
// floor: key 2.98 -> 1.68 s). At production scale post-shuffle
// partitions are far above either floor, so the knob is inert there —
// it is a small-shuffle parallelism floor, not a cluster tunable.
// Env-parameterized so the driver's lower-core bench rerun and any
// deployment can override it.
javaOptions += "-Dspark.sql.adaptive.coalescePartitions.minPartitionSize=" +
  sys.env.getOrElse("SPARK_GRAFT_MIN_COALESCE", "64k")
// Experiment/override hook: space-separated extra JVM options for
// forked runs (e.g. -Dspark.* conf probes during perf work).
javaOptions ++= sys.env.get("SPARK_GRAFT_EXTRA_JAVA_OPTS")
  .toSeq.flatMap(_.split(" ").filter(_.nonEmpty))
