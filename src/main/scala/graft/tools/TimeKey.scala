package graft.tools

import org.apache.spark.sql.SparkSession

/** Time individual `SparkEntry.queries` keys outside the full bench
  * sweep — the iteration loop for single-operator perf work (the
  * full `graft.Bench` pass is ~minutes at sf1+; re-measuring one
  * key should not cost that). Prints per-key wall seconds with a
  * CPU canary on both sides so a starved window is visible. Usage:
  * `SPARK_GRAFT_CPUS=32 runMain graft.tools.TimeKey <sfDir> <key>...`
  * (repeat a key to re-measure in a fresh window). */
object TimeKey {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TimeKey <sfDir> <key>...")
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(4, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.range(1000000).selectExpr("sum(id)").collect() // JVM warmup
    args.drop(1).foreach { key =>
      val fn = graft.SparkEntry.queries.getOrElse(key,
        sys.error(s"unknown key $key"))
      val pre = graft.Bench.probeParallel()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val secs = (System.nanoTime() - t0) / 1e9
      val post = graft.Bench.probeParallel()
      println(f"[timekey] $key: $secs%.2f s ($n rows; par_mops $pre%.0f/$post%.0f)")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
