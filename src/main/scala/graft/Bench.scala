package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Single-thread CPU canary (xorshift64* spin, ~0.5 s): this VM has
    * documented host-level CPU-starvation windows where any query can
    * look 10-100× slower. Emitting mops before and after the run lets
    * a reader mechanically reject a starved bench instead of
    * mistaking it for a regression — healthy is ~1,500-1,900 mops
    * (BASELINE.md); starved windows measure orders of magnitude
    * lower. */
  private def canaryMops(): Double = {
    var x = 0x9e3779b97f4a7c15L
    var ops = 0L
    val t0 = System.nanoTime()
    while (System.nanoTime() - t0 < 500000000L) {
      var i = 0
      while (i < 1000000) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
      ops += 3000000 // 3 ALU ops per iteration
    }
    if (x == 42) System.err.println("") // defeat dead-code elimination
    math.round(ops / ((System.nanoTime() - t0) / 1e3) * 10.0) / 10.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(4, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup outside the timers: JVM/codegen/parquet-footer/OS-page-cache
    // costs would otherwise all land on whichever query runs first.
    // hash(struct(*)) references every column so the scan reads real
    // data pages (a bare count() is answered from footer metadata);
    // events needs the nanos conf that Tables.events would set.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.range(1000000).selectExpr("sum(id)").collect()
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet")
        .selectExpr("max(hash(struct(*)))").collect()
      catch { case e: Throwable =>
        System.err.println(s"[bench] warmup $t failed: ${e.getMessage}")
      }
    }
    val mopsPre = canaryMops()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val sec = (System.nanoTime() - t0) / 1e9
      // Per-query isolation: drop any cache/broadcast state a query
      // leaked so allocation-heavy successors don't pay its GC bill.
      // clearCache only covers SQL-level cache; RDD-level persists
      // (e.g. connected-components' final label RDD, which must stay
      // cached until the caller consumes it) are dropped explicitly.
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      name -> sec
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val mopsPost = canaryMops()
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""canary_mops_pre":$mopsPre,"canary_mops_post":$mopsPost,"sf":"$sfDir"}""")
    spark.stop()
  }
}
