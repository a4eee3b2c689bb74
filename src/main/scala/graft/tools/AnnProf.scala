package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{AnnIndex, Similarity}

/** Stage-level wall profiler for the ANN-lifecycle keys — breaks
  * q_ann_upsert's composed contract into its component actions so
  * bench-headroom work attacks the biggest stage instead of the
  * whole key. Scratch diagnostic, run by hand:
  * `runMain graft.tools.AnnProf <sfDir>`.
  */
object AnnProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[annprof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    import graft.functions.VectorOps
    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      val emb = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding"))
      val stratum = emb.filter(pmod(col("vec_id"), lit(20)) === 7
        && col("vec_id") < 2000)
      val replaced = stratum.select(col("vec_id"),
        reverse(col("embedding")).as("embedding"))
      val inserted = stratum.select(
        (col("vec_id") + 10000000L).as("vec_id"),
        reverse(col("embedding")).as("embedding"))
      val batch = replaced.unionByName(inserted)
      val upserted = emb
        .join(batch.select("vec_id"), Seq("vec_id"), "left_anti")
        .unionByName(batch)
      val queries = emb.filter(pmod(col("vec_id"), lit(100)) === 0
        && col("vec_id") < 2000)
      val dir = java.nio.file.Files.createTempDirectory("graft_annprof")
        .toString
      try {
        t("memo base (full index)") {
          graft.IndexMemo.dir(
            s"annprof|$sfDir|$round") { d =>
            val b = emb.filter(pmod(col("vec_id"), lit(20)) === 13
              && col("vec_id") < 2000)
            AnnIndex.buildIvfqIndex(
              emb.join(b.select("vec_id"), Seq("vec_id"), "left_anti"),
              d, nlist = 16)
            AnnIndex.appendIvfq(b, d)
          }
        }
        t("copyTree") {
          graft.IndexMemo.copyTree(
            graft.IndexMemo.dir(s"annprof|$sfDir|$round")(_ => ()), dir)
        }
        val centroids = t("readCentroids") {
          AnnIndex.readCentroids(spark, dir)
        }
        t("upsert#1 delete") {
          AnnIndex.deleteVectors(batch.select(col("vec_id")), dir)
        }
        t("upsert#1 purge") { AnnIndex.purgeIvfqDeletes(spark, dir) }
        t("upsert#1 append") { AnnIndex.appendIvfq(batch, dir) }
        val served = AnnIndex.ivfqTopKFromPath(spark, dir, upserted, queries,
          k = 5, nProbe = 4, rerank = 4).cache()
        t("serve (force cache)") { served.count() }
        val exact = upserted.select(col("vec_id"),
            VectorOps.asDoubleArray(col("embedding")).as("cv"))
          .withColumn("cn", VectorOps.l2Norm(col("cv")))
        val quant = t("quantizedCorpus") {
          Similarity.quantizedCorpus(upserted)
        }
        val rebuilt = Similarity.ivfqRerank(quant,
          exact, queries, centroids, k = 5, nProbe = 4, rerank = 4).cache()
        t("rebuild (force cache)") { rebuilt.count() }
        t("parity exceptAll x2") {
          served.exceptAll(rebuilt).isEmpty &&
            rebuilt.exceptAll(served).isEmpty
        }
        val servedRows = t("served.collect") { served.collect().toSet }
        t("replay delete") {
          AnnIndex.deleteVectors(batch.select(col("vec_id")), dir)
        }
        t("replay purge") { AnnIndex.purgeIvfqDeletes(spark, dir) }
        t("replay append") { AnnIndex.appendIvfq(batch, dir) }
        t("after serve+collect") {
          AnnIndex.ivfqTopKFromPath(spark, dir, upserted, queries,
            k = 5, nProbe = 4, rerank = 4).collect().toSet == servedRows
        }
        t("queries.count") { queries.count() }
        served.unpersist(blocking = false)
        rebuilt.unpersist(blocking = false)
      } finally {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete()
        }
        rm(new java.io.File(dir))
      }
    }
    spark.stop()
  }
}
