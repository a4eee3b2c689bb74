package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{ImageDedup, Multimodal, VideoDedup}

object VidDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[vd] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = graft.Tables.documents(spark, sfDir)
    val corpus = t("plant") { VideoDedup.withPlantedTwins(docs).cache() }
    t("plant force") { corpus.count() }
    val prints = t("prints") { VideoDedup.fingerprints(corpus).cache() }
    t("prints force") { println(prints.count()) }
    val be = VideoDedup.bucketEntries(prints)
    t("bucketEntries count") { println(be.count()) }
    val ranked = be.withColumn("r", org.apache.spark.sql.functions.row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("bk"), col("bv"), col("ck"))
        .orderBy(col("doc_id")))).filter(col("r") <= 1000)
    t("ranked count") { println(ranked.count()) }
    val l = ranked.select(col("bk"), col("bv"), col("ck"), col("doc_id").as("a"))
    val r = ranked.select(col("bk"), col("bv"), col("ck"), col("doc_id").as("b"))
    val selfj = l.join(r, Seq("bk", "bv", "ck")).filter(col("a") < col("b")).select(col("a"), col("b"))
    t("selfjoin count (non-distinct)") { println(selfj.count()) }
    t("selfjoin distinct") { println(selfj.distinct().count()) }
    val cand = t("candidates") { VideoDedup.candidates(prints) }
    t("cand count") { println(cand.count()) }
    val res = t("dedup") { VideoDedup.dedupFromPrints(corpus.select(col("doc_id")), prints).cache() }
    t("dedup force") { println(res.count()) }
    val drops = res.filter(!col("keep") && pmod(col("doc_id"), lit(7)) === 0)
      .select(col("doc_id").as("y")).orderBy(col("y")).limit(256)
    t("drops") { println(drops.count()) }
    val msd = ImageDedup.maxSumDiff(600L)
    val yf = broadcast(drops.join(
      prints.select(col("doc_id").as("y"), col("fidx").as("fy"),
        col("thumb").as("ty"), col("sr").as("sry"),
        col("sg").as("sgy"), col("sb").as("sby")), Seq("y")))
    val fp = prints
      .select(col("doc_id").as("x"), col("thumb").as("tx"),
        col("sr").as("srx"), col("sg").as("sgx"), col("sb").as("sbx"))
      .join(yf, col("x") < col("y") &&
        abs(col("srx") - col("sry")) <= msd &&
        abs(col("sgx") - col("sgy")) <= msd &&
        abs(col("sbx") - col("sby")) <= msd)
      .select(col("x").as("ida"), col("y").as("idb"), col("fy"),
        col("tx").as("ta"), col("ty").as("tb"))
    t("truth frame pairs") { println(fp.count()) }
    t("truth confirm") {
      println(VideoDedup.frameDistances(fp).filter(col("mean_diff_e2") <= 600L).count())
    }
    spark.stop()
  }
}
