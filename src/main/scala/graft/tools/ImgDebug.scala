package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.ImageDedup

/** Stage-level timing for the image-dedup pipeline:
  * `runMain graft.tools.ImgDebug <sfDir>` */
object ImgDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[img] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val corpus = time("plant+persist corpus") {
      val c = ImageDedup.withPlantedTwins(Tables.documents(spark, sfDir)).cache()
      c.count(); c
    }
    val thumbs = time("thumbnails (decode+hash)") {
      val t = ImageDedup.thumbnails(corpus).cache()
      t.count(); t
    }
    val reps = time("exact stage (families)") {
      val fams = thumbs.groupBy(col("thumb"))
        .agg(min(col("doc_id")).as("rep"))
      val r = thumbs.join(fams.select(col("rep").as("doc_id")),
        Seq("doc_id"), "left_semi").cache()
      println("  n_reps=" + r.count()); r
    }
    val cand = time("candidates (reps)") {
      val c = ImageDedup.candidates(
        reps.withColumn("bands", ImageDedup.bands(col("dhash")))).cache()
      println("  n_candidates=" + c.count()); c
    }
    time("verify (nearDupPairs over reps)") {
      println("  n_pairs=" + ImageDedup.nearDupPairs(reps).count())
    }
    time("full dedup") {
      println("  drops=" + ImageDedup.dedup(corpus).filter(!col("keep")).count())
    }
    // replicate the q_dedup_image key body stage by stage
    time("key: res") {
      val res = ImageDedup.dedupFromThumbs(
        corpus.select(col("doc_id")), thumbs).cache()
      res.count()
      val drops = res.filter(!col("keep") && pmod(col("doc_id"), lit(7)) === 0)
        .select(col("doc_id").as("y")).orderBy(col("y")).limit(256)
      val py = broadcast(drops.join(
        thumbs.select(col("doc_id").as("y"), col("thumb").as("ty"),
          col("sr").as("sry"), col("sg").as("sgy"), col("sb").as("sby")),
        Seq("y")))
      val msd = 601L * (ImageDedup.ThumbW * ImageDedup.ThumbH * 3) / 100L
      val confirmed = ImageDedup.pairDistances(py
          .join(thumbs.select(col("doc_id").as("x"), col("thumb").as("tx"),
              col("sr").as("srx"), col("sg").as("sgx"), col("sb").as("sbx")),
            col("x") < col("y") &&
              abs(col("srx") - col("sry")) <= msd &&
              abs(col("sgx") - col("sgy")) <= msd &&
              abs(col("sbx") - col("sby")) <= msd)
          .select(col("x").as("ida"), col("y").as("idb"),
            col("tx").as("ta"), col("ty").as("tb")))
        .filter(col("mean_diff_e2") <= 600L)
        .select(col("idb")).distinct()
        .agg(count(lit(1)).as("n_confirmed"))
      time("key: truth branch") { println("  confirmed=" + confirmed.head()) }
      time("key: final agg") {
        println("  " + res.agg(count(lit(1)).as("n_images"),
          sum(when(col("doc_id") >= 1000000L, 1L).otherwise(0L)).as("n_planted"),
          sum(when(!col("keep") && col("doc_id") >= 1000000L, 1L).otherwise(0L))
            .as("n_planted_dropped")).head())
      }
      res.unpersist(blocking = false)
    }
    spark.stop()
  }
}
