package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorOps
import graft.operators.{Dedup, Similarity}

/** Stage-timing diagnostic for [[graft.operators.Dedup.semanticDedup]]
  * at scale: per-stage wall-clock (count / centroid fit / assignment /
  * pair-join) plus cell-balance stats under random vs k-means|| init —
  * the numbers behind BASELINE.md's semantic-dedup row. Usage:
  * `runMain graft.tools.SemDebug <sfDir>`. */
object SemDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[semdebug] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val emb = Tables.embeddings(spark, sfDir).select(col("vec_id"),
      VectorOps.asDoubleArray(col("embedding")).as("embedding"))
    val n = t("count")(emb.count())
    val nlist = math.max(8L, n / 256L).toInt
    val sampleMod = math.max(1L, n / (16L * nlist)).toInt
    println(s"[semdebug] n=$n nlist=$nlist sampleMod=$sampleMod")
    val cRand = t("fit random")(Similarity.kmeansCentroids(emb, nlist,
      sampleMod = sampleMod, initMode = "random"))
    val aRand = Similarity.assignCells(emb, cRand)
    t("assign count")(aRand.count())
    val sizes = t("cell sizes")(aRand.groupBy("cid").count()
      .agg(max("count"), expr("percentile(count, 0.99)"), count(lit(1))).head())
    println(s"[semdebug] random-init max cell=${sizes.get(0)} p99=${sizes.get(1)} nonempty=${sizes.get(2)}")
    t("pair drops count")(Dedup.semanticDedup(emb, nlist, 0.9,
      sampleMod = sampleMod).filter(!col("keep")).count())
    val cPar = t("fit kmeans||")(Similarity.kmeansCentroids(emb, nlist,
      sampleMod = sampleMod))
    val aPar = Similarity.assignCells(emb, cPar)
    val sizes2 = t("cell sizes ||")(aPar.groupBy("cid").count()
      .agg(max("count"), expr("percentile(count, 0.99)"), count(lit(1))).head())
    println(s"[semdebug] kmeans||  max cell=${sizes2.get(0)} p99=${sizes2.get(1)} nonempty=${sizes2.get(2)}")
    spark.stop()
  }
}
