package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorOps
import graft.operators.Similarity

/** Stage timing + cell-balance diagnostic for the two-level
  * (hier) semantic-dedup path: quantize, coarse fit, fine fit,
  * assign, and the pair-cost proxy Σ|cell|² that bounds the
  * cid-keyed self-join. Usage: `runMain graft.tools.HierDebug <sfDir>`. */
object HierDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[hierdebug] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val emb = Tables.embeddings(spark, sfDir).select(col("vec_id"),
      VectorOps.asDoubleArray(col("embedding")).as("embedding"))
    val planted = emb.filter(pmod(col("vec_id"), lit(20)) === 0)
      .select((col("vec_id") + lit(1000000L)).as("vec_id"),
        transform(col("embedding"), (v, i) =>
          v + (pmod(col("vec_id") * 7 + i, lit(5)) - lit(2)).cast("double")
            * lit(0.004)).as("embedding"))
    val corpus = emb.unionByName(planted)
    val n = t("count")(corpus.count())
    val nlist = math.max(8L, n / 256L).toInt
    val sampleMod = math.max(1L, n / (16L * nlist)).toInt
    println(s"[hierdebug] n=$n nlist=$nlist sampleMod=$sampleMod")
    val quant = t("quantize+cache")({
      val q = Similarity.quantizedCorpus(corpus)
        .select(col("vec_id"), col("qv")).cache()
      q.count(); q
    })
    val qAsEmb = quant.select(col("vec_id"), col("qv").as("embedding"))
    val (coarse, fine) = t("hier fit")(Similarity.hierCentroids(
      qAsEmb, nlist, 42L, maxIter = 4, sampleMod = sampleMod))
    println(s"[hierdebug] k1=${coarse.length} fineTotal=${fine.map(_.length).sum}")
    val assigned = t("assign+cache")({
      val a = Similarity.assignCellsHier(qAsEmb, coarse, fine)
        .select(col("vec_id"), col("cid")).cache()
      a.count(); a
    })
    val stats = t("cell stats")(assigned.groupBy("cid").count()
      .agg(max("count").as("mx"), expr("percentile(count, 0.99)").as("p99"),
        count(lit(1)).as("cells"), sum(col("count") * col("count")).as("sumsq"))
      .head())
    println(s"[hierdebug] hier: max=${stats.get(0)} p99=${stats.get(1)} " +
      s"cells=${stats.get(2)} sumsq_pairs=${stats.get(3)}")
    // flat comparison
    val centroids = t("flat fit")(Similarity.kmeansCentroids(qAsEmb, nlist,
      42L, maxIter = 4, sampleMod = sampleMod, initMode = "random"))
    val aFlat = t("flat assign")({
      val a = Similarity.assignCells(qAsEmb, centroids)
        .select(col("vec_id"), col("cid")).cache()
      a.count(); a
    })
    val stats2 = t("flat cell stats")(aFlat.groupBy("cid").count()
      .agg(max("count").as("mx"), expr("percentile(count, 0.99)").as("p99"),
        count(lit(1)).as("cells"), sum(col("count") * col("count")).as("sumsq"))
      .head())
    println(s"[hierdebug] flat: max=${stats2.get(0)} p99=${stats2.get(1)} " +
      s"cells=${stats2.get(2)} sumsq_pairs=${stats2.get(3)}")
    spark.stop()
  }
}

/** Operator-only timing: semanticDedup drops count, no contract
  * branches. Usage: `runMain graft.tools.HierDebug2 <sfDir>`. */
object HierDebug2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[hierdebug2] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val emb = Tables.embeddings(spark, sfDir).select(col("vec_id"),
      VectorOps.asDoubleArray(col("embedding")).as("embedding"))
    val planted = emb.filter(pmod(col("vec_id"), lit(20)) === 0)
      .select((col("vec_id") + lit(1000000L)).as("vec_id"),
        transform(col("embedding"), (v, i) =>
          v + (pmod(col("vec_id") * 7 + i, lit(5)) - lit(2)).cast("double")
            * lit(0.004)).as("embedding"))
    val corpus = emb.unionByName(planted)
    val n = corpus.count()
    val nlist = math.max(8L, n / 256L).toInt
    val sampleMod = math.max(1L, n / (16L * nlist)).toInt
    val res = t("semanticDedup + drops count")({
      val r = graft.operators.Dedup.semanticDedup(corpus, nlist, 0.9,
        sampleMod = sampleMod).cache()
      println("[hierdebug2] drops=" + r.filter(!col("keep")).count())
      r
    })
    t("contract soundness branch")({
      val droppedVec = broadcast(res.filter(!col("keep")
          && pmod(col("vec_id"), lit(7)) === 0)
        .select(col("vec_id").as("yid"))
        .join(corpus.select(col("vec_id").as("yid"), col("embedding").as("yv")),
          Seq("yid")))
      val c = droppedVec
        .join(corpus.select(col("vec_id").as("xid"), col("embedding").as("xv")),
          col("xid") < col("yid"))
        .filter(VectorOps.cosineSim(col("xv"), col("yv")) > 0.9)
        .select(col("yid")).distinct().count()
      println("[hierdebug2] confirmed=" + c)
    })
    spark.stop()
  }
}
