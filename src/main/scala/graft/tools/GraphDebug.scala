package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Similarity

/** Parameter-matrix diagnostic for the graph-ANN key: replicates
  * q_similarity_graph's exact path (corpus-scaled nlist, sampled or
  * full centroid fit, shared assignment, beam search) and prints the
  * measured recall + wall for each (g, refineRounds, sampledFit
  * [, nlistDenom][, spillCells]) combination. Usage:
  * runMain graft.tools.GraphDebug <sfDir> <g,rounds,sampled[,denom[,spill]][:...]> */
object GraphDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val combos = (if (args.length > 1) args(1) else "12,1,1")
      .split(":").toSeq.map { s =>
        val parts = s.split(",").map(_.trim.toInt)
        (parts(0), parts(1), parts(2) == 1,
          if (parts.length > 3) parts(3) else 256,
          if (parts.length > 4) parts(4) else 2,
          if (parts.length > 5) parts(5) else 48,
          if (parts.length > 6) parts(6) else 3,
          if (parts.length > 7) parts(7) else 0)
      }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(pmod(col("vec_id"), lit(100)) === 0
      && col("vec_id") < 2000)
    val n = emb.count()
    val exact = Similarity.bruteForceTopK(emb, queries, 5).cache()
    exact.count()
    combos.foreach { case (g, rounds, sampled, denom, spill, beam, hops, sp) =>
      val nlist = math.max(16L, n / denom).toInt
      val initMode = if (nlist > 64) "random" else "k-means||"
      val seedProbe = if (sp > 0) sp else math.max(2, nlist / 32)
      val sampleMod = if (sampled) math.max(1L, n / (16L * nlist)).toInt else 1
      val t0 = System.nanoTime()
      val ann = Similarity.graphTopK(emb, queries, k = 5, g = g,
        beam = beam, hops = hops, nlist = nlist, seedProbe = seedProbe,
        initMode = initMode, sampleMod = sampleMod, refineRounds = rounds,
        spillCells = spill)
      val rec = Similarity.meanRecall(ann, exact).head().getAs[Double]("recall")
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[graphdebug] n=$n denom=$denom nlist=$nlist g=$g rounds=$rounds sampledFit=$sampled seedProbe=$seedProbe spill=$spill beam=$beam hops=$hops -> recall=$rec%.3f wall=$wall%.1f s")
    }
    spark.stop()
  }
}
