package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** IVF ANN: on clustered data, probing the right coarse cells
  * recovers the true nearest neighbors of the probed clusters. */
class SimilarityIvfSpec extends SparkTestBase {

  test("ivf topk finds within-cluster neighbors; candidates pruned") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    // 4 well-separated clusters of 30 vectors each
    val centers = Array.fill(4)(Array.fill(16)(rnd.nextGaussian() * 5))
    val vecs = for (c <- 0 until 4; i <- 0 until 30) yield {
      val id = (c * 30 + i).toLong
      (id, centers(c).map(v => (v + rnd.nextGaussian() * 0.1).toFloat).toSeq, c)
    }
    val emb = vecs.toDF("vec_id", "embedding", "label")
    val queries = emb.filter(col("vec_id").isin(5L, 35L, 65L, 95L))
    val ivf = Similarity.ivfTopK(emb, queries, k = 3, nlist = 8, nProbe = 2)
      .collect().groupBy(_.getAs[Long]("qid"))
    val bf = Similarity.bruteForceTopK(emb, queries, k = 3)
      .collect().groupBy(_.getAs[Long]("qid"))
    // with tight clusters, IVF's top-3 should equal brute force's
    Seq(5L, 35L, 65L, 95L).foreach { q =>
      val ivfIds = ivf(q).sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("neighbor_id")).toSeq
      val bfIds = bf(q).sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("neighbor_id")).toSeq
      assert(ivfIds == bfIds, s"query $q: ivf $ivfIds vs bf $bfIds")
    }
  }
}
