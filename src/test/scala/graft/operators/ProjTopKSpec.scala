package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

/** Projected-space two-stage ANN: recall against the exact top-k and
  * the fractional-candidate-budget scale behavior. */
class ProjTopKSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.01"

  test("recall@5 vs exact top-5 clears the contract bound") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(pmod(col("vec_id"), lit(100)) === 0)
    val ann = Similarity.projTopK(emb, queries, k = 5)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
    val r = Similarity.meanRecall(ann, exact).collect()(0)
    info(s"n_queries=${r.getLong(0)} recall=${r.getDouble(1)}")
    assert(r.getDouble(1) >= 0.5, s"recall ${r.getDouble(1)}")
  }

  test("widening the candidate fraction improves (or preserves) recall") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(pmod(col("vec_id"), lit(100)) === 0)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
    def recall(denom: Int): Double =
      Similarity.meanRecall(
        Similarity.projTopK(emb, queries, k = 5, keepDenom = denom),
        exact).collect()(0).getDouble(1)
    val narrow = recall(8)
    val wide = recall(2)
    info(s"keep 1/8 -> $narrow, keep 1/2 -> $wide")
    assert(wide >= narrow - 1e-9)
  }

  test("one cell + a keepDenom of 1 degenerates to the exact result") {
    val emb = Tables.embeddings(spark, sfDir).limit(60)
    val queries = emb.filter(pmod(col("vec_id"), lit(20)) === 0)
    // nlist = 2 with nProbe >= nlist: every cell is probed (Spark
    // KMeans requires k >= 2, so 2 cells is the smallest fit), and
    // keepDenom = 1 keeps everything probed — so the two-stage path
    // must reproduce the exact top-k bit for bit
    val ann = Similarity.projTopK(emb, queries, k = 3, keepDenom = 1, nlist = 2)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 3)
    val r = Similarity.meanRecall(ann, exact).collect()(0)
    assert(r.getDouble(1) == 1.0, s"recall ${r.getDouble(1)}")
  }
}
