package graft.operators

import graft.SparkTestBase

/** SemDeDup-style cluster-scoped semantic dedup: controlled 4-dim
  * corpus with two well-separated angular clusters — keep-min
  * survivor, co-clustering, threshold edges, zero-norm safety. */
class SemanticDedupSpec extends SparkTestBase {

  private def emb(rows: Seq[(Long, Seq[Double])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  private val corpus = Seq(
    1L -> Seq(1.0, 0.0, 0.0, 0.0),
    2L -> Seq(0.999, 0.01, 0.0, 0.0), // cos(1,2) ≈ 0.99995 — near-dup
    3L -> Seq(0.8, 0.6, 0.0, 0.0),    // cos(1,3) = 0.8 — same cluster, distinct
    10L -> Seq(0.0, 1.0, 0.0, 0.0),
    11L -> Seq(0.0, 0.8, 0.6, 0.0))   // cos(10,11) = 0.8

  test("within-cluster near-dup pair drops the larger id only") {
    val res = Dedup.semanticDedup(emb(corpus), nlist = 2, threshold = 0.95)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getBoolean(2)))).toMap
    assert(res.keySet == Set(1L, 2L, 3L, 10L, 11L))
    assert(!res(2L)._2)                        // the larger id of the pair
    assert(Seq(1L, 3L, 10L, 11L).forall(res(_)._2))
    assert(res(1L)._1 == res(2L)._1)           // the pair co-clustered
  }

  test("threshold above every pairwise cosine keeps everything") {
    val res = Dedup.semanticDedup(emb(corpus), nlist = 2, threshold = 0.9999999)
      .collect()
    assert(res.forall(_.getBoolean(2)))
  }

  test("zero-norm vectors are assigned but can neither drop nor be dropped") {
    val res = Dedup.semanticDedup(emb(corpus :+ (99L -> Seq(0.0, 0.0, 0.0, 0.0))),
      nlist = 2, threshold = 0.95).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(res(99L))            // kept: cosine undefined, never a dup
    assert(!res(2L))            // the real near-dup still drops
  }
}
