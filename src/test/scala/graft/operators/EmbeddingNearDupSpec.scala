package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Scale-path embedding near-dup (LSH-candidate routed) against the
  * exact broadcast baseline: planted near-duplicates must be found,
  * counts can never exceed exact (candidates ⊆ all pairs), and a
  * probe with no candidates stays in the report instead of
  * vanishing. */
class EmbeddingNearDupSpec extends SparkTestBase {

  import spark.implicits._

  private def cluster(center: Int, ids: Range, dim: Int, noise: Double) = {
    val rnd = new scala.util.Random(center)
    ids.map { i =>
      (i.toLong, Array.tabulate(dim)(j =>
        ((if (j % 8 == center) 1.0 else 0.05) + rnd.nextGaussian() * noise).toFloat))
    }
  }

  test("planted near-dup clusters: LSH route matches exact counts") {
    val dim = 32
    val corpus = (cluster(0, 0 until 20, dim, 0.01) ++
      cluster(3, 20 until 40, dim, 0.01) ++
      cluster(6, 40 until 60, dim, 0.01)).toDF("vec_id", "embedding")
    val probes = corpus.filter(col("vec_id") % 10 === 0)
    val exact = Dedup.embeddingNearDup(probes, corpus, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ann = Dedup.embeddingNearDupLsh(corpus, probes, threshold = 0.9,
        bits = 2, numTables = 8, dim = dim)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ann.keySet == exact.keySet)
    // within-cluster cosine is ~1, so each probe has 19 near dups and
    // the per-plane collision probability is ~1 — a miss across all
    // 8 tables has probability ~1e-9, so equality is deterministic
    // for test purposes
    exact.foreach { case (qid, nExact) =>
      assert(nExact == 19L, s"fixture broke: probe $qid has $nExact exact near dups")
      assert(ann(qid) == nExact, s"probe $qid: ann ${ann(qid)} != exact $nExact")
    }
  }

  test("soundness: candidate-routed counts never exceed exact") {
    val rnd = new scala.util.Random(42)
    val corpus = (0 until 300).map(i =>
      (i.toLong, Array.fill(16)((rnd.nextDouble() * 2 - 1).toFloat)))
      .toDF("vec_id", "embedding")
    val probes = corpus.filter(col("vec_id") % 30 === 0)
    val exact = Dedup.embeddingNearDup(probes, corpus, threshold = 0.2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ann = Dedup.embeddingNearDupLsh(corpus, probes, threshold = 0.2,
        bits = 2, numTables = 4, dim = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ann.keySet == exact.keySet)
    ann.foreach { case (qid, n) =>
      assert(n <= exact(qid), s"probe $qid over-counted: $n > ${exact(qid)}")
    }
  }

  test("probe with zero candidates stays in the report as (0, null)") {
    // corpus contains ONLY the probe itself; self-pairs are excluded,
    // so the candidate set is provably empty
    val df = Seq((7L, Array(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    val out = Dedup.embeddingNearDupLsh(df, df, threshold = 0.5, dim = 3).collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 7L)
    assert(out.head.getLong(1) == 0L)
    assert(out.head.isNullAt(2), "max_cos should be null with no candidates")
  }
}
