package graft.operators

import graft.SparkTestBase

/** Incremental near-dup admission: planted perturbed copies of corpus
  * docs must be flagged with their corpus witness, overlapping-but-
  * below-threshold docs must be admitted (the exact verify prunes
  * chance band collisions), and an empty index admits everything. */
class IncrementalNearDupSpec extends SparkTestBase {

  import spark.implicits._

  private def words(seed: String, n: Int) = (1 to n).map(i => s"$seed$i")

  test("perturbed copies are flagged against their corpus doc; novel docs admitted") {
    // corpus: two 60-token docs + unrelated filler
    val base1 = words("alpha", 60).mkString(" ")
    val base2 = words("beta", 60).mkString(" ")
    val filler = (0 until 3).map(j => (100L + j, words(s"fill$j", 50).mkString(" ")))
    val index = (Seq((1L, base1), (2L, base2)) ++ filler).toDF("doc_id", "text")
    // batch: near-copy of doc 1 (one token swapped → J ≈ 0.9),
    // near-copy of doc 2, and one genuinely novel doc
    val batch = Seq(
      (201L, base1.replace("alpha30", "changed")),
      (202L, base2.replace("beta10", "other")),
      (203L, words("novel", 60).mkString(" ")))
      .toDF("doc_id", "text")
    val out = Dedup.incrementalNearDup(batch, index, minJaccard = 0.5)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), Option(r.get(2)).map(_.asInstanceOf[Long]), r.getBoolean(3)))).toMap
    assert(out(201L) == (("near_dup", Some(1L), false)))
    assert(out(202L) == (("near_dup", Some(2L), false)))
    assert(out(203L) == (("novel", None, true)))
  }

  test("shared tokens below the Jaccard threshold do not block admission") {
    val shared = words("common", 20)
    val index = Seq((1L, (shared ++ words("corpusonly", 60)).mkString(" ")))
      .toDF("doc_id", "text")
    // ~20 shared tokens of 80 each side → J well under 0.5
    val batch = Seq((2L, (shared ++ words("batchonly", 60)).mkString(" ")))
      .toDF("doc_id", "text")
    val out = Dedup.incrementalNearDup(batch, index, minJaccard = 0.5).collect()
    assert(out.length == 1 && out.head.getString(1) == "novel",
      s"low-overlap doc must be admitted: ${out.head}")
  }

  test("empty index admits every batch doc") {
    val index = spark.emptyDataset[(Long, String)].toDF("doc_id", "text")
    val batch = (1 to 5).map(i => (i.toLong, words(s"d$i", 40).mkString(" ")))
      .toDF("doc_id", "text")
    val out = Dedup.incrementalNearDup(batch, index, minJaccard = 0.5)
    assert(out.filter("keep").count() == 5L)
  }
}
