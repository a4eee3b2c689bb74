package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Batched BPE induction must reproduce sequential greedy EXACTLY —
  * same pairs, same order, same counts. maxBatch = 1 IS the
  * sequential algorithm (one argmax per job round), so it serves as
  * the ground truth the batched runs are compared against. */
class BpeBatchSpec extends SparkTestBase {

  private def merges(docs: org.apache.spark.sql.DataFrame, rounds: Int,
                     maxBatch: Int, checkpointEvery: Int = 64) = {
    val base = Tokenizer.wordFreq(docs).persist()
    try Tokenizer.learnMerges(base, rounds, maxBatch, checkpointEvery)
    finally base.unpersist()
  }

  test("created-pair trap: naive batching diverges here, the guard must not") {
    import spark.implicits._
    // word "abc" x 12 + word "xy" x 5: sequential greedy is
    // (a,b) -> (ab,c) -> (x,y), because merging (a,b) CREATES pair
    // (ab,c) with count 12 > 5. A naive non-conflicting batch would
    // commit [(a,b),(x,y)] in round one — wrong order. The
    // prefix-stop at the conflicting (b,c) plus strict-dominance
    // truncation must shrink the first batch to [(a,b)] alone.
    val docs = ((1 to 12).map(i => (i.toLong, "abc")) ++
      (13 to 17).map(i => (i.toLong, "xy"))).toDF("doc_id", "text")
    val seq = merges(docs, 3, maxBatch = 1)
    val bat = merges(docs, 3, maxBatch = 8)
    assert(seq === bat)
    assert(seq.map(m => (m._2, m._3)) === Seq(("a", "b"), ("ab", "c"), ("x", "y")))
  }

  test("batched == sequential on a mixed-frequency fixture, deep run") {
    import spark.implicits._
    // deterministic pseudo-text with a Zipf-ish skew: collisions,
    // ties, shared symbols and chain merges all occur in 40 rounds
    val words = Seq("the", "then", "them", "theme", "therm", "he",
      "hen", "thy", "enemy", "men", "met", "memo", "net", "ten")
    val docs = (0 until 400).map { i =>
      val w1 = words(i % words.length)
      val w2 = words((i * 7 + 3) % words.length)
      val w3 = words((i * i + 1) % words.length)
      (i.toLong, s"$w1 $w2 $w3")
    }.toDF("doc_id", "text")
    val seq = merges(docs, 40, maxBatch = 1)
    val b8 = merges(docs, 40, maxBatch = 8)
    val b32 = merges(docs, 40, maxBatch = 32, checkpointEvery = 16)
    assert(seq === b8)
    assert(seq === b32)
    // the fixture vocabulary exhausts before 40 (every word collapses
    // to one symbol); the point is both modes exhaust IDENTICALLY
    // after a substantive run
    assert(seq.length >= 20)
  }

  test("bpeLearn/bpeEncode public outputs are batch-invariant") {
    import spark.implicits._
    val docs = (0 until 120).map(i =>
      (i.toLong, s"alpha beta gamma${i % 5} alpha beta")).toDF("doc_id", "text")
    val learned = Tokenizer.bpeLearn(docs, rounds = 12)
      .orderBy(col("round")).collect().map(_.toSeq).toSeq
    // bpeLearn runs the (default-batched) shared loop; replay the
    // sequential loop directly and compare row for row
    val base = Tokenizer.wordFreq(docs).persist()
    val seq =
      try Tokenizer.learnMerges(base, 12, maxBatch = 1)
      finally base.unpersist()
    assert(learned === seq.map(m => Seq(m._1, m._2, m._3, m._4)))
    // encode consumes the same merges — spot-check determinism of the
    // trained-id output under the batched trainer
    val enc = Tokenizer.bpeEncode(docs, rounds = 12)
      .orderBy(col("doc_id")).limit(3).collect()
    assert(enc.forall(_.getAs[Long]("n_tokens") > 0))
  }
}
