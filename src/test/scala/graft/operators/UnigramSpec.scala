package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer (Kudo ACL'18): lattice math on hand-checked
  * fixtures, seed/prune/coverage invariants, the EM loss guarantee,
  * and the encode half's id assignment + roundtrip. */
class UnigramSpec extends SparkTestBase {

  import spark.implicits._

  test("viterbi picks the max-probability segmentation, longest piece on ties") {
    val scores = Map("a" -> math.log(0.25), "b" -> math.log(0.25),
      "ab" -> math.log(0.5))
    // P(ab) = 0.5 beats P(a)P(b) = 0.0625
    assert(Unigram.viterbi("ab", scores).get === List("ab"))
    assert(Unigram.viterbi("aab", scores).get === List("a", "ab"))
    // tie: P(xy) == P(x)P(y) → the longer piece wins deterministically
    val tie = Map("x" -> math.log(0.5), "y" -> math.log(0.5),
      "xy" -> math.log(0.25))
    assert(Unigram.viterbi("xy", tie).get === List("xy"))
    // uncoverable word → None; empty word → Nil
    assert(Unigram.viterbi("az", Map("a" -> 0.0)).isEmpty)
    assert(Unigram.viterbi("", scores).get === Nil)
  }

  test("seed contains every single character plus the top weighted substrings") {
    val docs = Seq((1L, "banana banana band"), (2L, "banana"))
      .toDF("doc_id", "text")
    val wf = Tokenizer.wordFreq(docs).select(col("word"), col("n"))
    val seed = Unigram.seedPieces(wf, seedSize = 16).toMap
    // chars of the corpus all present with exact weighted counts
    assert(seed("a") === 3L * 3 + 1)   // 3 a's per banana ×3 + 1 in band
    assert(seed("b") === 4L)
    assert(seed("n") === 3L * 2 + 1)   // 2 n's per banana ×3 + 1 in band
    assert(seed("d") === 1L)
    // the dominant substrings made the cut ("an" weight 3·2+1=7)
    assert(seed("an") === 7L)
    assert(seed.contains("banana") && seed("banana") === 3L)
    // cap respected: ≤ 16 multi-char pieces beyond the char floor
    assert(seed.keys.count(_.length > 1) <= 16)
    // the cap itself: asking for 4 keeps exactly the top-4 multis
    val top4 = Unigram.seedPieces(wf, seedSize = 4)
      .filter(_._1.length > 1).toMap
    assert(top4.keySet === Set("an", "ana", "na", "ba"))
  }

  test("learnUnigram: vocab fits target, loss non-increasing within phases, dominant piece survives") {
    val docs = (0L to 49L)
      .map(id => (id, "abab ababab abab cd"))
      .toDF("doc_id", "text").repartition(1)
    val model = Unigram.learnUnigram(docs, vocabSize = 8, seedSize = 32)
    assert(model.pieces.length <= 8)
    val ps = model.pieces.map(_.piece).toSet
    // chars never pruned
    assert(Set("a", "b", "c", "d").subsetOf(ps))
    // the corpus is (ab)+ words — "ab" (or a longer power) dominates
    assert(ps.exists(p => p.length > 1 && p.startsWith("ab")))
    // EM guarantee, measured: within every fixed-vocab phase the
    // corpus -log-likelihood does not increase
    model.lossTrail.grouped(2).foreach { ph =>
      if (ph.length == 2)
        assert(ph(1) <= ph(0) * (1 + 1e-6) + 1e-6,
          s"EM loss increased within a phase: ${model.lossTrail}")
    }
    // encode roundtrips and segments "abab" words with the learned
    // multi-char pieces (fewer pieces than characters)
    val enc = Unigram.unigramEncode(docs, model)
      .select(col("doc_id"), col("n_words"), col("n_pieces"),
        col("token_ids"), col("roundtrip_ok"))
      .head()
    assert(enc.getBoolean(4))
    assert(enc.getLong(1) === 4L)
    assert(enc.getLong(2) < "ababababababcd".length)
    assert(enc.getString(3).split(" ").length === enc.getLong(2))
  }

  test("unigramEncode: deterministic lexicographic ids, empty docs kept") {
    val docs = Seq((1L, "ab ab"), (2L, ""), (3L, "ba")).toDF("doc_id", "text")
    val model = Unigram.UnigramModel(Seq(
      Unigram.Piece("a", math.log(0.25), 1.0),
      Unigram.Piece("b", math.log(0.25), 1.0),
      Unigram.Piece("ab", math.log(0.5), 1.0)), Nil)
    val rows = Unigram.unigramEncode(docs, model)
      .orderBy(col("doc_id")).collect()
    // ids are 1-based lexicographic rank: a=1, ab=2, b=3
    assert(rows(0).getAs[String]("token_ids") === "2 2") // "ab" twice
    assert(rows(0).getAs[Long]("n_words") === 2L)
    assert(rows(0).getAs[Long]("n_pieces") === 2L)
    // empty doc: zero words, zero pieces, roundtrip vacuously true
    assert(rows(1).getAs[Long]("n_words") === 0L)
    assert(rows(1).getAs[Long]("n_pieces") === 0L)
    assert(rows(1).getAs[Boolean]("roundtrip_ok"))
    // "ba" has no "ba" piece → chars: b=3, a=1
    assert(rows(2).getAs[String]("token_ids") === "3 1")
  }

  test("training is deterministic on a fixed partitioning") {
    val docs = (0L to 19L).map(id => (id, s"alpha beta gamma alpha"))
      .toDF("doc_id", "text").repartition(1)
    val m1 = Unigram.learnUnigram(docs, vocabSize = 16, seedSize = 64)
    val m2 = Unigram.learnUnigram(docs, vocabSize = 16, seedSize = 64)
    assert(m1.pieces.map(_.piece) === m2.pieces.map(_.piece))
    assert(m1.lossTrail === m2.lossTrail)
  }
}
