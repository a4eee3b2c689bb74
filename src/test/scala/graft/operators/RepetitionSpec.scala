package graft.operators

import graft.SparkTestBase

/** Gopher-style repetition signals: hand-computed bigram counts,
  * deterministic tie-breaks, and the short-doc precondition. */
class RepetitionSpec extends SparkTestBase {

  private def docs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.map { case (id, t) => (id, t, t.length.toLong) }
      .toDF("doc_id", "text", "n_chars")
  }

  test("looping text: counts, top gram, and e6 fractions by hand") {
    // "a b a b a": bigrams = [a b, b a, a b, b a] → 4 grams, 2 distinct
    // tie at cnt=2 breaks to the lexicographically smaller "a b"
    val r = TextOps.repetitionStats(docs(Seq((1L, "a b a b a")))).head()
    assert(r.getAs[Long]("n_grams") == 4L)
    assert(r.getAs[Long]("n_distinct") == 2L)
    assert(r.getAs[String]("top_gram") == "a b")
    assert(r.getAs[Long]("top_cnt") == 2L)
    // top: 2 occurrences × 3 chars × 1e6 div 9 chars = 666666
    assert(r.getAs[Long]("top_frac_e6") == 666666L)
    // dup: (4-2) × 1e6 div 4 = 500000
    assert(r.getAs[Long]("dup_frac_e6") == 500000L)
  }

  test("all-unique text has zero duplicate fraction") {
    val r = TextOps.repetitionStats(docs(Seq((1L, "p q r s")))).head()
    assert(r.getAs[Long]("n_grams") == 3L)
    assert(r.getAs[Long]("n_distinct") == 3L)
    assert(r.getAs[Long]("dup_frac_e6") == 0L)
  }

  test("docs with fewer than 2 tokens are absent from the report") {
    val out = TextOps.repetitionStats(docs(Seq((1L, "solo"), (2L, "a b"))))
    assert(out.collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("fully repeated single bigram covers the whole report") {
    // "x x x": bigrams [x x, x x] → top covers 2×3=6 chars of 5 → >100%
    // capped nowhere (the signal is a ratio of covered chars, overlap
    // counted per occurrence — standard Gopher accounting)
    val r = TextOps.repetitionStats(docs(Seq((1L, "x x x")))).head()
    assert(r.getAs[Long]("n_grams") == 2L && r.getAs[Long]("n_distinct") == 1L)
    assert(r.getAs[Long]("dup_frac_e6") == 500000L)
    assert(r.getAs[Long]("top_frac_e6") == 1200000L)
  }
}
