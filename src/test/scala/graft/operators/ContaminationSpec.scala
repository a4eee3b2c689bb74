package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Train/eval decontamination: planted overlaps produce exact
  * integer counts; the broadcast and shuffle join paths agree; short
  * docs with no shingles stay out of the report. */
class ContaminationSpec extends SparkTestBase {

  // eval doc "w1 w2 w3 w4" carries shingles {"w1 w2 w3", "w2 w3 w4"}
  private def eval = {
    import spark.implicits._
    Seq((100L, "w1 w2 w3 w4")).toDF("doc_id", "text")
  }

  private def train = {
    import spark.implicits._
    Seq(
      (1L, "w1 w2 w3 w4"),       // both shingles in eval → fully contaminated
      (2L, "w1 w2 w3 x y z"),    // 1 of 4 distinct shingles overlaps
      (3L, "p q r s t"),         // disjoint vocab → clean
      (4L, "w1 w2")              // < 3 tokens → no shingles, absent
    ).toDF("doc_id", "text")
  }

  test("planted overlaps give exact integer counts and flags") {
    val rows = Contamination.overlapReport(train, eval)
      .orderBy("doc_id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    val byId = rows.map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(byId(1L) == ((2L, 2L, 1000000L, true)))
    assert(byId(2L) == ((4L, 1L, 250000L, true)))
    assert(byId(3L) == ((3L, 0L, 0L, false)))
  }

  test("threshold is an integer compare, honored exactly at the boundary") {
    // doc 2 is exactly 25% contaminated: flag flips at thresholdE6=250000
    val at = Contamination.overlapReport(train, eval, thresholdE6 = 250000L)
      .filter(col("doc_id") === 2L).head()
    assert(at.getBoolean(4))
    val above = Contamination.overlapReport(train, eval, thresholdE6 = 250001L)
      .filter(col("doc_id") === 2L).head()
    assert(!above.getBoolean(4))
  }

  test("shuffle-join path (broadcastEval=false) agrees with broadcast path") {
    val a = Contamination.overlapReport(train, eval, broadcastEval = true)
    val b = Contamination.overlapReport(train, eval, broadcastEval = false)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("clean corpus: zero overlap everywhere") {
    import spark.implicits._
    val ev = Seq((9L, "m n o p")).toDF("doc_id", "text")
    val out = Contamination.overlapReport(train, ev)
      .agg(sum("n_overlap"), max("contaminated")).head()
    assert(out.getLong(0) == 0L && !out.getBoolean(1))
  }

  test("fuzzyReport: per-pair Jaccard, best-match tie to smallest eval id") {
    import spark.implicits._
    val ev = Seq(
      (100L, "w1 w2 w3 w4"),      // shingles {w1 w2 w3, w2 w3 w4}
      (200L, "w1 w2 w3 w4"))      // identical eval twin → tie on score
      .toDF("doc_id", "text")
    val rows = Contamination.fuzzyReport(train, ev, minJaccardE6 = 500000L)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        Option(r.getAs[java.lang.Long]("best_eval_id")).map(_.toLong),
        r.getBoolean(4)))).toMap
    // doc 1 ≡ both eval docs: jaccard 1.0, tie breaks to eval 100
    assert(rows(1L) == ((2L, 1000000L, Some(100L), true)))
    // doc 2: inter 1, union 4 + 2 − 1 = 5 → 200000, below 50%
    assert(rows(2L) == ((4L, 200000L, Some(100L), false)))
    // doc 3 shares nothing: best 0, no match id, clean
    assert(rows(3L) == ((3L, 0L, None, false)))
    // doc 4 has no shingles → absent
    assert(!rows.contains(4L))
  }

  test("fuzzyReport catches a near-copy the pooled fraction dilutes") {
    import spark.implicits._
    // eval set: one target doc + heavy unrelated pool sharing zero
    // shingles with the train doc
    val ev = (Seq((100L, "a b c d e f")) ++
      (1 to 20).map(i => (200L + i, s"p$i q$i r$i s$i t$i"))).toDF("doc_id", "text")
    // train doc = the target with one word changed at the end:
    // shingles {a b c, b c d, c d e, d e f→d e X} → inter 3 of 4
    val tr = Seq((1L, "a b c d e x")).toDF("doc_id", "text")
    val r = Contamination.fuzzyReport(tr, ev, minJaccardE6 = 500000L).head()
    // jaccard = 3 / (4 + 4 − 3) = 600000 e6 → flagged despite the
    // eval POOL being 21 docs (pooled overlap would be diluted)
    assert(r.getLong(2) == 600000L && r.getBoolean(4))
    assert(r.getLong(3) == 100L)
  }
}
