package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Model-based selection: hand-computed bigram-LM NLLs and an
  * independent JVM recomputation of the DSIR hashed-unigram
  * importance weights (proving the md5-hex bucket expression against
  * MessageDigest, and the e9-quantized integer sums end-to-end). */
class ModelSelectionSpec extends SparkTestBase {

  private def docsDf(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "source")
  }

  test("bigram LM: hand-computed add-one smoothed NLL") {
    // corpus: d1 "a b a b" → (a,b)(b,a)(a,b); d2 "b a" → (b,a)
    // c2(a,b)=2, c2(b,a)=2; c1(a)=2, c1(b)=2; V = |{a,b}| = 2
    // every bigram: lp = floor(ln((2+1)/(2+2))·1e9) = -287682073
    val out = ModelSelection.lmScore(docsDf(Seq(
      (1L, "a b a b", "s"), (2L, "b a", "s"), (3L, "c", "s")))).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L)) // d3: no bigrams
    assert(out(0).getAs[Long]("n_bigrams") == 3L)
    assert(out(0).getAs[Long]("nll_e6") == 287682L) // 863046219 div 3000
    assert(out(1).getAs[Long]("n_bigrams") == 1L)
    assert(out(1).getAs[Long]("nll_e6") == 287682L)
  }

  test("bigram LM: rare continuations score a higher NLL") {
    val out = ModelSelection.lmScore(docsDf(Seq(
        (1L, "x y x y x y", "s"), (2L, "x z", "s"))))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("nll_e6")).toMap
    assert(out(2L) > out(1L))
  }

  test("dsir weights match an independent JVM recomputation") {
    val rows = Seq(
      (1L, "t t t q", "src0"),
      (2L, "r r q q", "src1"),
      (3L, "t q r t", "src1"),
      (4L, "r r r r", "src1"),
      (5L, "t t q t", "src0"))
    val out = ModelSelection.dsirWeights(docsDf(rows),
        isTarget = col("source") === "src0", buckets = 64, k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_tokens"), r.getAs[Long]("w_e9")))
      .toSeq

    def bucket(tok: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 6), 16) % 64
    }
    val toks = rows.flatMap { case (id, t, src) =>
      t.split(" ").map(tok => (id, src == "src0", bucket(tok))) }
    val tr = toks.size.toDouble
    val tt = toks.count(_._2).toDouble
    val lr = toks.groupBy(_._3).map { case (b, xs) =>
      val nr = xs.size; val nt = xs.count(_._2)
      b -> math.floor((math.log((nt + 1.0) / (tt + 64))
        - math.log((nr + 1.0) / (tr + 64))) * 1e9).toLong
    }
    val expect = toks.groupBy(_._1).toSeq
      .map { case (id, xs) => (id, xs.size.toLong, xs.map(x => lr(x._3)).sum) }
      .sortBy { case (id, _, w) => (-w, id) }
      .take(3)
    assert(out == expect)
    // target-domain lookalikes outrank off-domain docs: top doc is a
    // 't'-heavy one, and the all-'r' doc 4 is not in the top 3
    assert(Set(1L, 5L).contains(out.head._1))
    assert(!out.map(_._1).contains(4L))
  }

  test("dsir is deterministic and honors k") {
    val rows = (0L until 40L).map(i =>
      (i, s"w${i % 7} w${i % 5} w${i % 3}", if (i % 4 == 0) "src0" else "src1"))
    val run1 = ModelSelection.dsirWeights(docsDf(rows),
      isTarget = col("source") === "src0", k = 10).collect().toSeq
    val run2 = ModelSelection.dsirWeights(docsDf(rows),
      isTarget = col("source") === "src0", k = 10).collect().toSeq
    assert(run1 == run2)
    assert(run1.size == 10)
  }
}
