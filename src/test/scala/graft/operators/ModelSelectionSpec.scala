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

  test("Kneser-Ney-lite: hand-computed absolute-discount NLL") {
    // corpus: d1 "a b a b" → (a,b)(b,a)(a,b); d2 "b a" → (b,a)
    // c2(a,b)=2, c2(b,a)=2; c1(a)=c1(b)=2, nf(a)=nf(b)=1;
    // np(a)=np(b)=1; nbt=2
    // every bigram: p = ((2−0.75) + 0.75·1·(1/2))/2 = 0.8125
    //   lp = floor(ln(0.8125)·1e9) = −207639365
    val out = ModelSelection.lmScoreKn(docsDf(Seq(
      (1L, "a b a b", "s"), (2L, "b a", "s"), (3L, "c", "s")))).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L)) // d3: no bigrams
    assert(out(0).getAs[Long]("n_bigrams") == 3L)
    assert(out(0).getAs[Long]("nll_e6") == 207639L) // 622918095 div 3000
    assert(out(1).getAs[Long]("n_bigrams") == 1L)
    assert(out(1).getAs[Long]("nll_e6") == 207639L)
  }

  test("Kneser-Ney-lite matches an independent JVM recomputation") {
    val rows = (0L until 30L).map(i =>
      (i, s"w${i % 7} w${i % 5} w${i % 3} w${(i * 3) % 7} w${i % 2}", "s"))
    val out = ModelSelection.lmScoreKn(docsDf(rows)).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_bigrams"), r.getAs[Long]("nll_e6")))
      .toSeq
    val bgs = rows.flatMap { case (id, t, _) =>
      t.split(" ").sliding(2).collect { case Array(a, b) => (id, a, b) } }
    val c2 = bgs.groupBy(x => (x._2, x._3)).view.mapValues(_.size.toLong).toMap
    val c1 = c2.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val nf = c2.groupBy(_._1._1).view.mapValues(_.size.toLong).toMap
    val np = c2.groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
    val nbt = c2.size.toLong
    def lp(a: String, b: String): Long = math.floor(math.log(
      ((c2((a, b)) - 0.75) + 0.75 * nf(a) * (np(b).toDouble / nbt)) / c1(a)
    ) * 1e9).toLong
    val expect = bgs.groupBy(_._1).toSeq.map { case (id, xs) =>
      val n = xs.size.toLong
      val nllE9 = -xs.map(x => lp(x._2, x._3)).sum
      (id, n, Math.floorDiv(nllE9, n * 1000))
    }.sortBy(_._1)
    assert(out == expect)
  }

  test("KN continuation backoff punishes collocation-bound words vs add-one") {
    // 'only' appears often but ALWAYS after 'one' (a single context);
    // 'also' appears equally often after varied contexts. Under KN
    // the (fresh-context, collocation-bound) bigram scores WORSE than
    // the (fresh-context, promiscuous) one; add-one, which backs off
    // on raw frequency, cannot separate them.
    val docs = docsDf(Seq(
      (1L, "one only one only one only one only", "s"),
      (2L, "a also b also c also d also", "s"),
      (3L, "x only", "s"), // fresh context → collocation-bound word
      (4L, "x also", "s")) // fresh context → promiscuous word
    )
    val kn = ModelSelection.lmScoreKn(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("nll_e6")).toMap
    assert(kn(3L) > kn(4L),
      s"KN should punish the one-context word: ${kn(3L)} <= ${kn(4L)}")
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
