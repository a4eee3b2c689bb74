package graft.operators

import graft.SparkTestBase

/** BPE merge induction vs a reference scalar implementation of the
  * Sennrich et al. algorithm (word-frequency table, greedy
  * non-overlapping left-to-right merge application). */
class TokenizerSpec extends SparkTestBase {

  /** Reference BPE learner over (word -> freq). */
  private def refBpe(freq: Map[String, Long], rounds: Int): Seq[(Int, String, String, Long)] = {
    var wf: Seq[(Seq[String], Long)] =
      freq.map { case (w, n) => (w.toSeq.map(_.toString): Seq[String]) -> n }.toSeq
    val out = Seq.newBuilder[(Int, String, String, Long)]
    for (r <- 1 to rounds) {
      val pairs = scala.collection.mutable.Map[(String, String), Long]()
      wf.foreach { case (syms, n) =>
        syms.zip(syms.drop(1)).foreach(p => pairs(p) = pairs.getOrElse(p, 0L) + n)
      }
      if (pairs.nonEmpty) {
        val ((pa, pb), cnt) = pairs.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }.head
        out += ((r, pa, pb, cnt))
        wf = wf.map { case (syms, n) =>
          val merged = scala.collection.mutable.ArrayBuffer[String]()
          var i = 0
          while (i < syms.size) {
            if (i + 1 < syms.size && syms(i) == pa && syms(i + 1) == pb) {
              merged += pa + pb; i += 2
            } else { merged += syms(i); i += 1 }
          }
          merged.toSeq -> n
        }
      }
    }
    out.result()
  }

  test("merges match the reference algorithm, including cascaded merges") {
    import spark.implicits._
    // "aaab" repeated drives cascaded merges (aa, then aab or aaa b
    // interactions); mixed words exercise cross-word pair pooling
    val docs = Seq(
      (0L, "aaab aaab banana"),
      (1L, "banana bandana aaab"),
      (2L, "aaab abab banana banana")
    ).toDF("doc_id", "text")
    val words = Seq("aaab", "aaab", "banana", "banana", "bandana", "aaab",
      "aaab", "abab", "banana", "banana")
    val freq = words.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    val got = Tokenizer.bpeLearn(docs, rounds = 6)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      .sortBy(_._1)
    val expected = refBpe(freq, 6)
    assert(got == expected, s"got $got expected $expected")
  }

  test("greedy left-to-right overlap: 'aaa' merges once under pair (a,a)") {
    import spark.implicits._
    val docs = Seq((0L, "aaa aaa")).toDF("doc_id", "text")
    val got = Tokenizer.bpeLearn(docs, rounds = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // round 1: pair (a,a) count 4 (two per 'a a a' word, both counted
    // pre-merge); replace is non-overlapping -> 'aa a'; round 2
    // merges (aa, a)
    assert(got == Seq((1, "a", "a", 4L), (2, "aa", "a", 2L)), got.toString)
  }

  test("word-frequency table keeps the stable word key") {
    import spark.implicits._
    val docs = Seq((0L, "ab ab cd")).toDF("doc_id", "text")
    val wf = Tokenizer.wordFreq(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(wf == Set(("ab", "<a><b>", 2L), ("cd", "<c><d>", 1L)))
  }
}
