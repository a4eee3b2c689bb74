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

  /** Reference encoder: apply the reference learner's merges to a
    * word greedily left-to-right, per learned round order. */
  private def refEncode(word: String,
                        merges: Seq[(Int, String, String, Long)]): Seq[String] = {
    var syms: Seq[String] = word.toSeq.map(_.toString)
    merges.sortBy(_._1).foreach { case (_, pa, pb, _) =>
      val merged = scala.collection.mutable.ArrayBuffer[String]()
      var i = 0
      while (i < syms.size) {
        if (i + 1 < syms.size && syms(i) == pa && syms(i + 1) == pb) {
          merged += pa + pb; i += 2
        } else { merged += syms(i); i += 1 }
      }
      syms = merged.toSeq
    }
    syms
  }

  test("encode applies the learned merges and round-trips through the id table") {
    import spark.implicits._
    val docs = Seq(
      (0L, "aaab aaab banana"),
      (1L, "banana bandana aaab"),
      (2L, "aaab abab banana banana"),
      (3L, "???") // no [a-z0-9] token: 0 tokens, empty id string
    ).toDF("doc_id", "text")
    val words = Seq("aaab", "aaab", "banana", "banana", "bandana", "aaab",
      "aaab", "abab", "banana", "banana")
    val freq = words.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    val merges = refBpe(freq, 4)
    // expected: per doc, concatenate each word's reference encoding,
    // then map symbols to lexicographic-rank ids
    val docWords = Map(
      0L -> Seq("aaab", "aaab", "banana"),
      1L -> Seq("banana", "bandana", "aaab"),
      2L -> Seq("aaab", "abab", "banana", "banana"),
      3L -> Seq.empty[String])
    val symSeqs = docWords.map { case (id, ws) =>
      id -> ws.flatMap(w => refEncode(w, merges))
    }
    val symtab = symSeqs.values.flatten.toSeq.distinct.sorted.zipWithIndex
      .map { case (s, i) => s -> (i + 1) }.toMap
    val expected = symSeqs.map { case (id, syms) =>
      (id, syms.size.toLong, syms.map(symtab).mkString(" "))
    }.toSet
    val got = Tokenizer.bpeEncode(docs, rounds = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == expected, s"got $got expected $expected")
  }

  test("word-frequency table keeps the stable word key") {
    import spark.implicits._
    val docs = Seq((0L, "ab ab cd")).toDF("doc_id", "text")
    val wf = Tokenizer.wordFreq(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(wf == Set(("ab", "<a><b>", 2L), ("cd", "<c><d>", 1L)))
  }
}
