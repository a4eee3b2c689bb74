package graft.operators

import graft.SparkTestBase

/** BM25 retrieval: scoring kernel checked against a hand-computed
  * reference on a controlled corpus; determinism and top-k contract. */
class RetrievalSpec extends SparkTestBase {

  private def corpus = {
    import spark.implicits._
    // "data" everywhere (high df -> low idf), "spark" rare, stopword
    // fillers vary document length
    Seq(
      (0L, "spark data tool"),
      (1L, "data data data of the of the"),
      (2L, "spark spark data of the"),
      (3L, "data of"),
      (4L, "tool data of the a and in")
    ).toDF("doc_id", "text")
  }

  test("scores match a scalar BM25 reference implementation") {
    val got = Retrieval.bm25TopK(corpus, nQueryTerms = 3, k = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    // reference in plain scala, mirroring the operator's definitions
    val docs = Map(
      0L -> "spark data tool", 1L -> "data data data of the of the",
      2L -> "spark spark data of the", 3L -> "data of",
      4L -> "tool data of the a and in")
    val tokens = docs.map { case (id, t) => id -> t.split(" ").toSeq }
    val stop = Set("the", "a", "of", "and", "in")
    val df = tokens.values.flatMap(_.distinct).groupBy(identity)
      .map { case (t, xs) => t -> xs.size }
    val qterms = df.filterNot(kv => stop(kv._1)).toSeq
      .sortBy { case (t, d) => (-d, t) }.take(3).toMap // data, spark, tool
    val nDocs = docs.size.toDouble
    val avgdl = tokens.values.map(_.size).sum.toDouble / nDocs
    val (k1, b) = (1.2, 0.75)
    val expected = tokens.map { case (id, toks) =>
      val dl = toks.size.toDouble
      val scores = qterms.toSeq.flatMap { case (term, dfT) =>
        val tf = toks.count(_ == term).toDouble
        if (tf == 0) None
        else {
          val idf = math.log(1.0 + (nDocs - dfT + 0.5) / (dfT + 0.5))
          val norm = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * (dl / avgdl)))
          Some(math.floor(idf * norm * 1e6).toLong)
        }
      }
      id -> ((scores.size.toLong, scores.sum))
    }.filter(_._2._1 > 0)

    assert(got == expected, s"got $got expected $expected")
  }

  test("top-k boundary is a deterministic total order") {
    val a = Retrieval.bm25TopK(corpus, nQueryTerms = 3, k = 2).collect().toSeq
    val b = Retrieval.bm25TopK(corpus, nQueryTerms = 3, k = 2).collect().toSeq
    assert(a == b)
    assert(a.size == 2)
  }
}
