package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Deterministic stratified sampling: reproducible cut, per-stratum
  * rates honored, and no int64 overflow on huge ids (the 100 TB id
  * space). */
class SamplingSpec extends SparkTestBase {

  private def corpus = {
    import spark.implicits._
    (0L until 10000L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
  }

  test("same input → identical sample on repeated runs") {
    val s1 = Sampling.stratified(corpus, "doc_id", "lang",
      Map("en" -> 0.3), defaultRate = 0.1).select("doc_id")
    val s2 = Sampling.stratified(corpus, "doc_id", "lang",
      Map("en" -> 0.3), defaultRate = 0.1).select("doc_id")
    assert(s1.exceptAll(s2).count() == 0 && s2.exceptAll(s1).count() == 0)
  }

  test("per-stratum rates are approximately honored") {
    val counts = Sampling.stratified(corpus, "doc_id", "lang",
        Map("en" -> 0.3), defaultRate = 0.1)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 5000 docs per stratum; LCG bucket is pseudo-uniform
    assert(math.abs(counts("en") - 1500.0) < 200, s"en ${counts("en")}")
    assert(math.abs(counts("de") - 500.0) < 150, s"de ${counts("de")}")
  }

  test("bucket stays in range and never overflows for huge ids") {
    import spark.implicits._
    val huge = Seq(Long.MaxValue, Long.MaxValue - 1, 1L << 62, 0L)
      .toDF("id")
    val buckets = huge.select(Sampling.deterministicBucket(col("id")).as("b"))
      .collect().map(_.getLong(0))
    assert(buckets.forall(b => b >= 0 && b < 1000), buckets.toSeq.toString)
  }

  test("unlisted strata fall back to the default rate") {
    import spark.implicits._
    val mixed = (0L until 3000L).map(i => (i, "xx")).toDF("doc_id", "lang")
    val n = Sampling.stratified(mixed, "doc_id", "lang",
      Map("en" -> 0.9), defaultRate = 0.05).count()
    assert(math.abs(n - 150.0) < 80, s"default-rate count $n")
  }
}
