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

  test("per-group reservoir: exactly min(k, group size) rows, reproducible") {
    import spark.implicits._
    val df = ((0L until 100L).map(i => (i, "big")) ++
      (100L until 103L).map(i => (i, "tiny"))).toDF("doc_id", "lang")
    val s1 = Sampling.perGroupSample(df, "doc_id", "lang", k = 7)
    val counts = s1.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("big" -> 7L, "tiny" -> 3L))
    val s2 = Sampling.perGroupSample(df, "doc_id", "lang", k = 7)
    assert(s1.exceptAll(s2).count() == 0 && s2.exceptAll(s1).count() == 0)
    // ranks are dense 1..n and the pick is shuffled, not the smallest ids
    val big = s1.filter(col("lang") === "big").orderBy("rk").collect()
    assert(big.map(_.getAs[Int]("rk")).toSeq == (1 to 7))
    assert(big.map(_.getLong(0)).toSeq != (0L until 7L))
  }

  test("per-group reservoir runs with WindowGroupLimit map-side pruning") {
    import spark.implicits._
    val df = (0L until 10000L).map(i => (i, s"g${i % 4}")).toDF("doc_id", "lang")
    val plan = Sampling.perGroupSample(df, "doc_id", "lang", k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit:\n$plan")
  }
}
