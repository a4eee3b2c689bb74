package graft.operators

import graft.SparkTestBase

/** Median/MAD outlier rule: medians interpolate, MAD resists the
  * planted outliers, verdict counts split by side. */
class OutliersSpec extends SparkTestBase {

  private def run(rows: Seq[(String, Double)], k: Double = 3.0) = {
    import spark.implicits._
    Outliers.robustOutliers(rows.toDF("g", "v"), "v", "g", k)
      .collect()
      .map(r => r.getAs[String]("g") ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_outliers"),
          r.getAs[Long]("n_low"), r.getAs[Long]("n_high")))
      .toMap
  }

  test("planted extremes flag on the correct side; bulk stays clean") {
    // group a: median 10, MAD 1 → outliers beyond 10 ± 3
    val a = Seq(8.0, 9.0, 9.0, 10.0, 10.0, 10.0, 11.0, 11.0, 12.0)
      .map("a" -> _) ++ Seq("a" -> 100.0, "a" -> -50.0)
    val out = run(a)
    val (n, nOut, nLow, nHigh) = out("a")
    assert(n == 11L)
    // with the extremes included: sorted has 11 values, median 10,
    // adevs sorted → MAD 1; 100 and −50 exceed 10 ± 3·1
    assert((nOut, nLow, nHigh) == (2L, 1L, 1L))
  }

  test("median robustness: one glitch does not shift the verdict") {
    // mean/stddev would let 1e9 mask the 40: med=10, MAD=1 flags both
    val rows = Seq(9.0, 10.0, 10.0, 10.0, 11.0, 40.0, 1e9).map("g" -> _)
    val out = run(rows)
    assert(out("g") == ((7L, 2L, 0L, 2L)))
  }

  test("constant group has MAD 0: every deviation is an outlier") {
    val rows = Seq(5.0, 5.0, 5.0, 5.0, 5.1).map("c" -> _)
    val out = run(rows)
    assert(out("c") == ((5L, 1L, 0L, 1L)))
  }

  test("even-count group interpolates the median") {
    // values 1,2,3,4 → median 2.5, adevs 1.5,0.5,0.5,1.5 → MAD 1.0;
    // nothing exceeds 2.5 ± 3
    val out = run(Seq(1.0, 2.0, 3.0, 4.0).map("e" -> _))
    assert(out("e") == ((4L, 0L, 0L, 0L)))
  }
}
