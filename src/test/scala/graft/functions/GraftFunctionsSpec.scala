package graft.functions

import graft.SparkTestBase

/** The engine's custom Catalyst expressions must be reachable from
  * SQL TEXT, not just the Column API — registerAll puts dot_product,
  * centroid_cosines, and gradient_sketch_sum in the session
  * FunctionRegistry. */
class GraftFunctionsSpec extends SparkTestBase {

  test("all three custom functions are callable from SQL text") {
    GraftFunctions.registerAll(spark)
    val dp = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
    assert(dp.head().getDouble(0) == 32.0)

    val cc = spark.sql(
      "SELECT centroid_cosines(array(1.0d, 0.0d), " +
        "array(array(1.0d, 0.0d), array(0.0d, 1.0d), array(-1.0d, 0.0d))) AS cs")
    val cs = cc.head().getSeq[Double](0)
    assert(math.abs(cs(0) - 1.0) < 1e-12)
    assert(math.abs(cs(1)) < 1e-12)
    assert(math.abs(cs(2) + 1.0) < 1e-12)

    import spark.implicits._
    Seq((1L, Array(1.0, 2.0)), (1L, Array(3.0, 4.0)), (2L, Array(5.0, 5.0)))
      .toDF("g", "grad").createOrReplaceTempView("gfs_grads")
    val gs = spark.sql(
      "SELECT g, gradient_sketch_sum(grad, 'None') AS s " +
        "FROM gfs_grads GROUP BY g ORDER BY g").collect()
    assert(gs(0).getSeq[Double](1) == Seq(4.0, 6.0))
    assert(gs(1).getSeq[Double](1) == Seq(5.0, 5.0))
  }

  test("centroid_cosines rejects a non-literal or non-double matrix") {
    GraftFunctions.registerAll(spark)
    import spark.implicits._
    Seq((Array(1.0), Array(Array(1.0)))).toDF("v", "m")
      .createOrReplaceTempView("gfs_bad")
    intercept[Exception] {
      spark.sql("SELECT centroid_cosines(v, m) FROM gfs_bad").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT centroid_cosines(array(1.0d), array(array(1)))").collect()
    }
  }

  test("gradient_sketch_sum defaults to the lossy Sketch codec in SQL") {
    GraftFunctions.registerAll(spark)
    import spark.implicits._
    val dim = 32
    val rows = (1 to 200).map { i =>
      (1L, Array.tabulate(dim)(j => math.sin(i * 0.7 + j) * (if (j % 7 == 0) 3.0 else 0.1)))
    }
    rows.toDF("g", "grad").createOrReplaceTempView("gfs_lossy")
    val s = spark.sql(
      "SELECT gradient_sketch_sum(grad) AS s FROM gfs_lossy GROUP BY g")
      .head().getSeq[Double](0)
    val exact = spark.sql(
      "SELECT gradient_sketch_sum(grad, 'None') AS s FROM gfs_lossy GROUP BY g")
      .head().getSeq[Double](0)
    assert(s.length == dim && exact.length == dim)
    // no codec arg ⇒ the lossy Sketch path, so the decoded sum must
    // DIFFER from the lossless one (accuracy bounds are property-
    // tested in SketchGradientSumSpec; this test pins the default)
    assert(s != exact, "default codec produced bit-exact sums — Sketch path not engaged")
  }
}
