package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** SQL-level compressed gradient aggregation: lossless parity with a
  * plain sum when compression=None; bounded error and grouped
  * operation with the sketch codec. */
class SketchGradientSumSpec extends SparkTestBase {

  private def gradDf = {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    (1 to 400).map(i => (i % 4, Seq.fill(32)(rnd.nextGaussian())))
      .toDF("g", "grad")
  }

  test("compression=None equals exact per-element sums") {
    val df = gradDf
    val exact = df.select(
      (0 until 32).map(i => sum(element_at(col("grad"), i + 1)).as(s"s$i")): _*).head()
    val agg = df.select(
        SketchGradientSum.gradientSketchSum(col("grad"), "None").as("s"))
      .head().getSeq[Double](0)
    (0 until 32).foreach(i => assert(math.abs(agg(i) - exact.getDouble(i)) < 1e-9,
      s"elem $i: ${agg(i)} vs ${exact.getDouble(i)}"))
  }

  test("sketch compression: grouped sums stay within lossy tolerance") {
    val df = gradDf
    val exact = df.groupBy("g").agg(
      SketchGradientSum.gradientSketchSum(col("grad"), "None").as("s"))
    val sk = df.groupBy("g").agg(
      SketchGradientSum.gradientSketchSum(col("grad"), "Sketch").as("s"))
    val e = exact.collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val s = sk.collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    e.foreach { case (g, ev) =>
      val sv = s(g)
      val relL2 = math.sqrt(ev.zip(sv).map { case (a, b) => (a - b) * (a - b) }.sum) /
        math.sqrt(ev.map(v => v * v).sum)
      assert(relL2 < 0.7, s"group $g relL2 $relL2")
    }
  }

  test("registered SQL aggregate works end-to-end") {
    SketchGradientSum.register(spark)
    gradDf.createOrReplaceTempView("grads")
    val out = spark.sql(
      "SELECT g, gradient_sketch_sum(grad) AS s FROM grads GROUP BY g ORDER BY g")
    assert(out.count() == 4)
    assert(out.head().getSeq[Double](1).length == 32)
  }
}
