package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Native codegen dot product: bitwise parity with the interpreted
  * HOF fold, SQL registration, null/length semantics. */
class DotProductSpec extends SparkTestBase {

  private def hofDot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
    aggregate(zip_with(x, y, (a, b) => a * b), lit(0.0), (acc, v) => acc + v)

  test("matches the HOF fold bitwise on random vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val rows = (1 to 200).map(_ =>
      (Seq.fill(64)(rnd.nextGaussian()), Seq.fill(64)(rnd.nextGaussian())))
    val df = rows.toDF("x", "y")
    val out = df.select(
      DotProduct.dot(col("x"), col("y")).as("native"),
      hofDot(col("x"), col("y")).as("hof")).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("null array → null; shorter prefix folds") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(10.0, 10.0))).toDF("x", "y")
    assert(df.select(DotProduct.dot(col("x"), col("y"))).head().getDouble(0) == 30.0)
    val withNull = df.select(DotProduct.dot(lit(null).cast("array<double>"), col("y")))
    assert(withNull.head().isNullAt(0))
  }

  test("registered SQL function dot_product works") {
    DotProduct.register(spark)
    val r = spark.sql("SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
    assert(r.head().getDouble(0) == 11.0)
  }
}
