package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Columnar vector math over `array<double>` columns using Spark's
  * higher-order functions (codegen'd; no UDFs, no serialization of
  * Scala closures per row). The fold order of `aggregate` is
  * sequential over the array, which keeps float results bit-identical
  * with DuckDB's `list_aggregate(..., 'sum')` oracle — important for
  * hash-compared query outputs.
  *
  * Reference surface covered: per-row dot products for prediction
  * `ŷ = wᵀx + b` (/root/reference/.../SketchMultipleLinearRegression.scala:166-172)
  * and cosine similarity for the embedding extension operators.
  */
object VectorOps {

  /** Cast any numeric array (e.g. parquet `list<float>`) to array<double>. */
  def asDoubleArray(c: Column): Column = c.cast("array<double>")

  /** Sequential-fold dot product of two array<double> columns —
    * backed by the native codegen [[DotProduct]] expression (the HOF
    * `aggregate(zip_with(...))` form is interpreted and ~10× slower
    * in similarity scans; fold order is identical). */
  def dotArr(x: Column, y: Column): Column = DotProduct.dot(x, y)

  /** Sum of squares = dot(x, x), sequential fold. */
  def sumSq(x: Column): Column = DotProduct.dot(x, x)

  /** L2 norm. */
  def l2Norm(x: Column): Column = sqrt(sumSq(x))

  /** Cosine similarity between two array<double> columns. Null (not
    * a DIVIDE_BY_ZERO error — ANSI mode throws on those) when either
    * vector has zero norm: a zero embedding WILL occur in a real
    * corpus, and a null score simply ranks last under desc ordering. */
  def cosineSim(x: Column, y: Column): Column = {
    val d = l2Norm(x) * l2Norm(y)
    when(d > 0, dotArr(x, y) / d)
  }

  /** Linear prediction wᵀx + b with a constant weight array.
    * Mirrors PredictOperation.predict
    * (/root/reference/.../SketchMultipleLinearRegression.scala:166-172). */
  def linearPredict(x: Column, weights: Seq[Double], intercept: Double): Column =
    dotArr(x, lit(weights.toArray)) + lit(intercept)
}
