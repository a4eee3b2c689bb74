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

  /** Sequential-fold dot product of two array<double> columns. */
  def dotArr(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (a, b) => a * b), lit(0.0), (acc, v) => acc + v)

  /** Sum of squares, sequential fold. */
  def sumSq(x: Column): Column =
    aggregate(x, lit(0.0), (acc, v) => acc + v * v)

  /** L2 norm. */
  def l2Norm(x: Column): Column = sqrt(sumSq(x))

  /** Cosine similarity between two array<double> columns. */
  def cosineSim(x: Column, y: Column): Column =
    dotArr(x, y) / (l2Norm(x) * l2Norm(y))

  /** Linear prediction wᵀx + b with a constant weight array.
    * Mirrors PredictOperation.predict
    * (/root/reference/.../SketchMultipleLinearRegression.scala:166-172). */
  def linearPredict(x: Column, weights: Seq[Double], intercept: Double): Column =
    dotArr(x, array(weights.map(lit): _*)) + lit(intercept)
}
