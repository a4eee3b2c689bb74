package graft.ml

import org.apache.spark.ml.linalg.{DenseVector, SparseVector, Vector}

/** Squared loss with linear prediction — parity with FlinkML's
  * `GenericLossFunction(SquaredLoss, LinearPrediction)` hard-coded by
  * the reference (`/root/reference/.../SketchMultipleLinearRegression.scala:85,131`,
  * `FlinkMultipleLinearRegression.scala:146,192`):
  *   prediction  ŷ = wᵀx + b
  *   loss        L = ½(ŷ − y)²
  *   gradient    ∇w = (ŷ − y)·x,  ∇b = (ŷ − y)
  */
object LinearLoss {

  def predict(w: Array[Double], b: Double, x: Vector): Double = {
    var dot = b
    x match {
      case d: DenseVector =>
        val v = d.values
        var i = 0
        while (i < v.length) { dot += w(i) * v(i); i += 1 }
      case s: SparseVector =>
        val idx = s.indices; val v = s.values
        var i = 0
        while (i < idx.length) { dot += w(idx(i)) * v(i); i += 1 }
    }
    dot
  }

  def loss(w: Array[Double], b: Double, x: Vector, y: Double): Double = {
    val r = predict(w, b, x) - y
    0.5 * r * r
  }

  /** Accumulate this point's gradient into `gradOut` (axpy-style, the
    * left-fold-densify trick of `FlinkGradientDescent.scala:222-230`);
    * returns the residual (= intercept gradient). */
  def addGradient(w: Array[Double], b: Double, x: Vector, y: Double,
                  gradOut: Array[Double]): Double = {
    val r = predict(w, b, x) - y
    x match {
      case d: DenseVector =>
        val v = d.values
        var i = 0
        while (i < v.length) { gradOut(i) += r * v(i); i += 1 }
      case s: SparseVector =>
        val idx = s.indices; val v = s.values
        var i = 0
        while (i < idx.length) { gradOut(idx(i)) += r * v(i); i += 1 }
    }
    r
  }
}
