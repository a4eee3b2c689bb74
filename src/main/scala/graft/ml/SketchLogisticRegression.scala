package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Binary logistic regression on the SAME sketch-SGD machinery as
  * [[SketchLinearRegression]] — engine extension beyond the
  * reference's hard-coded squared loss (the reference trains linear
  * regression only; classification is the obvious next ask of the
  * same gradient pipeline). Only the pointwise loss differs
  * ([[LogisticPointLoss]]: g = σ(wᵀx+b) − y for y ∈ {0,1}); the
  * driver loop, codec-compressed `treeAggregate` exchange, learning
  * rate schedules, and L1/L2 penalties are all inherited, so sketch
  * compression measurements transfer directly to classification.
  */
class SketchLogisticRegression extends SketchLinearRegression {

  override protected def pointLoss: PointLoss = LogisticPointLoss
}

object SketchLogisticRegression {

  /** Columnar accuracy of the fitted model on (features, label∈{0,1})
    * rows: class = [wᵀx + b ≥ 0] (σ(z) ≥ ½ ⇔ z ≥ 0), compared to the
    * label in one codegen'd aggregate — no UDF, no collect. */
  def binaryAccuracy(model: LinearModel, df: DataFrame,
                     featuresCol: String = "features",
                     labelCol: String = "label"): DataFrame =
    df.select(
        (VectorOps.linearPredict(col(featuresCol), model.weights.toSeq,
          model.intercept) >= 0).cast("int").as("pred"),
        col(labelCol).cast("int").as("y"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("pred") === col("y"), 1L).otherwise(0L)).as("n_correct"))
      .select(col("n"), col("n_correct"),
        expr("n_correct * 1000000 div n").as("acc_e6"))
}
