package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.ModelSelection
import graft.ml.SketchLogisticRegression

/** Scratch driver for the q_quality_classifier tuning: prints
  * accuracy / loss / weight diagnostics for a given sf dir and
  * hyper-parameters. Usage: ClsDebug <sfDir> [iters] [step]. */
object ClsDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val iters = if (args.length > 1) args(1).toInt else 30
    val step = if (args.length > 2) args(2).toDouble else 8.0
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val spam = " click here free offer subscribe now winner prize claim bonus"
    val docs = Tables.documents(spark, sfDir)
    val planted = docs.select(col("doc_id"),
      when(pmod(col("doc_id"), lit(5)) < 2,
        concat(col("text"), repeat(lit(spam),
          (col("n_chars") / 200).cast("int") + 1)))
        .otherwise(col("text")).as("text"))
    // marker-bucket diagnostics
    val fx = ModelSelection.hashedFeatures(planted)
      .join(planted.select(col("doc_id"),
        (pmod(col("doc_id"), lit(5)) >= 2).cast("double").as("label")), Seq("doc_id"))
    fx.groupBy(col("label")).agg(avg(col("n_tokens"))).show()
    val (m, feats) = ModelSelection.trainQualityClassifier(planted,
      labelCol = pmod(col("doc_id"), lit(5)) >= 2,
      iterations = iters, stepSize = step)
    println(s"weights=${m.weights.map(w => f"$w%.3f").mkString(",")} b=${m.intercept}")
    println(s"lossHistory=${m.lossHistory.map(l => f"$l%.4f").mkString(",")}")
    SketchLogisticRegression.binaryAccuracy(m, feats).show()
    spark.stop()
  }
}
