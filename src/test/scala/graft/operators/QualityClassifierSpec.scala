package graft.operators

import graft.SparkTestBase
import graft.ml.SketchLogisticRegression
import org.apache.spark.sql.functions._

/** Trained quality classifier: hashed-feature shape, planted-rule
  * separability, and the feature-scale fold-back (the returned model
  * scores RAW frequency features). */
class QualityClassifierSpec extends SparkTestBase {

  import spark.implicits._

  private val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo",
    "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima")

  // deterministic word salad; ids ≡ 0/1 (mod 5) carry the boilerplate
  private def docsDF(n: Int) = {
    (0 until n).map { i =>
      val base = (0 until 40).map(j => vocab((i * 7 + j * 3) % vocab.size))
        .mkString(" ")
      val text =
        if (i % 5 < 2)
          base + " click here free offer subscribe now winner prize" * 2
        else base
      (i.toLong, text)
    }.toDF("doc_id", "text")
  }

  test("hashed features: 64 dims, frequencies sum to 1") {
    val f = ModelSelection.hashedFeatures(docsDF(20)).collect()
    f.foreach { r =>
      val xs = r.getSeq[Double](2)
      assert(xs.length === 64)
      assert(math.abs(xs.sum - 1.0) < 1e-9, s"freqs sum ${xs.sum}")
    }
  }

  test("planted boilerplate rule separates at >= 90% accuracy") {
    val docs = docsDF(300)
    val (m, feats) = ModelSelection.trainQualityClassifier(docs,
      labelCol = pmod(col("doc_id"), lit(5)) >= 2)
    val acc = SketchLogisticRegression.binaryAccuracy(m, feats)
      .head().getAs[Long]("acc_e6")
    assert(acc >= 900000L, s"accuracy $acc")
    // determinism: a refit lands on the same separator up to
    // float-sum association (treeAggregate combine order is not
    // bit-pinned — the q_sgd_train rounding rule), so weights agree
    // to 1e-9 relative and every prediction is identical
    val (m2, _) = ModelSelection.trainQualityClassifier(docs,
      labelCol = pmod(col("doc_id"), lit(5)) >= 2)
    m.weights.zip(m2.weights).foreach { case (a, b) =>
      assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(a)),
        s"weight drift $a vs $b")
    }
    assert(math.abs(m.intercept - m2.intercept) <= 1e-9)
  }

  test("returned weights score raw frequencies (scale folded back)") {
    val docs = docsDF(120)
    val (m, feats) = ModelSelection.trainQualityClassifier(docs,
      labelCol = pmod(col("doc_id"), lit(5)) >= 2, featureScale = 16.0)
    // re-derive features independently and score through the model:
    // must agree with the training-frame accuracy pass exactly
    val raw = ModelSelection.hashedFeatures(docs)
    val viaRaw = raw.select(col("doc_id"),
        (graft.functions.VectorOps.linearPredict(col("features"),
          m.weights.toSeq, m.intercept) >= 0).as("pred"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val viaTrain = feats.select(col("doc_id"),
        (graft.functions.VectorOps.linearPredict(col("features"),
          m.weights.toSeq, m.intercept) >= 0).as("pred"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(viaRaw === viaTrain)
  }
}
