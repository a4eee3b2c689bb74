package graft.ml

import org.apache.spark.ml.linalg.Vectors

import graft.SparkTestBase

/** SGD acceptance per SURVEY §5 / FIXTURES §B.2: planted-model
  * recovery, monotone loss, convergence stop, and the reference's
  * raison d'être — sketch-compressed vs uncompressed A/B parity
  * (Test.scala:43,82). */
class SgdSpec extends SparkTestBase {

  /** y = w·x + b + ε with planted w, seeded noise. */
  private def planted(n: Int, dim: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    val w = Array.tabulate(dim)(i => (i % 5) * 0.5 - 1.0)
    val b = 0.7
    val rows = (0 until n).map { _ =>
      val x = Array.fill(dim)(rnd.nextGaussian())
      val y = x.zip(w).map { case (a, c) => a * c }.sum + b + rnd.nextGaussian() * 0.01
      (y, Vectors.dense(x))
    }
    (spark.sparkContext.parallelize(rows, 4), w, b)
  }

  test("loss decreases over epochs and weights approach planted values") {
    val (data, w, b) = planted(2000, 10, seed = 42)
    val m = new SketchLinearRegression()
      .setIterations(50).setStepsize(0.3).fitRDD(data)
    val lh = m.lossHistory
    assert(lh.head > lh.last, s"loss did not decrease: ${lh.head} -> ${lh.last}")
    // MAE of recovered weights
    val mae = m.weights.zip(w).map { case (a, c) => math.abs(a - c) }.sum / w.length
    assert(mae < 0.15, s"weight MAE $mae; got ${m.weights.toSeq} want ${w.toSeq}")
    assert(math.abs(m.intercept - b) < 0.2, s"intercept ${m.intercept} vs $b")
  }

  test("convergence threshold stops early (S19 semantics)") {
    val (data, _, _) = planted(500, 5, seed = 7)
    val m = new SketchLinearRegression()
      .setIterations(200).setStepsize(0.5).setConvergenceThreshold(1e-4)
      .fitRDD(data)
    assert(m.lossHistory.length < 200, "never converged")
  }

  test("zero loss converges instead of NaN-ing the relative test") {
    // perfectly-fit data: w=0,b=0 already has loss 0, so prevLoss=0.
    // The unguarded relative test 0/0 = NaN would never terminate.
    val rows = Seq((0.0, Vectors.dense(0.0, 0.0)), (0.0, Vectors.dense(0.0, 0.0)))
    val rdd = spark.sparkContext.parallelize(rows, 2)
    val m = new SketchLinearRegression()
      .setIterations(50).setStepsize(0.1).setConvergenceThreshold(1e-4)
      .fitRDD(rdd)
    assert(m.lossHistory.length == 2,
      s"0→0 loss should converge at iteration 2, ran ${m.lossHistory.length}")
    assert(m.lossHistory.forall(l => !l.isNaN))
  }

  test("sketch-compressed training tracks uncompressed (A/B parity)") {
    // The reference's acceptance criterion is *comparable accuracy*
    // between --sketchOrFlink Sketch|Flink runs (Test.scala:43,82),
    // not weight equality — the codec is lossy by design. Assert the
    // sketch-trained model still recovers the planted weights nearly
    // as well as the uncompressed run.
    val (data, w, _) = planted(3000, 50, seed = 99)
    data.cache()
    val none = new SketchLinearRegression()
      .setIterations(20).setStepsize(0.3).setCompressionType("None").fitRDD(data)
    val sk = new SketchLinearRegression()
      .setIterations(20).setStepsize(0.3).setCompressionType("Sketch").fitRDD(data)
    def maeTo(m: LinearModel) =
      m.weights.zip(w).map { case (a, c) => math.abs(a - c) }.sum / w.length
    val (maeNone, maeSk) = (maeTo(none), maeTo(sk))
    assert(maeSk < 2.0 * maeNone + 0.1, s"planted-MAE none=$maeNone sketch=$maeSk")
    assert(sk.lossHistory.last < 3.0 * none.lossHistory.last + 0.1,
      s"final losses ${none.lossHistory.last} vs ${sk.lossHistory.last}")
    assert(sk.lossHistory.head > sk.lossHistory.last, "sketch run did not descend")
  }

  test("single iteration equals closed-form gradient step") {
    val rows = Seq((1.0, Vectors.dense(2.0)), (2.0, Vectors.dense(4.0)))
    val rdd = spark.sparkContext.parallelize(rows, 2)
    val m = new SketchLinearRegression().setIterations(1).setStepsize(0.1).fitRDD(rdd)
    // grad_w = avg(-y*x) = -(2 + 8)/2 = -5 ; w1 = 0.1*5 = 0.5
    assert(math.abs(m.weights(0) - 0.5) < 1e-12)
    // grad_b = avg(-y) = -1.5 ; b1 = 0.15
    assert(math.abs(m.intercept - 0.15) < 1e-12)
  }

  test("model transform/evaluate computes wᵀx + b columnar") {
    import spark.implicits._
    val df = Seq((1.0, Seq(1.0, 2.0)), (0.0, Seq(0.5, 0.5)))
      .toDF("label", "features")
    val m = LinearModel(Array(2.0, 1.0), 0.5)
    val preds = m.evaluate(df).collect().map(r => (r.getDouble(0), r.getDouble(1))).toMap
    assert(preds(1.0) == 2.0 * 1.0 + 1.0 * 2.0 + 0.5)
    assert(preds(0.0) == 2.0 * 0.5 + 1.0 * 0.5 + 0.5)
  }
}
