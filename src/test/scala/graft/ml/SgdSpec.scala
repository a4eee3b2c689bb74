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

  // --- learning-rate-method / regularization parity (FlinkML
  // LearningRateMethod + RegularizationPenalty families the reference
  // re-exposes; SketchMultipleLinearRegression.scala:56-58,
  // SketchGradientDescent.scala:50-51). Same two-point fixture as the
  // closed-form test above: mean grad_w = -5, grad_b = -1.5 at w=0.

  private def twoPoint = spark.sparkContext.parallelize(
    Seq((1.0, Vectors.dense(2.0)), (2.0, Vectors.dense(4.0))), 2)

  test("learning rate schedules: closed-form single step per method") {
    def w1(m: LearningRateMethod, lambda: Double = 0.0) =
      new SketchLinearRegression().setIterations(1).setStepsize(0.1)
        .setLearningRateMethod(m).setRegularizationConstant(lambda)
        .fitRDD(twoPoint).weights(0)
    // Default: η = 0.1/√1 = 0.1 → w = 0.5 (matches legacy path)
    assert(math.abs(w1(LearningRateMethod.Default) - 0.5) < 1e-12)
    // Constant: same at t=1
    assert(math.abs(w1(LearningRateMethod.Constant) - 0.5) < 1e-12)
    // Bottou(t0=4), λ=0.5: η = 1/(0.5·(4+1−1)) = 0.5 → w = 2.5
    assert(math.abs(w1(LearningRateMethod.Bottou(4.0), lambda = 0.5) - 2.5) < 1e-12)
    // InvScaling(0.25): η = 0.1/1^0.25 = 0.1 → w = 0.5
    assert(math.abs(w1(LearningRateMethod.InvScaling(0.25)) - 0.5) < 1e-12)
    // Xu(0.5), λ=2: η = 0.1·(1+2·0.1·1)^−0.5 → w = 5η
    val etaXu = 0.1 * math.pow(1.2, -0.5)
    assert(math.abs(w1(LearningRateMethod.Xu(0.5), lambda = 2.0) - 5 * etaXu) < 1e-12)
  }

  test("schedules decay across iterations (t enters the rate)") {
    def w2(m: LearningRateMethod) =
      new SketchLinearRegression().setIterations(2).setStepsize(0.1)
        .setLearningRateMethod(m).fitRDD(twoPoint).weights(0)
    // Step 2's gradient at w1=0.5 is positive (overshoot), so the
    // larger the step-2 rate the further w comes back down:
    // Constant (η=0.1) < Default (η/√2) < InvScaling(1) (η/2).
    val (wc, wd, wi) = (w2(LearningRateMethod.Constant),
      w2(LearningRateMethod.Default), w2(LearningRateMethod.InvScaling(1.0)))
    assert(wc < wd && wd < wi, s"expected Constant < Default < InvScaling(1): $wc $wd $wi")
  }

  test("L2 takeStep folds λ·w into the gradient and adds λ‖w‖²/2 to loss") {
    // iter 1 from w=0: L2 term is 0 → w1 = 0.5 either way.
    // iter 2: grad_w = avg((w·x−y)·x) at w=0.5,b=0.15... instead check
    // directly with 1 iteration from nonzero start via two iterations:
    val m = new SketchLinearRegression().setIterations(2).setStepsize(0.1)
      .setLearningRateMethod(LearningRateMethod.Constant)
      .setRegularizationPenalty(L2Regularization).setRegularizationConstant(0.8)
      .fitRDD(twoPoint)
    val plain = new SketchLinearRegression().setIterations(2).setStepsize(0.1)
      .setLearningRateMethod(LearningRateMethod.Constant)
      .fitRDD(twoPoint)
    // hand-rolled iter 2 with the penalty: w2 = w1 − η·(g(w1) + λ·w1)
    // where g/b come from the same data pass as the unregularized run
    val eta = 0.1; val lambda = 0.8
    val (w1v, b1) = (0.5, 0.15)
    val g = Seq((1.0, 2.0), (2.0, 4.0)).map { case (y, x) =>
      (w1v * x + b1 - y) * x }.sum / 2
    val expected = w1v - eta * (g + lambda * w1v)
    assert(math.abs(m.weights(0) - expected) < 1e-12,
      s"L2 w2 ${m.weights(0)} vs $expected (plain ${plain.weights(0)})")
    assert(m.weights(0) < plain.weights(0), "L2 must shrink vs unregularized")
    // reported loss is the regularized objective
    assert(m.lossHistory(1) > plain.lossHistory(1),
      "L2 objective must include the penalty term")
  }

  test("L1 proximal step soft-thresholds small weights to exact zero") {
    // big λ: shrinkage λ·η = 0.6 exceeds the 0.5 gradient step → w = 0 exactly
    val m = new SketchLinearRegression().setIterations(1).setStepsize(0.1)
      .setLearningRateMethod(LearningRateMethod.Constant)
      .setRegularizationPenalty(L1Regularization).setRegularizationConstant(6.0)
      .fitRDD(twoPoint)
    assert(m.weights(0) == 0.0, s"expected exact zero, got ${m.weights(0)}")
    // moderate λ: w = sign(0.5)·(0.5 − 0.1·1.0) = 0.4
    val m2 = new SketchLinearRegression().setIterations(1).setStepsize(0.1)
      .setLearningRateMethod(LearningRateMethod.Constant)
      .setRegularizationPenalty(L1Regularization).setRegularizationConstant(1.0)
      .fitRDD(twoPoint)
    assert(math.abs(m2.weights(0) - 0.4) < 1e-12, s"got ${m2.weights(0)}")
  }

  test("regularization never touches the intercept") {
    val reg = new SketchLinearRegression().setIterations(1).setStepsize(0.1)
      .setRegularizationPenalty(L2Regularization).setRegularizationConstant(10.0)
      .fitRDD(twoPoint)
    val plain = new SketchLinearRegression().setIterations(1).setStepsize(0.1)
      .fitRDD(twoPoint)
    assert(reg.intercept == plain.intercept,
      s"intercept must be penalty-free: ${reg.intercept} vs ${plain.intercept}")
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

  test("logistic: one step from zero matches the closed form") {
    // at w=0,b=0 every margin is 0 ⇒ p=½ and the gradient scale is
    // (½ − y) exactly; one Default-schedule step of size η gives
    // w = −η·mean((½−y)·x), b = −η·mean(½−y)
    val eta = 0.8
    val rows = Seq(
      (1.0, Vectors.dense(2.0, -1.0)),
      (0.0, Vectors.dense(0.5, 3.0)),
      (1.0, Vectors.dense(-1.5, 0.25)))
    val data = spark.sparkContext.parallelize(rows, 2)
    val m = new SketchLogisticRegression()
      .setIterations(1).setStepsize(eta).fitRDD(data)
    def mean(f: ((Double, org.apache.spark.ml.linalg.Vector)) => Double) =
      rows.map(f).sum / rows.length
    val expW0 = -eta * mean { case (y, x) => (0.5 - y) * x(0) }
    val expW1 = -eta * mean { case (y, x) => (0.5 - y) * x(1) }
    val expB = -eta * mean { case (y, _) => 0.5 - y }
    assert(math.abs(m.weights(0) - expW0) < 1e-12)
    assert(math.abs(m.weights(1) - expW1) < 1e-12)
    assert(math.abs(m.intercept - expB) < 1e-12)
    // first-iteration loss at w=0 is exactly log 2 per point
    assert(math.abs(m.lossHistory.head - math.log(2.0)) < 1e-12)
  }

  test("logistic separates a linearly separable cloud") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 400).map { _ =>
      val x = Array(rnd.nextGaussian(), rnd.nextGaussian())
      val y = if (x(0) + 0.5 * x(1) > 0) 1.0 else 0.0
      (y, Vectors.dense(x))
    }
    val data = spark.sparkContext.parallelize(rows, 4)
    val m = new SketchLogisticRegression()
      .setIterations(40).setStepsize(2.0).fitRDD(data)
    val acc = rows.count { case (y, x) =>
      val z = m.weights(0) * x(0) + m.weights(1) * x(1) + m.intercept
      (if (z >= 0) 1.0 else 0.0) == y
    }.toDouble / rows.length
    assert(acc >= 0.95, s"logistic failed to separate: accuracy $acc")
    // log-loss must fall monotonically-ish: final well below initial
    assert(m.lossHistory.last < m.lossHistory.head / 2)
  }

  test("sketch-compressed logistic tracks the uncompressed run (A/B)") {
    // the reference's raison d'être — lossy gradient compression on
    // the aggregation exchange — must transfer to the logistic loss
    // through the PointLoss seam without derailing training
    val rnd = new scala.util.Random(23)
    val rows = (0 until 600).map { _ =>
      val x = Array(rnd.nextGaussian(), rnd.nextGaussian(), rnd.nextGaussian())
      val y = if (x(0) - 0.7 * x(2) > 0) 1.0 else 0.0
      (y, Vectors.dense(x))
    }
    val data = spark.sparkContext.parallelize(rows, 4)
    def fit(codec: String) = new SketchLogisticRegression()
      .setIterations(30).setStepsize(2.0).setCompressionType(codec).fitRDD(data)
    val plain = fit("None")
    val sketch = fit("Sketch")
    def acc(m: LinearModel) = rows.count { case (y, x) =>
      val z = m.weights.zip(x.toArray).map { case (w, v) => w * v }.sum + m.intercept
      (if (z >= 0) 1.0 else 0.0) == y
    }.toDouble / rows.length
    assert(acc(plain) >= 0.95, s"plain accuracy ${acc(plain)}")
    assert(acc(sketch) >= 0.93, s"sketch accuracy ${acc(sketch)}")
    val mae = plain.weights.zip(sketch.weights)
      .map { case (a, b) => math.abs(a - b) }.sum / plain.weights.length
    val scale = plain.weights.map(math.abs).max
    assert(mae <= 0.2 * scale,
      s"sketch drifted: MAE $mae vs plain ${plain.weights.toSeq} / sketch ${sketch.weights.toSeq}")
  }

  test("sparse high-dim accumulation: bounded buffers, weights equal the dense path's") {
    import org.apache.spark.ml.linalg.Vectors
    val dim = 1000000
    // 60 sparse rows over 3 active features spread across the index
    // space — the regime where a dense per-task buffer would burn
    // 8 MB for 3 live entries
    val active = Array(0, 499999, 999999)
    val rnd = new scala.util.Random(7)
    val wTrue = Array(1.5, -2.0, 0.5)
    val rows = (0 until 60).map { _ =>
      val xs = active.map(_ => rnd.nextGaussian())
      val y = xs.zip(wTrue).map { case (a, c) => a * c }.sum + 0.3
      (y, Vectors.sparse(dim, active, xs))
    }
    // the same data geometry at dim = 3: per-coordinate gradient math
    // is identical (IdentityCodec — no lossy stage), so the fitted
    // weights agree to within treeAggregate's driver-merge float
    // reorder (RDD.reduce folds partials in task-COMPLETION order, a
    // ±few-ULP wobble that exists between any two runs, dense or not)
    val big = new SketchLinearRegression().setIterations(15).setStepsize(0.2)
      .fitRDD(spark.sparkContext.parallelize(rows, 4))
    val small = new SketchLinearRegression().setIterations(15).setStepsize(0.2)
      .fitRDD(spark.sparkContext.parallelize(
        rows.map { case (y, v) =>
          (y, Vectors.dense(active.map(v.apply))) }, 4))
    active.zipWithIndex.foreach { case (i, j) =>
      assert(math.abs(big.weights(i) - small.weights(j)) < 1e-9,
        s"sparse-path weight at $i diverged: ${big.weights(i)} vs ${small.weights(j)}")
    }
    assert(math.abs(big.intercept - small.intercept) < 1e-9)
    assert(big.weights.count(_ != 0.0) == active.length,
      "inactive coordinates moved in the sparse fit")

    // buffer-level contract: the accumulator stays sparse through
    // adds, a serialization round-trip, and sparse∪sparse merges —
    // and densifies when a dense row arrives, with equal sums
    val acc = new GradientAccumulator(dim, graft.sketch.IdentityCodec)
    val w0 = new Array[Double](dim)
    rows.take(20).foreach { case (y, x) => acc.add(w0, 0.0, x, y) }
    assert(acc.isSparse, "sparse rows densified the buffer")
    val ser = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(ser); oos.writeObject(acc); oos.close()
    assert(ser.size() < 64 * 1024,
      s"sparse wire frame is ${ser.size()} B — a densified frame would be ~8 MB")
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(ser.toByteArray))
      .readObject().asInstanceOf[GradientAccumulator]
    assert(back.isSparse, "deserialization densified the buffer")
    val other = new GradientAccumulator(dim, graft.sketch.IdentityCodec)
    rows.drop(20).foreach { case (y, x) => other.add(w0, 0.0, x, y) }
    back.merge(other)
    assert(back.isSparse, "sparse ∪ sparse merge densified")
    val direct = new GradientAccumulator(dim, graft.sketch.IdentityCodec)
    rows.foreach { case (y, x) => direct.add(w0, 0.0, x, y) }
    active.foreach { i =>
      assert(math.abs(back.grad(i) - direct.grad(i)) < 1e-12,
        s"merged sparse sum diverged at $i")
    }
    val denseRow = (1.0, Vectors.dense(Array.fill(dim)(0.0).updated(5, 1.0)))
    val forced = new GradientAccumulator(dim, graft.sketch.IdentityCodec)
    forced.add(w0, 0.0, denseRow._2, denseRow._1)
    assert(!forced.isSparse, "a dense row should densify the buffer")
  }
}
