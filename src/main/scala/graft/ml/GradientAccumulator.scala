package graft.ml

import java.io.{IOException, ObjectInputStream, ObjectOutputStream}

import graft.sketch.GradientCodec

/** treeAggregate buffer for one SGD step: dense gradient sum +
  * intercept-gradient sum + row count + loss sum (the loss pass of
  * `SketchGradientDescent.scala:371-383` fused into the same scan).
  *
  * The gradient array is `@transient` and (de)serialized through the
  * configured [[GradientCodec]] — so when Spark ships partial
  * aggregates between executors / to the driver, the bytes on the
  * wire are the *compressed* gradient, exactly where the reference
  * compresses before its shuffle
  * (`/root/reference/.../SketchGradientDescent.scala:220-233`).
  * Each merge decodes → dense `plusBy` → next serialization
  * re-encodes, reproducing the Reduce path's re-compression of
  * partial sums (`SketchGradientDescent.scala:274`): lossy error
  * compounds along the aggregation tree, as in the reference.
  */
final class GradientAccumulator(val dim: Int, val codec: GradientCodec,
                                val loss: PointLoss = SquaredPointLoss)
    extends Serializable {

  @transient var grad: Array[Double] = new Array[Double](dim)
  var interceptGrad: Double = 0.0
  var count: Long = 0L
  var lossSum: Double = 0.0

  /** Add one data point's gradient at weights (w, b): margin →
    * pointwise (scale, loss) → axpy. For [[SquaredPointLoss]] this is
    * arithmetically identical to the fused residual form. */
  def add(w: Array[Double], b: Double,
          x: org.apache.spark.ml.linalg.Vector, y: Double): GradientAccumulator = {
    val z = LinearLoss.predict(w, b, x)
    val (g, l) = loss.scaleAndLoss(z, y)
    LinearLoss.addScaled(x, g, grad)
    interceptGrad += g
    lossSum += l
    count += 1
    this
  }

  /** Merge another partial (dense plusBy, `SketchGradientDescent.scala:244,262,267`). */
  def merge(other: GradientAccumulator): GradientAccumulator = {
    val og = other.grad
    var i = 0
    while (i < dim) { grad(i) += og(i); i += 1 }
    interceptGrad += other.interceptGrad
    count += other.count
    lossSum += other.lossSum
    this
  }

  @throws[IOException]
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    val bytes = codec.encode(if (grad == null) new Array[Double](dim) else grad)
    out.writeInt(bytes.length)
    out.write(bytes)
  }

  @throws[IOException]
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    val n = in.readInt()
    val bytes = new Array[Byte](n)
    in.readFully(bytes)
    grad = codec.decode(bytes)
  }
}
