package graft.ml

import java.io.{IOException, ObjectInputStream, ObjectOutputStream}

import graft.sketch.GradientCodec

/** treeAggregate buffer for one SGD step: gradient sum + intercept-
  * gradient sum + row count + loss sum (the loss pass of
  * `SketchGradientDescent.scala:371-383` fused into the same scan).
  *
  * BUFFER SHAPE mirrors the reference's dense/sparse gradient split
  * (`SketchGradientDescent.scala:205-217` carries
  * `DenseDoubleGradient` for dense rows and `SparseDoubleGradient`
  * for sparse ones): at ordinary dims the buffer is a plain dense
  * array (fastest axpy, allocation is noise); past [[GradientAccumulator.DenseDim]]
  * it starts as an open-addressed (index → sum) map and DENSIFIES
  * only when the accumulated nonzero count passes dim /
  * [[GradientAccumulator.DensifyDenom]] (or a dense data row forces
  * it). A task over sparse rows at dim = 10⁷ therefore holds
  * O(task-nnz) instead of an 80 MB dense buffer — and the wire stays
  * sparse end to end: serialization calls the codec's
  * `encodeSparse` (no dim-length materialization) and
  * deserialization reloads through `decodeSparse`, so every
  * tree-merge level is O(nnz) too. The sparse and dense paths
  * produce byte-identical codec frames for the same logical
  * gradient, so fitted weights match the dense path's up to
  * treeAggregate's task-arrival float merge order (`SgdSpec`).
  *
  * The gradient buffer is `@transient` and (de)serialized through
  * the configured [[GradientCodec]] — so when Spark ships partial
  * aggregates between executors / to the driver, the bytes on the
  * wire are the *compressed* gradient, exactly where the reference
  * compresses before its shuffle
  * (`/root/reference/.../SketchGradientDescent.scala:220-233`).
  * Each merge decodes → `plusBy` → next serialization re-encodes,
  * reproducing the Reduce path's re-compression of partial sums
  * (`SketchGradientDescent.scala:274`): lossy error compounds along
  * the aggregation tree, as in the reference.
  */
final class GradientAccumulator(val dim: Int, val codec: GradientCodec,
                                val loss: PointLoss = SquaredPointLoss)
    extends Serializable {

  @transient private var dense: Array[Double] =
    if (dim <= GradientAccumulator.DenseDim) new Array[Double](dim) else null
  // open-addressed linear-probe map; -1 = empty slot (keys are >= 0)
  @transient private var mapKeys: Array[Int] = _
  @transient private var mapVals: Array[Double] = _
  @transient private var mapUsed = 0

  var interceptGrad: Double = 0.0
  var count: Long = 0L
  var lossSum: Double = 0.0

  /** True while the buffer is still the sparse map (spec hook). */
  private[ml] def isSparse: Boolean = dense == null

  /** The gradient as a dense array (densifies a sparse buffer —
    * driver-side use after the aggregate, where the model weights
    * are dense anyway). */
  def grad: Array[Double] = { densify(); dense }

  private def ensureMap(): Unit =
    if (mapKeys == null) {
      mapKeys = Array.fill(GradientAccumulator.InitialMapCap)(-1)
      mapVals = new Array[Double](GradientAccumulator.InitialMapCap)
      mapUsed = 0
    }

  private def addAt(i: Int, v: Double): Unit =
    if (dense != null) dense(i) += v
    else {
      ensureMap()
      val mask = mapKeys.length - 1
      var s = scala.util.hashing.byteswap32(i) & mask
      while (mapKeys(s) != -1 && mapKeys(s) != i) s = (s + 1) & mask
      if (mapKeys(s) == i) mapVals(s) += v
      else {
        mapKeys(s) = i; mapVals(s) = v; mapUsed += 1
        if (mapUsed > dim / GradientAccumulator.DensifyDenom) densify()
        else if (mapUsed * 2 >= mapKeys.length) growMap()
      }
    }

  private def growMap(): Unit = {
    val ok = mapKeys; val ov = mapVals
    mapKeys = Array.fill(ok.length * 2)(-1)
    mapVals = new Array[Double](ok.length * 2)
    val mask = mapKeys.length - 1
    var j = 0
    while (j < ok.length) {
      val key = ok(j)
      if (key != -1) {
        var s = scala.util.hashing.byteswap32(key) & mask
        while (mapKeys(s) != -1) s = (s + 1) & mask
        mapKeys(s) = key; mapVals(s) = ov(j)
      }
      j += 1
    }
  }

  private def densify(): Unit =
    if (dense == null) {
      dense = new Array[Double](dim)
      if (mapKeys != null) {
        var j = 0
        while (j < mapKeys.length) {
          if (mapKeys(j) != -1) dense(mapKeys(j)) += mapVals(j)
          j += 1
        }
      }
      mapKeys = null; mapVals = null; mapUsed = 0
    }

  /** Add one data point's gradient at weights (w, b): margin →
    * pointwise (scale, loss) → axpy. For [[SquaredPointLoss]] this is
    * arithmetically identical to the fused residual form. */
  def add(w: Array[Double], b: Double,
          x: org.apache.spark.ml.linalg.Vector, y: Double): GradientAccumulator = {
    val z = LinearLoss.predict(w, b, x)
    val (g, l) = loss.scaleAndLoss(z, y)
    if (dense != null) LinearLoss.addScaled(x, g, dense)
    else x match {
      case s: org.apache.spark.ml.linalg.SparseVector =>
        var j = 0
        while (j < s.indices.length) {
          addAt(s.indices(j), g * s.values(j)); j += 1
        }
      case _ => // a dense row touches every index: the map buys nothing
        densify()
        LinearLoss.addScaled(x, g, dense)
    }
    interceptGrad += g
    lossSum += l
    count += 1
    this
  }

  /** Merge another partial (plusBy, `SketchGradientDescent.scala:244,262,267`).
    * Sparse ∪ sparse stays sparse (until the density bound); a dense
    * side densifies the merge. */
  def merge(other: GradientAccumulator): GradientAccumulator = {
    if (other.dense != null) {
      densify()
      val og = other.dense
      var i = 0
      while (i < dim) { dense(i) += og(i); i += 1 }
    } else if (other.mapKeys != null) {
      var j = 0
      while (j < other.mapKeys.length) {
        if (other.mapKeys(j) != -1) addAt(other.mapKeys(j), other.mapVals(j))
        j += 1
      }
    }
    interceptGrad += other.interceptGrad
    count += other.count
    lossSum += other.lossSum
    this
  }

  @throws[IOException]
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    val bytes =
      if (dense != null) codec.encode(dense)
      else if (mapKeys == null) codec.encodeSparse(dim, 0,
        Array.emptyIntArray, Array.emptyDoubleArray)
      else { // compact the live slots, then sparse-encode
        val ks = new Array[Int](mapUsed)
        val vs = new Array[Double](mapUsed)
        var j = 0; var w = 0
        while (j < mapKeys.length) {
          if (mapKeys(j) != -1) { ks(w) = mapKeys(j); vs(w) = mapVals(j); w += 1 }
          j += 1
        }
        codec.encodeSparse(dim, mapUsed, ks, vs)
      }
    out.writeInt(bytes.length)
    out.write(bytes)
  }

  @throws[IOException]
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    val n = in.readInt()
    val bytes = new Array[Byte](n)
    in.readFully(bytes)
    if (dim <= GradientAccumulator.DenseDim) dense = codec.decode(bytes)
    else {
      val sg = codec.decodeSparse(bytes)
      var j = 0
      while (j < sg.keys.length) { addAt(sg.keys(j), sg.vals(j)); j += 1 }
    }
  }
}

object GradientAccumulator {
  /** Dims at or below this always use the dense buffer (≤ 512 KB —
    * allocation and axpy both beat any map). */
  val DenseDim: Int = 1 << 16
  /** Densify once accumulated nonzeros exceed dim / this (map entry
    * ≈ 12 B vs 8 B/slot dense; past ~1/4 density the map loses). */
  val DensifyDenom: Int = 4
  private val InitialMapCap: Int = 1 << 10
}
