package graft.sketch

/** A MinMax sketch: a CountMin-style table of `rows × cols` byte
  * cells keyed by hashed gradient indices, storing bin indices
  * instead of counts. Insert takes the MAX of the cell and the bin;
  * query takes the MIN over the rows — so a collision can only
  * return *some inserted* bin, and the min across rows limits the
  * overestimate. This reproduces the semantics of the external
  * SketchML library's `MinMaxSketch` as described in the SIGMOD'18
  * paper ("SketchML: Accelerating Distributed Machine Learning with
  * Data Sketches") and used by the reference at
  * `/root/reference/.../SketchGradientDescent.scala:340-348`.
  *
  * Cells are bytes: bin offsets within a quantizer group must be
  * < 256 (binNum / groupNum ≤ 256 enforced by the codec).
  */
final class MinMaxSketch(val rows: Int, val cols: Int) extends Serializable {
  val table: Array[Byte] = new Array[Byte](rows * cols)

  @inline private def cellOf(row: Int, key: Int): Int =
    row * cols + (MinMaxSketch.hash(key, row) % cols + cols) % cols

  def insert(key: Int, binOffset: Int): Unit = {
    var r = 0
    while (r < rows) {
      val c = cellOf(r, key)
      val b = binOffset.toByte
      // unsigned byte max
      if ((b & 0xff) > (table(c) & 0xff)) table(c) = b
      r += 1
    }
  }

  def query(key: Int): Int = {
    var best = 0xff
    var r = 0
    while (r < rows) {
      val v = table(cellOf(r, key)) & 0xff
      if (v < best) best = v
      r += 1
    }
    best
  }
}

object MinMaxSketch {
  val DefaultRowNum = 3

  /** Deterministic per-row key hash (splitmix64 finalizer). */
  @inline def hash(key: Int, row: Int): Int = {
    var z = key.toLong * 0x9e3779b97f4a7c15L + (row + 1) * 0xc2b2ae3d27d4eb4fL
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    (z ^ (z >>> 31)).toInt
  }
}
