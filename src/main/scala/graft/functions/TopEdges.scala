package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** EXACT bounded top-k edge selection as a Catalyst
  * `TypedImperativeAggregate`: per group (the edge source), keep the
  * k best (score desc, dst asc) destinations seen so far — the
  * k-NN-graph build's "top-g per src" primitive.
  *
  * Why an aggregate and not a row_number window: the graph build
  * scores Σ|cell|² + n·(2g)² candidate pairs, and a window must
  * SHUFFLE AND SORT every one of those pair rows per src before it
  * can cut to g. This aggregate is a commutative monoid over bounded
  * buffers (≤2k entries), so Spark's partial+final ObjectHashAggregate
  * applies MAP-SIDE COMBINE: each task collapses its pairs to ≤k per
  * local src before anything ships — the Exchange carries O(srcs·k)
  * edges instead of O(pairs) rows, and nothing ever sorts the bulk.
  * Exactness: streaming top-k only ever needs the k best seen so far,
  * so compaction (sort, dedupe, truncate to k) discards only rows
  * that can never re-enter the result.
  *
  * Duplicate candidates (the same (src, dst) scored through two
  * shared cells, or a NoN candidate that already is an edge) carry
  * IDENTICAL scores by construction — the buffer dedupes on dst at
  * compaction, which also removes the dropDuplicates("src","dst")
  * pre-shuffle the window shape needed. */
case class TopEdges(
    dst: Expression,
    score: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopEdges.Buffer] {

  override def children: Seq[Expression] = dst :: score :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = TopEdges.OutType

  override def checkInputDataTypes(): TypeCheckResult =
    (dst.dataType, score.dataType) match {
      case (LongType, DoubleType) if k > 0 => TypeCheckResult.TypeCheckSuccess
      case (LongType, DoubleType) => TypeCheckResult.TypeCheckFailure(
        s"top_edges k must be positive, got $k")
      case (d, s) => TypeCheckResult.TypeCheckFailure(
        s"top_edges needs (bigint, double), got ${d.sql}, ${s.sql}")
    }

  override def createAggregationBuffer(): TopEdges.Buffer =
    new TopEdges.Buffer(0, new Array[Long](2 * k + 1), new Array[Double](2 * k + 1))

  override def update(buffer: TopEdges.Buffer,
                      input: InternalRow): TopEdges.Buffer = {
    val d = dst.eval(input)
    val s = score.eval(input)
    if (d == null || s == null) return buffer
    buffer.add(d.asInstanceOf[Long], s.asInstanceOf[Double], k)
    buffer
  }

  override def merge(a: TopEdges.Buffer, b: TopEdges.Buffer): TopEdges.Buffer = {
    var i = 0
    while (i < b.n) { a.add(b.dsts(i), b.scores(i), k); i += 1 }
    a
  }

  override def eval(buffer: TopEdges.Buffer): Any = {
    buffer.compact(k)
    val rows = new Array[Any](buffer.n)
    var i = 0
    while (i < buffer.n) {
      rows(i) = new GenericInternalRow(Array[Any](buffer.dsts(i), buffer.scores(i)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buffer: TopEdges.Buffer): Array[Byte] = {
    buffer.compact(k) // ship ≤k entries
    val out = java.nio.ByteBuffer.allocate(4 + buffer.n * 16)
    out.putInt(buffer.n)
    var i = 0
    while (i < buffer.n) {
      out.putLong(buffer.dsts(i)); out.putDouble(buffer.scores(i)); i += 1
    }
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): TopEdges.Buffer = {
    val in = java.nio.ByteBuffer.wrap(bytes)
    val n = in.getInt()
    val buf = new TopEdges.Buffer(n,
      new Array[Long](math.max(n, 2 * k + 1)),
      new Array[Double](math.max(n, 2 * k + 1)))
    var i = 0
    while (i < n) { buf.dsts(i) = in.getLong(); buf.scores(i) = in.getDouble(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopEdges =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopEdges =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopEdges =
    copy(dst = newChildren(0), score = newChildren(1))

  override def prettyName: String = "top_edges"
}

object TopEdges {

  val OutType: DataType = ArrayType(StructType(Seq(
    StructField("dst", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)

  /** Parallel-array buffer; grows to 2k then compacts to k (amortized
    * O(1) per row, the HeavyHitters growth discipline). Entries are
    * kept UNSORTED between compactions; compaction sorts by
    * (score desc, dst asc) and dedupes on dst. */
  final class Buffer(var n: Int, var dsts: Array[Long], var scores: Array[Double]) {

    def add(d: Long, s: Double, k: Int): Unit = {
      if (n == dsts.length) compact(k)
      dsts(n) = d; scores(n) = s; n += 1
    }

    def compact(k: Int): Unit = {
      if (n <= k && n > 0) { sortPrefix(); dedupe(k); return }
      if (n == 0) return
      sortPrefix()
      dedupe(k)
    }

    private def sortPrefix(): Unit = {
      // small-n insertion sort by (score desc, dst asc) — n ≤ 2k+1
      var i = 1
      while (i < n) {
        val d = dsts(i); val s = scores(i)
        var j = i - 1
        while (j >= 0 && (scores(j) < s || (scores(j) == s && dsts(j) > d))) {
          dsts(j + 1) = dsts(j); scores(j + 1) = scores(j); j -= 1
        }
        dsts(j + 1) = d; scores(j + 1) = s
        i += 1
      }
    }

    private def dedupe(k: Int): Unit = {
      val seen = new java.util.HashSet[Long](n * 2)
      var w = 0
      var i = 0
      while (i < n && w < k) {
        if (seen.add(dsts(i))) {
          dsts(w) = dsts(i); scores(w) = scores(i); w += 1
        }
        i += 1
      }
      n = w
    }
  }

  /** Column-API aggregate: top-k (score desc, dst asc) distinct-dst
    * edges → sorted array<struct<dst, score>>. */
  def topEdges(dst: Column, score: Column, k: Int): Column =
    Bridge.column(TopEdges(Bridge.expression(dst), Bridge.expression(score), k)
      .toAggregateExpression())
}
