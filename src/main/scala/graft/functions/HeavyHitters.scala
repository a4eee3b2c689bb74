package graft.functions

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries / SpaceSaving heavy-hitters sketch as a Catalyst
  * `TypedImperativeAggregate`: approximate top-k frequent items over
  * a string column in ONE pass with a capacity-k counter summary —
  * the bounded-memory twin of `q_top_terms`'s exact (term, count)
  * aggregation, exactly as `q_sketch_quantiles` is the bounded twin
  * of exact percentiles. At 100 TB the exact term histogram is
  * vocab-sized (fine) but a per-GROUP exact histogram is not; this
  * aggregate keeps every partial buffer ≤ 2k counters, so the
  * partial→final Exchange ships constant-size summaries — the same
  * communication-compression idea as the reference's gradient
  * sketches (`/root/reference/.../SketchGradientDescent.scala:220-281`).
  *
  * Guarantees (mergeable-summaries form, Agarwal et al.): counters
  * under-count only — `est ≤ true ≤ est + err_bound` — and every item
  * with true frequency > err_bound survives; err_bound ≤ n/(k+1)
  * because each compaction subtracts the (k+1)-th largest counter,
  * which charges ≥ k+1 occurrences per unit of error. Buffers merge
  * by pointwise counter addition (error bounds add), so the
  * aggregate is a commutative monoid and Spark's partial+final
  * HashAggregate applies map-side combine as usual.
  *
  * When the true vocabulary is ≤ k, no compaction ever fires and the
  * summary is EXACT with err_bound 0 (deterministic — what
  * `q_sketch_heavy`'s oracle relies on); the lossy path is covered in
  * scalatest with planted skew.
  */
case class HeavyHitters(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HeavyHitters.Buffer] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = HeavyHitters.OutType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k > 0 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"heavy_hitters capacity must be positive, got $k")
    case t => TypeCheckResult.TypeCheckFailure(
      s"heavy_hitters needs a string column, got ${t.sql}")
  }

  override def createAggregationBuffer(): HeavyHitters.Buffer =
    new HeavyHitters.Buffer(0L, new java.util.HashMap[String, Long]())

  override def update(buffer: HeavyHitters.Buffer,
                      input: InternalRow): HeavyHitters.Buffer = {
    val v = child.eval(input)
    if (v == null) return buffer
    buffer.counts.merge(v.asInstanceOf[UTF8String].toString, 1L, _ + _)
    // amortized O(1): let the map grow to 2k, then one O(2k log 2k)
    // compaction halves it — never the textbook decrement-all-per-row
    if (buffer.counts.size > 2 * k) HeavyHitters.compact(buffer, k)
    buffer
  }

  override def merge(a: HeavyHitters.Buffer,
                     b: HeavyHitters.Buffer): HeavyHitters.Buffer = {
    val (big, small) =
      if (a.counts.size >= b.counts.size) (a, b) else (b, a)
    small.counts.forEach((t, c) => big.counts.merge(t, c, _ + _))
    big.err += small.err
    if (big.counts.size > 2 * k) HeavyHitters.compact(big, k)
    big
  }

  override def eval(buffer: HeavyHitters.Buffer): Any = {
    if (buffer.counts.size > k) HeavyHitters.compact(buffer, k)
    val rows = buffer.counts.entrySet().asScala.toArray
      .sortBy(e => (-e.getValue, e.getKey))
      .map { e =>
        new GenericInternalRow(Array[Any](
          UTF8String.fromString(e.getKey), e.getValue, buffer.err))
      }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: HeavyHitters.Buffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeLong(buffer.err)
    out.writeInt(buffer.counts.size)
    buffer.counts.forEach { (t, c) =>
      val bytes = t.getBytes("UTF-8")
      out.writeInt(bytes.length); out.write(bytes); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): HeavyHitters.Buffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val err = in.readLong()
    val n = in.readInt()
    val m = new java.util.HashMap[String, Long](n * 2)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      m.put(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    new HeavyHitters.Buffer(err, m)
  }

  override def withNewMutableAggBufferOffset(offset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HeavyHitters =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHitters =
    copy(child = newChildren.head)

  override def prettyName: String = "heavy_hitters"
}

object HeavyHitters {

  /** Counter summary: term → lower-bound count, plus the cumulative
    * per-counter subtraction `err` (every surviving counter's true
    * count is within [est, est + err]). */
  final class Buffer(var err: Long, val counts: java.util.HashMap[String, Long])

  val OutType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("err_bound", LongType, nullable = false))), containsNull = false)

  /** Subtract the (k+1)-th largest counter from every counter and
    * drop the non-positive — the mergeable-summaries reduction back
    * to ≤ k entries. Each unit of `err` is charged to ≥ k+1 distinct
    * occurrence groups, giving the n/(k+1) total bound. */
  private[functions] def compact(buffer: Buffer, k: Int): Unit = {
    val values = buffer.counts.values().asScala.toArray.sorted(Ordering[Long].reverse)
    if (values.length <= k) return
    val t = values(k)
    buffer.err += t
    val it = buffer.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nv = e.getValue - t
      if (nv <= 0) it.remove() else e.setValue(nv)
    }
  }

  /** Column-API aggregate: `heavyHitters(col, k)` → sorted
    * array<struct<term, est, err_bound>>. */
  def heavyHitters(term: Column, k: Int): Column =
    Bridge.column(HeavyHitters(Bridge.expression(term), k)
      .toAggregateExpression())

  /** Register `heavy_hitters(term, k)` for SQL text (k a foldable
    * integer literal), alongside the other engine functions in
    * [[GraftFunctions.registerAll]]. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Bridge.registerFunction(spark, "heavy_hitters", exprs => {
      require(exprs.length == 2, "heavy_hitters(term, k) takes 2 args")
      require(exprs(1).foldable, "heavy_hitters capacity must be a literal")
      HeavyHitters(exprs.head, exprs(1).eval().asInstanceOf[Number].intValue())
    })
}
