package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

import graft.sketch.{GradientCodec, SketchCodec}

/** SQL-level sketch-compressed gradient summation: a
  * `TypedImperativeAggregate` over `array<double>` gradient rows
  * whose partial buffers serialize through a [[GradientCodec]] —
  * so the partial→final Exchange ships SketchML-compressed bytes,
  * which is exactly where the reference compresses before its
  * shuffle (`/root/reference/.../SketchGradientDescent.scala:220-274`,
  * re-compressing partial sums along the combine tree). Exposes the
  * §2.4 semantics inside Catalyst:
  *
  *   SELECT gradient_sketch_sum(grad) FROM gradients
  *
  * With `compression = "None"` it degrades to a lossless array sum
  * (the FlinkGradientDescent baseline path).
  */
case class SketchGradientSum(
    child: Expression,
    compression: String = "Sketch",
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  @transient private lazy val codec: GradientCodec = SketchCodec.forName(compression)

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gradient_sketch_sum needs array<double>, got ${t.sql}")
  }

  override def createAggregationBuffer(): Array[Double] = Array.empty[Double]

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val buf = if (buffer.length >= n) buffer
    else java.util.Arrays.copyOf(buffer, n)
    var i = 0
    while (i < n) { if (!arr.isNullAt(i)) buf(i) += arr.getDouble(i); i += 1 }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    val (big, small) = if (a.length >= b.length) (a, b) else (b, a)
    var i = 0
    while (i < small.length) { big(i) += small(i); i += 1 }
    big
  }

  override def eval(buffer: Array[Double]): Any =
    if (buffer.isEmpty) null else new GenericArrayData(buffer)

  /** Partial-buffer wire format = the gradient codec — compressed
    * bytes cross the Exchange, decoded on merge. */
  override def serialize(buffer: Array[Double]): Array[Byte] = codec.encode(buffer)
  override def deserialize(bytes: Array[Byte]): Array[Double] = codec.decode(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): SketchGradientSum =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): SketchGradientSum =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SketchGradientSum =
    copy(child = newChildren.head)

  override def prettyName: String = "gradient_sketch_sum"
}

object SketchGradientSum {
  /** Column-API aggregate: sketch-compressed partial sums. */
  def gradientSketchSum(grad: Column, compression: String = "Sketch"): Column =
    Bridge.column(SketchGradientSum(Bridge.expression(grad), compression)
      .toAggregateExpression())

  /** Register `gradient_sketch_sum(arr[, codec])` for SQL. The
    * builder returns the raw AggregateFunction — the analyzer wraps
    * it. The optional second arg is a foldable codec-name literal
    * ('Sketch' default, 'None' for the lossless baseline path),
    * mirroring the Column API's `compression` parameter. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Bridge.registerFunction(spark, "gradient_sketch_sum", exprs => {
      require(exprs.nonEmpty && exprs.length <= 2,
        "gradient_sketch_sum(arr[, codec]) takes 1 or 2 args")
      val comp = if (exprs.length == 2) {
        require(exprs(1).foldable, "codec name must be a literal")
        exprs(1).eval().toString
      } else "Sketch"
      SketchGradientSum(exprs.head, comp)
    })
}
