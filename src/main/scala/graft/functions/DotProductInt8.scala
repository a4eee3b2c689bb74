package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, LongType}

/** Native Catalyst dot product over two `array<tinyint>` columns
  * (int8-quantized embeddings, [[graft.operators.Similarity
  * .quantizedCorpus]]) with whole-stage codegen, accumulating in
  * exact integer arithmetic — the bulk-scan primitive for quantized
  * pair scoring. A 64-dim int8 dot is ≤ 64·127² ≈ 2²⁰, so a long
  * accumulator is exact with huge margin; the caller divides by the
  * int8 norms to get the (scale-invariant) approximate cosine.
  *
  * Null semantics mirror [[DotProduct]]: null if either side is
  * null; null elements are skipped; lengths may differ (fold over
  * the shorter prefix).
  */
case class DotProductInt8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(ByteType, _), ArrayType(ByteType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"dot_product_int8 needs two array<tinyint> args, got ${l.sql} and ${r.sql}")
  }
  override def dataType: DataType = LongType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) acc += a.getByte(i).toLong * b.getByte(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += ((long) $a.getByte($i)) * $b.getByte($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductInt8 =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product_int8"
}

object DotProductInt8 {
  /** Column-API entry point. */
  def dot(x: Column, y: Column): Column =
    Bridge.column(DotProductInt8(Bridge.expression(x), Bridge.expression(y)))

  /** Register `dot_product_int8(a, b)` for SQL use on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Bridge.registerFunction(spark, "dot_product_int8",
      exprs => DotProductInt8(exprs(0), exprs(1)))
}
