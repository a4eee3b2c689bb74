package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** 1-based indices of the k largest elements of an `array<double>`,
  * ordered (value desc, index asc), as one whole-stage-codegen pass —
  * the "top-k cells of a centroid-score array" primitive
  * ([[graft.operators.Similarity.assignTopCells]]).
  *
  * This replaces a `DataFrame.rdd` round-trip that deserialized every
  * score array into boxed `Seq[Any]` rows (n·nlist boxed doubles — a
  * measured ~⅓ of the sf10 graph build) with a bounded insertion scan
  * over primitive `ArrayData` slots: k registers, no sort, no
  * allocation beyond the k-element result.
  *
  * Null semantics: null array → null; null ELEMENTS are skipped (a
  * zero-norm cosine is null upstream — [[CentroidCosines]]), so an
  * all-null array yields an EMPTY result array, which `posexplode`
  * then drops entirely — the zero-norm row vanishes exactly as the
  * old Row-typed path dropped it. */
case class ArgTopK(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckFailure(
      s"arg_top_k k must be positive, got $k")
    case t => TypeCheckResult.TypeCheckFailure(
      s"arg_top_k needs an array<double> arg, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val idx = new Array[Int](k)
    val score = new Array[Double](k)
    var filled = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val s = a.getDouble(i)
        var pos = filled
        while (pos > 0 && score(pos - 1) < s) pos -= 1
        if (pos < k) {
          var j = math.min(filled, k - 1)
          while (j > pos) { idx(j) = idx(j - 1); score(j) = score(j - 1); j -= 1 }
          idx(pos) = i + 1; score(pos) = s
          if (filled < k) filled += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](filled)
    var r = 0
    while (r < filled) { out(r) = idx(r); r += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val idx = ctx.freshName("idx")
      val score = ctx.freshName("score")
      val filled = ctx.freshName("filled")
      val s = ctx.freshName("s")
      val pos = ctx.freshName("pos")
      val j = ctx.freshName("j")
      val out = ctx.freshName("out")
      val r = ctx.freshName("r")
      s"""
         |int $n = $a.numElements();
         |int[] $idx = new int[$k];
         |double[] $score = new double[$k];
         |int $filled = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    double $s = $a.getDouble($i);
         |    int $pos = $filled;
         |    while ($pos > 0 && $score[$pos - 1] < $s) $pos--;
         |    if ($pos < $k) {
         |      for (int $j = java.lang.Math.min($filled, $k - 1); $j > $pos; $j--) {
         |        $idx[$j] = $idx[$j - 1]; $score[$j] = $score[$j - 1];
         |      }
         |      $idx[$pos] = $i + 1; $score[$pos] = $s;
         |      if ($filled < $k) $filled++;
         |    }
         |  }
         |}
         |Object[] $out = new Object[$filled];
         |for (int $r = 0; $r < $filled; $r++) $out[$r] = $idx[$r];
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ArgTopK =
    copy(child = newChild)

  override def prettyName: String = "arg_top_k"
}

object ArgTopK {
  /** Column-API entry point. */
  def of(scores: Column, k: Int): Column =
    Bridge.column(ArgTopK(Bridge.expression(scores), k))
}
