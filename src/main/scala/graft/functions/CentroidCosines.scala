package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Cosine similarity of one `array<double>` column against a fixed
  * centroid matrix, returning `array<double>` (one score per
  * centroid) in a single whole-stage-codegen pass.
  *
  * This replaces building `nlist` separate `dot(vec, lit(c_j))`
  * expressions: that shape inlines every centroid into the generated
  * code, blowing the 64 KB JVM method limit around nlist ≥ 256 and
  * falling out of codegen entirely. Here the matrix rides along as a
  * referenced object (`ctx.addReferenceObj`) and the generated code
  * is one constant-size nested loop, so nlist scales to thousands
  * without touching codegen limits.
  *
  * Null semantics: null input vector → null result; a zero-norm
  * vector or zero-norm centroid → null *element* (cosine undefined);
  * null vector elements are skipped, matching [[DotProduct]].
  */
case class CentroidCosines(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"centroid_cosines needs an array<double> arg, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)

  @transient private lazy val matrix: Array[Array[Double]] =
    centroids.map(_.toArray).toArray
  @transient private lazy val norms: Array[Double] =
    matrix.map(c => math.sqrt(c.map(x => x * x).sum))

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var vn = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) { val v = a.getDouble(i); vn += v * v }
      i += 1
    }
    vn = math.sqrt(vn)
    val out = new Array[Any](matrix.length)
    var j = 0
    while (j < matrix.length) {
      if (norms(j) != 0.0 && vn != 0.0) {
        val c = matrix(j)
        val m = math.min(n, c.length)
        var acc = 0.0
        var t = 0
        while (t < m) {
          if (!a.isNullAt(t)) acc += a.getDouble(t) * c(t)
          t += 1
        }
        out(j) = acc / (vn * norms(j))
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mat = ctx.addReferenceObj("centroidMatrix", matrix, "double[][]")
      val nrm = ctx.addReferenceObj("centroidNorms", norms, "double[]")
      val n = ctx.freshName("n")
      val vn = ctx.freshName("vn")
      val v = ctx.freshName("v")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val t = ctx.freshName("t")
      val m = ctx.freshName("m")
      val c = ctx.freshName("c")
      val acc = ctx.freshName("acc")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |double $vn = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) { double $v = $a.getDouble($i); $vn += $v * $v; }
         |}
         |$vn = java.lang.Math.sqrt($vn);
         |Object[] $out = new Object[${matrix.length}];
         |for (int $j = 0; $j < ${matrix.length}; $j++) {
         |  if ($nrm[$j] != 0.0 && $vn != 0.0) {
         |    double[] $c = $mat[$j];
         |    int $m = java.lang.Math.min($n, $c.length);
         |    double $acc = 0.0;
         |    for (int $t = 0; $t < $m; $t++) {
         |      if (!$a.isNullAt($t)) { $acc += $a.getDouble($t) * $c[$t]; }
         |    }
         |    $out[$j] = java.lang.Double.valueOf($acc / ($vn * $nrm[$j]));
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CentroidCosines =
    copy(child = newChild)

  override def prettyName: String = "centroid_cosines"
}

object CentroidCosines {
  /** Column-API entry point. */
  def of(vec: Column, centroids: Array[Array[Double]]): Column =
    Bridge.column(CentroidCosines(Bridge.expression(vec), centroids.map(_.toSeq).toSeq))

  /** Register `centroid_cosines(vec, matrix)` for SQL — `matrix` must
    * be a foldable `array<array<double>>` literal (e.g.
    * `array(array(1.0d, 0.0d), array(0.0d, 1.0d))`): the centroid
    * matrix is part of the plan, exactly like the Column API, so the
    * generated code keeps its constant-size loop shape. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Bridge.registerFunction(spark, "centroid_cosines", exprs => {
      require(exprs.length == 2,
        "centroid_cosines(vec, centroid_matrix) takes exactly 2 args")
      val m = exprs(1)
      require(m.foldable && m.dataType.isInstanceOf[ArrayType] &&
        m.dataType.asInstanceOf[ArrayType].elementType.isInstanceOf[ArrayType],
        "centroid matrix must be a foldable array<array<double>> literal")
      val inner = m.dataType.asInstanceOf[ArrayType]
        .elementType.asInstanceOf[ArrayType].elementType
      require(inner == DoubleType,
        s"centroid matrix elements must be double, got ${inner.sql}")
      val arr = m.eval().asInstanceOf[ArrayData]
      val matrix: Seq[Seq[Double]] = (0 until arr.numElements()).map { i =>
        val row = arr.getArray(i)
        (0 until row.numElements()).map(j => row.getDouble(j))
      }
      CentroidCosines(exprs.head, matrix)
    })
}
