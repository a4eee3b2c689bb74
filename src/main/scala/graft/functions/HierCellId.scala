package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Two-level (coarse → fine) argmax-cosine cell id in ONE
  * whole-stage-codegen pass — the sub-linear replacement for scoring
  * a vector against every one of `nlist` flat centroids when `nlist`
  * is corpus-scaled ([[CentroidCosines]] + `array_position` is
  * O(nlist) per row; with nlist ∝ n that turns cell assignment into
  * the O(n²) stage a 100 TB corpus cannot pay). Here each row scores
  * the `k1 ≈ √nlist` coarse centroids, then ONLY the fine block of
  * its argmax coarse cell (`≈ nlist/k1` centroids) — O(√nlist) per
  * row, so assignment stays linear in the corpus as nlist grows
  * with it.
  *
  * The global cell id is `offsets(c) + j` (both the coarse argmax
  * `c` and the within-block argmax `j` 0-based; result 1-based like
  * `assignCells`), where `offsets` is the running sum of block
  * sizes — blocks may be ragged (a coarse cell whose fit sample was
  * smaller than the fine k keeps fewer fine centroids). Cell ids
  * from different (coarse, fine) hierarchies are incomparable, as
  * with any two different centroid fits.
  *
  * Null semantics match the flat [[CentroidCosines]]+argmax path:
  * null input → null; a zero-norm vector (cosine undefined
  * everywhere) → null cell id; ties take the FIRST index, like
  * `array_position(cs, array_max(cs))`.
  */
case class HierCellId(child: Expression, coarse: Seq[Seq[Double]],
                      fine: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  require(coarse.nonEmpty && coarse.length == fine.length &&
    fine.forall(_.nonEmpty),
    "hier_cell_id needs one non-empty fine block per coarse centroid")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hier_cell_id needs an array<double> arg, got ${t.sql}")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  @transient private lazy val coarseMat: Array[Array[Double]] =
    coarse.map(_.toArray).toArray
  @transient private lazy val coarseNorms: Array[Double] =
    coarseMat.map(c => math.sqrt(c.map(x => x * x).sum))
  @transient private lazy val fineMat: Array[Array[Array[Double]]] =
    fine.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val fineNorms: Array[Array[Double]] =
    fineMat.map(_.map(c => math.sqrt(c.map(x => x * x).sum)))
  /** offsets(c) = 1 + Σ_{b<c} |block b| — the 1-based global id of
    * block c's first fine centroid. */
  @transient private lazy val offsets: Array[Int] =
    fineMat.scanLeft(1)(_ + _.length).init

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var vn = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) { val x = a.getDouble(i); vn += x * x }
      i += 1
    }
    if (vn == 0.0) return null
    var best = -1; var bestS = Double.NegativeInfinity
    var j = 0
    while (j < coarseMat.length) {
      if (coarseNorms(j) != 0.0) {
        val c = coarseMat(j)
        val m = math.min(n, c.length)
        var acc = 0.0; var t = 0
        while (t < m) {
          if (!a.isNullAt(t)) acc += a.getDouble(t) * c(t)
          t += 1
        }
        val s = acc / coarseNorms(j)
        if (s > bestS) { bestS = s; best = j }
      }
      j += 1
    }
    if (best < 0) return null
    val blk = fineMat(best); val bn = fineNorms(best)
    var fbest = -1; var fbestS = Double.NegativeInfinity
    j = 0
    while (j < blk.length) {
      if (bn(j) != 0.0) {
        val c = blk(j)
        val m = math.min(n, c.length)
        var acc = 0.0; var t = 0
        while (t < m) {
          if (!a.isNullAt(t)) acc += a.getDouble(t) * c(t)
          t += 1
        }
        val s = acc / bn(j)
        if (s > fbestS) { fbestS = s; fbest = j }
      }
      j += 1
    }
    if (fbest < 0) null else offsets(best) + fbest
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cm = ctx.addReferenceObj("hierCoarse", coarseMat, "double[][]")
      val cn = ctx.addReferenceObj("hierCoarseNorms", coarseNorms, "double[]")
      val fm = ctx.addReferenceObj("hierFine", fineMat, "double[][][]")
      val fn = ctx.addReferenceObj("hierFineNorms", fineNorms, "double[][]")
      val off = ctx.addReferenceObj("hierOffsets", offsets, "int[]")
      val n = ctx.freshName("n"); val vn = ctx.freshName("vn")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val t = ctx.freshName("t"); val m = ctx.freshName("m")
      val c = ctx.freshName("c"); val acc = ctx.freshName("acc")
      val s = ctx.freshName("s")
      val best = ctx.freshName("best"); val bestS = ctx.freshName("bestS")
      val blk = ctx.freshName("blk"); val bn = ctx.freshName("bn")
      val fbest = ctx.freshName("fbest"); val fbestS = ctx.freshName("fbestS")
      s"""
         |int $n = $a.numElements();
         |double $vn = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) { double $s = $a.getDouble($i); $vn += $s * $s; }
         |}
         |int $best = -1; double $bestS = Double.NEGATIVE_INFINITY;
         |if ($vn != 0.0) {
         |  for (int $j = 0; $j < ${coarseMat.length}; $j++) {
         |    if ($cn[$j] != 0.0) {
         |      double[] $c = $cm[$j];
         |      int $m = java.lang.Math.min($n, $c.length);
         |      double $acc = 0.0;
         |      for (int $t = 0; $t < $m; $t++) {
         |        if (!$a.isNullAt($t)) { $acc += $a.getDouble($t) * $c[$t]; }
         |      }
         |      double $s = $acc / $cn[$j];
         |      if ($s > $bestS) { $bestS = $s; $best = $j; }
         |    }
         |  }
         |}
         |if ($best < 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[][] $blk = $fm[$best];
         |  double[] $bn = $fn[$best];
         |  int $fbest = -1; double $fbestS = Double.NEGATIVE_INFINITY;
         |  for (int $j = 0; $j < $blk.length; $j++) {
         |    if ($bn[$j] != 0.0) {
         |      double[] $c = $blk[$j];
         |      int $m = java.lang.Math.min($n, $c.length);
         |      double $acc = 0.0;
         |      for (int $t = 0; $t < $m; $t++) {
         |        if (!$a.isNullAt($t)) { $acc += $a.getDouble($t) * $c[$t]; }
         |      }
         |      double $s = $acc / $bn[$j];
         |      if ($s > $fbestS) { $fbestS = $s; $fbest = $j; }
         |    }
         |  }
         |  if ($fbest < 0) { ${ev.isNull} = true; }
         |  else { ${ev.value} = $off[$best] + $fbest; }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HierCellId =
    copy(child = newChild)

  override def prettyName: String = "hier_cell_id"
}

object HierCellId {
  /** Column-API entry point: `fine(i)` is the fine block of
    * `coarse(i)`; returns the 1-based global fine cell id. */
  def of(vec: Column, coarse: Array[Array[Double]],
         fine: Array[Array[Array[Double]]]): Column =
    Bridge.column(HierCellId(Bridge.expression(vec),
      coarse.map(_.toSeq).toSeq, fine.map(_.map(_.toSeq).toSeq).toSeq))
}
