package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Point-in-time ("as-of") join: for each left row, attach the most
  * recent right row with `rightTime <= leftTime` for the same key —
  * the alignment primitive for feature backfills and training-data
  * point-in-time correctness (no future leakage).
  *
  * Spark has no native ASOF JOIN. The naive encoding
  * (`l.join(r, key && rt <= lt)` + argmax) materializes every
  * (left, right) pair whose times overlap — O(|L|·|R|) per key,
  * hopeless at 100 TB. This implementation uses the union + window
  * shape instead:
  *
  *   1. tag left (1) and right (0) rows, union them,
  *   2. one hash shuffle on the key + one sort by (time, tag),
  *   3. running `max(rightTime)` / `last(rightStruct, ignoreNulls)`
  *      over the growing window = the as-of match,
  *   4. keep only left-tagged rows.
  *
  * Cost: one shuffle of |L|+|R| rows and one sort — the same shape
  * as a sort-merge join, with no pair blow-up. Right rows at equal
  * time sort BEFORE left rows (tag 0 < 1), so `rightTime == leftTime`
  * matches (inclusive as-of, DuckDB ASOF JOIN semantics).
  */
object AsofJoin {

  /** Left as-of join. Returns all left columns plus `asof_time` (the
    * matched right time; null when no right row precedes — filter it
    * for inner-asof semantics) and each requested right value column
    * as `asof_<name>` (from the last matching right row; when right
    * rows tie on time the later one in the sort wins — include a
    * tiebreak in `rightTime`'s granularity if that matters). */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               rightValues: Seq[String] = Nil): DataFrame = {
    val lCols = left.columns.toSeq
    val rvType = StructType(rightValues.map(v => right.schema(v)))
    val rvNull = lit(null).cast(rvType)

    val l = left
      .withColumn("_k", col(leftKey))
      .withColumn("_t", col(leftTime).cast("timestamp"))
      .withColumn("_tag", lit(1))
      .withColumn("_rt", lit(null).cast("timestamp"))
      .withColumn("_rv", rvNull)
    // SQL join semantics: a null key or null time can never match —
    // drop such right rows up front (otherwise null-time rows sort
    // nulls-first and last(_rv, ignoreNulls) would leak their values
    // into rows whose asof_time is null)
    val r0 = right
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .withColumn("_k", col(rightKey))
      .withColumn("_t", col(rightTime).cast("timestamp"))
      .withColumn("_tag", lit(0))
      .withColumn("_rt", col(rightTime).cast("timestamp"))
      .withColumn("_rv",
        if (rightValues.isEmpty) rvNull else struct(rightValues.map(col): _*))
    // align to the left frame's shape: left data columns + the plumbing
    val r = r0.select(
      lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col("_k"), col("_t"), col("_tag"), col("_rt"), col("_rv")): _*)

    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = l.select(
        lCols.map(col) ++ Seq(col("_k"), col("_t"), col("_tag"), col("_rt"), col("_rv")): _*)
      .unionByName(r)
      // a null-key left row matches nothing (NULL = NULL is not true
      // in SQL, but partitionBy groups nulls together — mask it)
      .withColumn("asof_time",
        when(col("_k").isNotNull, max(col("_rt")).over(w)))
      .withColumn("_asof_rv",
        when(col("_k").isNotNull, last(col("_rv"), ignoreNulls = true).over(w)))
      .filter(col("_tag") === 1)

    joined.select(lCols.map(col) ++ (col("asof_time") +:
      rightValues.map(v => col(s"_asof_rv.$v").as(s"asof_$v"))): _*)
  }
}
