package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Dataset profiling — the per-column health report (null counts,
  * exact distinct cardinality, numeric ranges) every ingestion
  * pipeline runs before trusting a new drop of data.
  *
  * Scale shape: ALL columns profile in ONE scan — the multiple
  * count(distinct) aggregates compile to a single Expand (one row per
  * (input row, column) grouping set) feeding partial+final hash
  * aggregates, so the input is read once and only per-column partial
  * states shuffle. The wide 1-row result is then unpivoted to one row
  * per column with a codegen'd stack() — no second pass.
  */
object Profiling {

  /** One row per profiled column: row count, null count, exact
    * distinct count, min/max (numeric columns only — doubles ride a
    * DECIMAL(18,2) path so the report is hash-stable cross-engine;
    * non-numeric min/max are null). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val schema = df.schema
    def isNum(c: String) = schema(c).dataType.isInstanceOf[NumericType]
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__n_$c"),
        count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        (if (isNum(c)) min(col(c).cast("decimal(18,2)")).cast("double")
         else lit(null).cast("double")).as(s"__min_$c"),
        (if (isNum(c)) max(col(c).cast("decimal(18,2)")).cast("double")
         else lit(null).cast("double")).as(s"__max_$c"))
    }
    val stackArgs = cols.map { c =>
      s"'$c', __n_$c, `__n_$c` - `__nn_$c`, __nd_$c, __min_$c, __max_$c"
    }.mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${cols.size}, $stackArgs) AS " +
        "(col_name, n_rows, n_nulls, n_distinct, min_v, max_v)")
  }
}
