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
  * per column with a codegen'd explode-of-structs — no second pass.
  */
object Profiling {

  /** One row per profiled column: row count, null count, exact
    * distinct count, min/max (numeric columns only — doubles ride a
    * DECIMAL(18,2) path so the report is hash-stable cross-engine;
    * non-numeric min/max are null).
    *
    * Column names are data here, not trusted identifiers: input
    * references are backquote-escaped (a name containing dots,
    * backticks, quotes, or commas resolves literally instead of
    * breaking parsing or being read as a nested-field path), the
    * report label is a `lit`, and the intermediate aggregate aliases
    * are positional so no generated identifier ever embeds a
    * user-supplied name. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val schema = df.schema
    def isNum(c: String) = schema(c).dataType.isInstanceOf[NumericType]
    def bq(c: String) = "`" + c.replace("`", "``") + "`"
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        count(lit(1)).as(s"__n_$i"),
        count(col(bq(c))).as(s"__nn_$i"),
        countDistinct(col(bq(c))).as(s"__nd_$i"),
        (if (isNum(c)) min(col(bq(c)).cast("decimal(18,2)")).cast("double")
         else lit(null).cast("double")).as(s"__min_$i"),
        (if (isNum(c)) max(col(bq(c)).cast("decimal(18,2)")).cast("double")
         else lit(null).cast("double")).as(s"__max_$i"))
    }
    val reportRows = cols.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c).as("col_name"),
        col(s"__n_$i").as("n_rows"),
        (col(s"__n_$i") - col(s"__nn_$i")).as("n_nulls"),
        col(s"__nd_$i").as("n_distinct"),
        col(s"__min_$i").as("min_v"),
        col(s"__max_$i").as("max_v"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(reportRows: _*)).as("p"))
      .select(col("p.col_name"), col("p.n_rows"), col("p.n_nulls"),
        col("p.n_distinct"), col("p.min_v"), col("p.max_v"))
  }
}
