package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust per-group outlier detection — the median/MAD rule
  * (|x − median| > k·MAD) every data-quality gate runs on numeric
  * telemetry before training on it. Median and MAD resist the very
  * outliers they hunt, unlike mean/stddev which a single 1e9 glitch
  * drags arbitrarily.
  *
  * Scale shape: three grouped aggregates over the input (median pass,
  * MAD pass, count pass) — each is a hash partial+final on the group
  * key, and the tiny per-group statistics come BACK as broadcast
  * joins, so the big side never shuffles. The deliberate alternative,
  * one `percentile(...) OVER (PARTITION BY group)` window, would
  * shuffle the full input AND pin each group on a single task — a
  * skew bomb when one group holds half of 100 TB. Exact percentile
  * keeps a value-count map per (group, partition); for unbounded
  * value domains at extreme scale, swap in `approx_percentile` (the
  * KLL path `q_sketch_quantiles` certifies) — same dataflow shape.
  */
object Outliers {

  /** One row per group: row count and how many values fall more than
    * `k` MADs below/above the group median. Counts only — integer,
    * hash-stable cross-engine; the doubles they derive from are
    * bit-identical in any engine computing the same interpolated
    * median (proven by `q_percentiles`).
    */
  def robustOutliers(df: DataFrame, valueCol: String, groupCol: String,
                     k: Double = 3.0): DataFrame = {
    val v = col(valueCol)
    val med = df.groupBy(col(groupCol))
      .agg(percentile(v, lit(0.5)).as("med"))
    val dev = df.join(broadcast(med), Seq(groupCol))
      .withColumn("adev", abs(v - col("med")))
    val mad = dev.groupBy(col(groupCol))
      .agg(percentile(col("adev"), lit(0.5)).as("mad"))
    dev.join(broadcast(mad), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("med") - v > col("mad") * k, 1L).otherwise(0L))
          .as("n_low"),
        sum(when(v - col("med") > col("mad") * k, 1L).otherwise(0L))
          .as("n_high"))
      .withColumn("n_outliers", col("n_low") + col("n_high"))
      .select(col(groupCol), col("n"), col("n_outliers"), col("n_low"),
        col("n_high"))
  }
}
