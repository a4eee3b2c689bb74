package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time windowing over the `events` table. [[tumblingAgg]] is
  * written against a plain DataFrame so the SAME function serves the
  * batch query (DuckDB-oracled) and the Structured Streaming query
  * (`readStream` + `withWatermark`, tested in scalatest) — one code
  * path, two execution modes.
  */
object Sessions {

  /** Tumbling-window counts + value sums per event_type.
    * Works on batch and streaming inputs alike. */
  def tumblingAgg(events: DataFrame, width: String = "1 hour"): DataFrame =
    events.groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))

  /** Batch projection of [[tumblingAgg]] with an integer bucket key
    * (epoch seconds) for deterministic oracle comparison. */
  def tumblingCounts(events: DataFrame, width: String = "1 hour"): DataFrame =
    tumblingAgg(events, width)
      .select(unix_timestamp(col("window.start")).as("bucket"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Gap-based sessionization (batch): a new session starts when the
    * gap to the previous event of the same user exceeds `gapMinutes`.
    * lag → flag → running sum = session id; then per-session agg.
    * Shuffle: one hash partition by user_id reused by both windows. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val flagged = events
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("new_s",
        when(col("us") - lag(col("us"), 1).over(w) > gapUs, 1L)
          .when(lag(col("us"), 1).over(w).isNull, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("new_s")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("us")) - min(col("us"))).as("dur_us"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
  }
}
