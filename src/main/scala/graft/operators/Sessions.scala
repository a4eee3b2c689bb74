package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Per-user inter-event gap statistics (lead/lag analytic surface;
    * the diagnostic a gap-based sessionizer is tuned from): gap to
    * the previous event of the same user in microseconds, aggregated
    * per user. One hash partition by user_id serves both the lag
    * window and the final aggregate. A single-event user has no gaps
    * (max/avg are null — count(gap) disambiguates). */
  def interEventGaps(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    events.select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        count(col("gap_us")).as("n_gaps"),
        max(col("gap_us")).as("max_gap_us"),
        floor(avg(col("gap_us"))).as("avg_gap_us"))
  }

  /** Time-based rolling aggregates (RANGE frame, not ROWS): for each
    * event, the count and value-sum of the same user's events in the
    * trailing `windowMinutes` — the "requests in the last hour" /
    * rate-limiter / feature-engineering primitive. A RANGE frame
    * bounds by TIME OFFSET from the current row, so ties and bursts
    * are handled by value, not by row position. Same scale shape as
    * any per-user analytic: one hash exchange on user_id + one
    * in-partition sort, evaluated in a single forward pass with a
    * sliding lower bound. Value sums ride DECIMAL(18,2) so the
    * rolling totals are order-stable cross-engine. */
  /** Forward-fill imputation (the standard telemetry repair): rows
    * matching `missing` have their `valueCol` replaced by the most
    * recent valid value of the SAME user, in (ts, event_id) order;
    * leading missing rows (no prior valid value) stay null. Output
    * carries `was_filled` so downstream consumers can weigh imputed
    * points.
    *
    * Scale shape: one analytic window — a single hash exchange on
    * user_id + in-partition sort; `last(_, ignoreNulls)` over a
    * running ROWS frame is evaluated streaming (no per-row rescan of
    * the frame), so cost is O(events) after the one shuffle any
    * per-user ordering needs.
    *
    * `was_filled` is the `missing` predicate itself, NOT
    * `valid_v.isNull`: a non-missing row whose value column is
    * genuinely NULL keeps its NULL (it is carried into `valid_v`,
    * where `last(ignoreNulls)` skips it, so `filled_value` falls back
    * to the previous valid value) but is reported `was_filled=false`
    * — only rows the caller's predicate marked missing are flagged as
    * imputed.
    */
  def fillForward(events: DataFrame, missing: Column,
                  valueCol: String = "value"): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    events.select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"),
        when(missing, lit(null).cast("double")).otherwise(col(valueCol))
          .as("valid_v"),
        missing.as("was_filled"))
      .withColumn("filled_value", last(col("valid_v"), ignoreNulls = true).over(w))
      .select(col("event_id"), col("user_id"), col("us"),
        col("filled_value"), col("was_filled"))
  }

  /** Ordered conversion funnel: for each prefix of `stages`, how many
    * users performed those event types IN ORDER (each stage strictly
    * after the user's earliest completion of the previous one — the
    * standard first-touch funnel). Emits one row per stage:
    * (stage, event_type, n_users), n_users non-increasing.
    *
    * Scale shape: per stage, one filtered scan → hash aggregate keyed
    * user_id joined to the previous stage's (user_id, t) frontier —
    * every shuffle carries at most one row per user, never event-level
    * cross products; stage frontiers are the smallest state a funnel
    * fundamentally needs. Strict `>` on integer micros keeps the
    * frontier deterministic and engine-portable.
    */
  def funnel(events: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val ev = events.select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("us"))
    var frontier: DataFrame = null
    val perStage = stages.zipWithIndex.map { case (st, i) =>
      val cand = ev.filter(col("event_type") === st)
      frontier =
        if (frontier == null)
          cand.groupBy(col("user_id")).agg(min(col("us")).as("t"))
        else
          cand.join(frontier.withColumnRenamed("t", "prev_t"), Seq("user_id"))
            .filter(col("us") > col("prev_t"))
            .groupBy(col("user_id")).agg(min(col("us")).as("t"))
      frontier.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("stage"), lit(st).as("event_type"),
          col("n_users"))
    }
    perStage.reduce(_.unionAll(_))
  }

  def rollingCounts(events: DataFrame, windowMinutes: Int = 60): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-windowMinutes * 60L * 1000000L, Window.currentRow)
    events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("value"))
      .select(col("user_id"), col("event_id"), col("us"),
        count(lit(1)).over(w).as("n_trailing"),
        sum(col("value").cast("decimal(18,2)")).over(w)
          .cast("double").as("sum_trailing"))
  }

  /** Latest-state compaction (the CDC / upsert read path): collapse
    * each user's event history to its most recent event — max
    * (us, event_id) — plus lifetime counters. Implemented as a single
    * `max_by` aggregation, NOT a row_number window: the window form
    * shuffles every event and sorts it inside user partitions, while
    * max_by combines to ONE candidate struct per key per partition
    * BEFORE the exchange (partial+final SortAggregate — the struct
    * buffer isn't hash-mutable), so the shuffle carries compacted
    * rows, not the 100 TB event log. The
    * event_id tie-break makes the result deterministic even under
    * equal timestamps; the lifetime sum rides DECIMAL(18,2) so it is
    * accumulation-order-stable cross-engine. */
  def latestState(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("event_type"), col("value"))
      .groupBy(col("user_id"))
      .agg(
        max_by(
          struct(col("us"), col("event_id"), col("event_type"), col("value")),
          struct(col("us"), col("event_id"))).as("last"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("lifetime_value"))
      .select(col("user_id"), col("last.us").as("last_us"),
        col("last.event_id").as("last_event_id"),
        col("last.event_type").as("last_event_type"),
        round(col("last.value"), 6).as("last_value"),
        col("n_events"), col("lifetime_value"))

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
