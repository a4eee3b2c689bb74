package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.Sessions

/** Structured Streaming entry points. The reference is pure batch
  * (SURVEY.md §2.1: "no watermarks/streaming state"), so this is
  * north-star extension surface: the SAME `Sessions.tumblingAgg`
  * transformation runs over `readStream` sources with a watermark —
  * batch/streaming parity is asserted in scalatest
  * (EventStreamsSpec) since DuckDB can't oracle late-data semantics
  * (SURVEY §7 risk 6).
  */
object EventStreams {

  /** Watermarked tumbling-window aggregation over a streaming frame
    * (e.g. MemoryStream of events, or readStream.parquet). */
  def tumblingAggStream(stream: DataFrame, watermark: String = "10 minutes",
                        width: String = "1 hour"): DataFrame =
    Sessions.tumblingAgg(stream.withWatermark("ts", watermark), width)

  /** Streaming exact-dedup: keep the first occurrence per
    * fingerprint; the watermark bounds the dedup state horizon (the
    * streaming twin of `Dedup.exact` — state is hash-partitioned by
    * fingerprint, so it scales like the batch groupBy). */
  def dedupStream(stream: DataFrame, fp: org.apache.spark.sql.Column,
                  tsCol: String = "ts", watermark: String = "1 hour"): DataFrame =
    stream.withColumn("fp", fp)
      .withWatermark(tsCol, watermark)
      .dropDuplicates("fp")

  /** Stream-stream interval join: right rows within
    * [left.ts, left.ts + `withinSeconds`] for the same key — e.g.
    * clicks attributed to the impression they followed. Watermarks on
    * BOTH sides bound the join state Spark must buffer (it evicts a
    * side's rows once the other side's watermark passes the interval
    * end) — this is what keeps a stream-stream join runnable forever
    * at scale instead of growing state without bound.
    *
    * The right side's key column (`rightKey`, default same name as
    * `key`) is renamed to `r_<key>` in the output so both sides'
    * keys survive unambiguously; `leftTs`/`rightTs` must be distinct
    * names (rename one side before calling if they clash). */
  def intervalJoinStream(left: DataFrame, right: DataFrame,
                         key: String, leftTs: String, rightTs: String,
                         withinSeconds: Long,
                         watermark: String = "10 minutes",
                         rightKey: String = null): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    val rk = Option(rightKey).getOrElse(key)
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withColumnRenamed(rk, s"r_$key")
      .withWatermark(rightTs, watermark)
    l.join(r,
      col(key) === col(s"r_$key") &&
        col(rightTs) >= col(leftTs) &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $withinSeconds SECONDS"))
  }

  /** Streaming heavy hitters: the Misra-Gries summary as an
    * incremental streaming aggregate — the streaming twin of
    * `q_sketch_heavy`. Because the sketch is a mergeable commutative
    * monoid ([[graft.functions.HeavyHitters]]), Structured Streaming
    * folds each micro-batch's partial buffer into the state store via
    * the SAME merge() the batch partial+final aggregation uses; state
    * stays ≤ 2k counters per group forever, which is what makes an
    * unbounded top-k stream runnable at all (exact per-group
    * histograms grow without bound). Grouping columns (e.g. a tumbling
    * `window(ts, ...)`) are the caller's; output mode complete/update. */
  def heavyTermsStream(stream: DataFrame, term: org.apache.spark.sql.Column,
                       k: Int, groupBy: Seq[org.apache.spark.sql.Column] = Nil): DataFrame =
    stream.groupBy(groupBy: _*)
      .agg(graft.functions.HeavyHitters.heavyHitters(term, k).as("hh"))
}
