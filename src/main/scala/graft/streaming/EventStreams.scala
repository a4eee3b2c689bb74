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
}
