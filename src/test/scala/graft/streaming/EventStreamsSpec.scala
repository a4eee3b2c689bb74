package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.Sessions

/** Batch/streaming parity (SURVEY §7 risk 6): the same
  * Sessions.tumblingAgg over a MemoryStream must equal the batch
  * result on the same rows once all data is processed. */
case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
              event_type: String, value: Double, props: String)

class EventStreamsSpec extends SparkTestBase {

  test("streaming tumbling agg equals batch on same data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    val rows = (0 until 200).map(i =>
      Ev(i.toLong, ts(i * 7 % 300), i % 5, if (i % 2 == 0) "click" else "view",
        (i % 13) + 0.25, "{}"))

    val stream = MemoryStream[Ev]
    val agg = EventStreams.tumblingAggStream(stream.toDF(), watermark = "10 minutes")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("stream_out").start()
    try {
      stream.addData(rows.take(120))
      q.processAllAvailable()
      stream.addData(rows.drop(120))
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT window.start AS ws, event_type, n_events, sum_value FROM stream_out")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
          r.getDouble(3))).toSet
      val batch = Sessions.tumblingAgg(rows.toDF())
        .select(col("window.start").as("ws"), col("event_type"),
          col("n_events"), col("sum_value"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
          r.getDouble(3))).toSet
      assert(streamed == batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("append mode drops events later than the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    def ev(id: Long, min: Int) = Ev(id, ts(min), 1L, "click", 1.0, "{}")

    val stream = MemoryStream[Ev]
    val agg = EventStreams.tumblingAggStream(stream.toDF(), watermark = "10 minutes")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("late_out").start()
    try {
      // fill window [00:00, 01:00), then advance event time to 02:00
      // → watermark 01:50 → the first window finalizes and emits
      stream.addData(ev(1, 0), ev(2, 30))
      q.processAllAvailable()
      stream.addData(ev(3, 120))
      q.processAllAvailable()
      val afterClose = spark.table("late_out")
        .select(col("window.start"), col("n_events")).collect()
        .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
      assert(afterClose(ts(0)) == 2L) // first window emitted with 2 events
      // a late event inside the closed window must be DROPPED
      stream.addData(ev(4, 30))
      q.processAllAvailable()
      val afterLate = spark.table("late_out")
        .select(col("window.start"), col("n_events")).collect()
        .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
      assert(afterLate == afterClose, "late event re-opened a closed window")
    } finally q.stop()
  }

  test("stream-stream interval join attributes clicks to impressions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(s: Int) = new java.sql.Timestamp(t0.getTime + s * 1000L)

    val imps = MemoryStream[(Long, java.sql.Timestamp)]
    val clicks = MemoryStream[(Long, java.sql.Timestamp)]
    // both frames carry the key under its natural name `ad_id`;
    // the operator renames the right side to r_ad_id internally
    val joined = EventStreams.intervalJoinStream(
      imps.toDF().toDF("ad_id", "imp_ts"),
      clicks.toDF().toDF("ad_id", "click_ts"),
      key = "ad_id", leftTs = "imp_ts", rightTs = "click_ts",
      withinSeconds = 60)
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("attrib_out").start()
    try {
      imps.addData((1L, ts(0)), (2L, ts(0)))
      clicks.addData(
        (1L, ts(30)),   // within 60 s of imp 1 → attributed
        (2L, ts(90)),   // 90 s after imp 2 → outside window
        (3L, ts(10)))   // no impression at all
      q.processAllAvailable()
      val got = spark.table("attrib_out")
        .select(col("ad_id"), col("click_ts")).collect()
        .map(r => r.getLong(0) -> r.getTimestamp(1)).toSet
      assert(got == Set(1L -> ts(30)))
    } finally q.stop()
  }
}
