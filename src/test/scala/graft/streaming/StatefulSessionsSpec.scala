package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.Sessions

/** flatMapGroupsWithState sessionization: closed sessions from the
  * streaming run must match the batch lag+cumsum operator; the final
  * open session closes via event-time timeout when the watermark
  * advances. */
class StatefulSessionsSpec extends SparkTestBase {

  import StatefulSessions._

  private val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
  private def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)

  private def mkEvents: Seq[Event] = Seq(
    Event(1, ts(0), 7, "a", 1.0, "{}"),
    Event(2, ts(10), 7, "a", 2.0, "{}"),
    Event(3, ts(60), 7, "a", 3.0, "{}"),   // 50-min gap → session 2
    Event(4, ts(65), 7, "a", 4.0, "{}"),
    Event(5, ts(5), 8, "b", 5.0, "{}"),
    Event(6, ts(90), 8, "b", 6.0, "{}"))   // 85-min gap → session 2

  test("streaming sessionize matches batch for closed sessions; timeout closes the tail") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val sessions = StatefulSessions.sessionize(
      stream.toDS().withWatermark("ts", "1 minute").as[Event], gapMinutes = 30)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      stream.addData(mkEvents)
      q.processAllAvailable()
      // advance the watermark far past every open session
      stream.addData(Event(99, ts(10000), 999, "z", 0.0, "{}"))
      q.processAllAvailable()
      val got = spark.table("sess_out")
        .filter(col("user_id") < 100)
        .collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("sid")) ->
          (r.getAs[Long]("n_events"), r.getAs[Long]("dur_us"))).toMap
      // batch operator over the same rows (sessions 1 and 2 per user)
      val batch = Sessions.sessionize(mkEvents.toDF(), gapMinutes = 30)
        .collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("sid")) ->
          (r.getAs[Long]("n_events"), r.getAs[Long]("dur_us"))).toMap
      assert(got == batch, s"streaming $got vs batch $batch")
      assert(got.size == 4) // two sessions per user, all closed
    } finally q.stop()
  }

  test("batch execution emits gap-closed sessions (open tails withheld)") {
    import spark.implicits._
    val out = StatefulSessions.sessionize(mkEvents.toDS(), gapMinutes = 30)
      .collect().map(c => (c.user_id, c.sid) -> c.n_events).toMap
    // session 1 of each user closes via the observed gap; session 2
    // stays open (no timeout in batch) — append semantics
    assert(out == Map((7L, 1L) -> 2L, (8L, 1L) -> 1L))
  }

  test("post-timeout event continues the per-user sid sequence") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val sessions = StatefulSessions.sessionize(
      stream.toDS().withWatermark("ts", "1 minute").as[Event], gapMinutes = 30)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_resume").start()
    try {
      stream.addData(mkEvents)
      q.processAllAvailable()
      // watermark passes user 7's session 2 → event-time timeout closes it
      stream.addData(Event(90, ts(10000), 999, "z", 0.0, "{}"))
      q.processAllAvailable()
      // a NEW user-7 event after the timeout must open session 3, not
      // restart at sid 1 (batch numbering is monotone per user)
      stream.addData(Event(91, ts(10005), 7, "a", 7.0, "{}"))
      q.processAllAvailable()
      stream.addData(Event(92, ts(20000), 999, "z", 0.0, "{}"))
      q.processAllAvailable()
      val sids = spark.table("sess_resume")
        .filter(col("user_id") === 7)
        .collect().map(_.getAs[Long]("sid")).sorted.toSeq
      assert(sids == Seq(1L, 2L, 3L), s"user-7 sids after timeout+resume: $sids")
    } finally q.stop()
  }

  test("gap decisions use full microsecond resolution (unix_micros parity)") {
    import spark.implicits._
    // A at t0 + 400µs, B at t0 + 30min + 900µs: true micro gap is
    // 30min + 500µs > gap → TWO sessions. Millisecond-truncated
    // arithmetic sees exactly 30min → one session (the old bug).
    val a = new java.sql.Timestamp(t0.getTime); a.setNanos(400000)
    val b = new java.sql.Timestamp(t0.getTime + 30 * 60000L); b.setNanos(900000)
    val events = Seq(
      Event(1, a, 5, "a", 1.0, "{}"),
      Event(2, b, 5, "a", 2.0, "{}"))
    val closed = StatefulSessions.sessionize(events.toDS(), gapMinutes = 30).collect()
    // batch mode withholds the open tail: the gap-closed session 1
    // only exists if the micro-resolution gap was honored
    assert(closed.map(c => (c.user_id, c.sid, c.n_events)).toSeq == Seq((5L, 1L, 1L)),
      s"expected session 1 closed by a 30min+500µs gap, got ${closed.toSeq}")
    // and the same pair must agree with the batch operator's count
    val batchSessions = Sessions.sessionize(events.toDF(), gapMinutes = 30)
      .collect().map(_.getAs[Long]("sid")).sorted.toSeq
    assert(batchSessions == Seq(1L, 2L), s"batch operator saw $batchSessions")
  }
}
