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
}
