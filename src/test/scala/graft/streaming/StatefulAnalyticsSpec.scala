package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.Sessions
import graft.streaming.StatefulSessions.Event

/** Batch/streaming parity for the stateful analytic twins: the same
  * rows through `StatefulAnalytics.rolling`/`gaps` (batch mode and
  * incremental MemoryStream) must match the window-function batch
  * operators `Sessions.rollingCounts`/`interEventGaps`. */
class StatefulAnalyticsSpec extends SparkTestBase {

  private val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
  private def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
  private def ev(id: Long, min: Int, user: Long, v: Double) =
    Event(id, ts(min), user, "click", v, "{}")

  // boundary (exactly window-width apart), ties, burst, two users
  private val fixture = Seq(
    ev(1, 0, 7, 10.0), ev(2, 60, 7, 20.0), ev(3, 121, 7, 40.0),
    ev(4, 121, 7, 5.0), ev(5, 130, 7, 1.0),
    ev(6, 10, 8, 2.5), ev(7, 200, 8, 7.25))

  private def batchRolling = {
    import spark.implicits._
    Sessions.rollingCounts(fixture.toDF(), windowMinutes = 60)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getDouble(4)))
      .toSet
  }

  test("batch-mode rolling equals the RANGE-frame window operator") {
    import spark.implicits._
    val out = StatefulAnalytics.rolling(fixture.toDS(), windowMinutes = 60)
      .collect()
      .map(r => (r.user_id, r.event_id, r.n_trailing, r.sum_trailing)).toSet
    assert(out == batchRolling)
  }

  test("incremental rolling over a MemoryStream matches batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = StatefulAnalytics.rolling(
        stream.toDS().withWatermark("ts", "10 minutes"), windowMinutes = 60)
      .writeStream.outputMode("append").format("memory")
      .queryName("rolling_out").start()
    try {
      // arrival in global event-time order (the in-order contract —
      // later batches advance the watermark, so an old-timestamped
      // event in a late batch would be dropped as late data), ties
      // co-arriving, split across 3 batches
      stream.addData(fixture.filter(e => e.ts.getTime <= ts(60).getTime))
      q.processAllAvailable()
      stream.addData(fixture.filter(e =>
        e.ts.getTime > ts(60).getTime && e.ts.getTime <= ts(130).getTime))
      q.processAllAvailable()
      stream.addData(fixture.filter(e => e.ts.getTime > ts(130).getTime))
      q.processAllAvailable()
      val streamed = spark.table("rolling_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getDouble(4)))
        .toSet
      assert(streamed == batchRolling)
    } finally q.stop()
  }

  test("bursty user: pointer-span frames match the window operator exactly") {
    import spark.implicits._
    // 300 events over 5 hours with many exact-time ties (i/3 ⇒ burst
    // triples) — stresses the monotone lo/hi pointers and prefix sums
    val burst = (1 to 300).map(i => ev(i.toLong, (i / 3) * 2, 9L, (i % 4) * 0.25))
    val batch = Sessions.rollingCounts(burst.toDF(), windowMinutes = 60)
      .collect()
      .map(r => (r.getLong(1), r.getLong(3), r.getDouble(4))).toSet
    val out = StatefulAnalytics.rolling(burst.toDS(), windowMinutes = 60)
      .collect().map(r => (r.event_id, r.n_trailing, r.sum_trailing)).toSet
    assert(out == batch)
  }

  test("rolling state retains only the trailing window of events") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val state = TestGroupState.create[StatefulAnalytics.RollingState](
      org.apache.spark.api.java.Optional.empty(), GroupStateTimeout.EventTimeTimeout,
      1000L, org.apache.spark.api.java.Optional.of(0L), hasTimedOut = false)
    val windowUs = 60L * 60L * 1000000L
    val evs = Seq(ev(1, 0, 7, 1.0), ev(2, 30, 7, 1.0), ev(3, 120, 7, 1.0))
    StatefulAnalytics.updateRolling(windowUs)(7L, evs.iterator, state).toList
    // events at minute 0 and 30 are outside minute-120's trailing hour
    assert(state.get.us.toSeq == Seq(StatefulSessions.micros(ts(120))),
      "stale events were retained beyond the window horizon")
  }

  test("batch-mode gaps equal the lag-window operator; single-event user null") {
    import spark.implicits._
    val out = StatefulAnalytics.gaps(fixture.toDS()).collect()
      .map(r => r.user_id -> ((r.n_events, r.n_gaps, r.max_gap_us, r.avg_gap_us)))
      .toMap
    val batch = Sessions.interEventGaps(fixture.toDF()).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap
    assert(out == batch)
    // sanity on the fixture itself: user 8 has one gap of 190 min
    assert(out(8L) == ((2L, 1L, Some(190L * 60L * 1000000L), Some(190L * 60L * 1000000L))))
  }

  test("incremental gaps update across batches and converge to batch answer") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = StatefulAnalytics.gaps(stream.toDS())
      .writeStream.outputMode("update").format("memory")
      .queryName("gaps_out").start()
    try {
      stream.addData(fixture.filter(_.event_id <= 3))
      q.processAllAvailable()
      stream.addData(fixture.filter(_.event_id > 3))
      q.processAllAvailable()
      // update mode appends one refreshed row per (user, batch);
      // n_events is monotone, so max-per-user is the latest row
      val last = spark.table("gaps_out")
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("user_id")).orderBy(desc("n_events"))))
        .filter(col("rk") === 1).drop("rk")
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap
      val batch = Sessions.interEventGaps(fixture.toDF()).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap
      assert(last == batch)
    } finally q.stop()
  }

  // fill-forward fixture: glitches ("error") interleaved with valid
  // readings, a leading glitch (no carry yet), and a second user
  private def fv(id: Long, min: Int, user: Long, typ: String, v: Double) =
    Event(id, ts(min), user, typ, v, "{}")
  private val fillFixture = Seq(
    fv(1, 0, 7, "error", 99.0), fv(2, 1, 7, "view", 10.0),
    fv(3, 2, 7, "error", 99.0), fv(4, 3, 7, "error", 99.0),
    fv(5, 4, 7, "click", 20.0), fv(6, 5, 7, "error", 99.0),
    fv(7, 0, 8, "view", 5.0), fv(8, 90, 8, "error", 99.0))

  private def batchFill = {
    import spark.implicits._
    Sessions.fillForward(fillFixture.toDF(), col("event_type") === "error")
      .collect()
      .map(r => (r.getAs[Long]("event_id"),
        Option(r.getAs[java.lang.Double]("filled_value")).map(_.toDouble),
        r.getAs[Boolean]("was_filled"))).toSet
  }

  test("batch-mode fillForward equals the window operator") {
    import spark.implicits._
    val out = StatefulAnalytics.fillForward(fillFixture.toDS(),
        e => e.event_type == "error")
      .collect().map(r => (r.event_id, r.filled_value, r.was_filled)).toSet
    assert(out == batchFill)
  }

  test("incremental fillForward carries the last valid value across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = StatefulAnalytics.fillForward(stream.toDS(),
        e => e.event_type == "error")
      .writeStream.outputMode("append").format("memory")
      .queryName("fill_out").start()
    try {
      // user 8's glitch arrives a batch (and 90 minutes) after their
      // only valid reading — the carry must survive the silence
      stream.addData(fillFixture.filter(_.event_id != 8))
      q.processAllAvailable()
      stream.addData(fillFixture.filter(_.event_id == 8))
      q.processAllAvailable()
      val streamed = spark.table("fill_out").collect()
        .map(r => (r.getLong(1),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          r.getBoolean(4))).toSet
      assert(streamed == batchFill)
      assert(streamed.contains((8L, Some(5.0), true)))
    } finally q.stop()
  }

  // latest-state fixture: out-of-order arrival within a user, an
  // equal-timestamp tie (event_id decides), and cent-exact values
  private val latestFixture = Seq(
    fv(1, 50, 7, "view", 0.10), fv(2, 10, 7, "click", 0.20),
    fv(3, 50, 7, "purchase", 0.30), // ties ev1 on ts; higher id wins
    fv(4, 0, 8, "view", 1.11), fv(5, 99, 8, "click", 2.22))

  private def batchLatest = {
    import spark.implicits._
    Sessions.latestState(latestFixture.toDF()).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("last_us"), r.getAs[Long]("last_event_id"),
          r.getAs[String]("last_event_type"), r.getAs[Double]("last_value"),
          r.getAs[Long]("n_events"), r.getAs[Double]("lifetime_value")))).toMap
  }

  test("batch-mode latest equals the max_by operator (ties, cents exact)") {
    import spark.implicits._
    val out = StatefulAnalytics.latest(latestFixture.toDS()).collect()
      .map(r => r.user_id -> ((r.last_us, r.last_event_id, r.last_event_type,
        r.last_value, r.n_events, r.lifetime_value))).toMap
    assert(out == batchLatest)
    assert(out(7L)._2 == 3L) // tie on ts(50) broken by event_id
    assert(out(7L)._6 == 0.60) // 0.1+0.2+0.3 exact in cents, not 0.6000000000000001
  }

  test("latest survives NaN/Infinity/overflow values like the batch decimal cast") {
    import spark.implicits._
    // batch CAST(value AS DECIMAL(18,2)) turns these into NULL, which
    // sum skips; the streaming fold must contribute 0, not crash
    val evil = Seq(
      fv(1, 0, 9, "view", 1.50), fv(2, 1, 9, "view", Double.NaN),
      fv(3, 2, 9, "view", Double.PositiveInfinity),
      fv(4, 3, 9, "view", 1e17), fv(5, 4, 9, "view", 2.25))
    val out = StatefulAnalytics.latest(evil.toDS()).collect()
      .map(r => r.user_id -> ((r.n_events, r.lifetime_value))).toMap
    assert(out(9L) == ((5L, 3.75)))
  }

  test("incremental latest: an older event in a later batch cannot usurp the champion") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = StatefulAnalytics.latest(stream.toDS())
      .writeStream.outputMode("update").format("memory")
      .queryName("latest_out").start()
    try {
      // user 7's newest event (min 50) arrives FIRST; the min-10
      // event follows in a later batch and must only bump counters
      stream.addData(latestFixture.filter(e => e.event_id != 2))
      q.processAllAvailable()
      stream.addData(latestFixture.filter(e => e.event_id == 2))
      q.processAllAvailable()
      val last = spark.table("latest_out")
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("user_id")).orderBy(desc("n_events"))))
        .filter(col("rk") === 1).drop("rk")
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3),
          r.getDouble(4), r.getLong(5), r.getDouble(6))))
        .toMap
      assert(last == batchLatest)
    } finally q.stop()
  }
}
