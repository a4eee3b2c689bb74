package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Latest-state compaction: one row per user carrying the most recent
  * event (by timestamp, event_id tie-break) plus lifetime counters —
  * the CDC/upsert read path. The max_by shape must pick the correct
  * event under ties and out-of-order input, and the lifetime sum must
  * be exact (decimal accumulation). */
class LatestStateSpec extends SparkTestBase {

  import spark.implicits._

  private val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
  private def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)

  test("picks the max-timestamp event per user with lifetime counters") {
    val events = Seq(
      (1L, ts(0), 10L, "view", 1.5),
      (2L, ts(5), 10L, "click", 2.5),
      (3L, ts(3), 10L, "view", 4.0),
      (4L, ts(7), 20L, "purchase", 99.99))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Sessions.latestState(events).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    val u10 = out(10L)
    assert(u10.getAs[Long]("last_event_id") == 2L)
    assert(u10.getAs[String]("last_event_type") == "click")
    assert(u10.getAs[Double]("last_value") == 2.5)
    assert(u10.getAs[Long]("n_events") == 3L)
    assert(u10.getAs[Double]("lifetime_value") == 8.0)
    assert(out(20L).getAs[Long]("last_event_id") == 4L)
    assert(out(20L).getAs[Double]("lifetime_value") == 99.99)
  }

  test("equal timestamps break ties by the larger event_id (deterministic)") {
    val events = Seq(
      (7L, ts(1), 5L, "a", 1.0),
      (9L, ts(1), 5L, "b", 2.0), // same ts — higher id wins
      (8L, ts(1), 5L, "c", 3.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Sessions.latestState(events).collect().head
    assert(r.getAs[Long]("last_event_id") == 9L)
    assert(r.getAs[String]("last_event_type") == "b")
  }

  test("result is insensitive to input order and partitioning") {
    val rows = (1 to 200).map(i =>
      (i.toLong, ts(i * 13 % 97), (i % 7).toLong, s"t${i % 3}", i * 0.01))
    val a = Sessions.latestState(rows.toDF("event_id", "ts", "user_id", "event_type", "value"))
    val b = Sessions.latestState(
      rows.reverse.toDF("event_id", "ts", "user_id", "event_type", "value")
        .repartition(7))
    assert(a.orderBy("user_id").collect().toSeq ==
      b.orderBy("user_id").collect().toSeq)
  }
}
