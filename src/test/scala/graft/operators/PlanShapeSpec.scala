package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Physical-plan contracts for the newest operators — the shapes the
  * 100 TB rationale depends on, asserted so a refactor can't silently
  * regress them to nested loops or event-level window sorts. */
class PlanShapeSpec extends SparkTestBase {

  import spark.implicits._

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filteredTopK joins on the constraint key — hash join, no nested loop") {
    val emb = (0 until 20).map(i =>
      (i.toLong, Array.fill(4)(i.toFloat), s"l${i % 2}")).toDF("vec_id", "embedding", "label")
    val p = plan(Similarity.filteredTopK(emb, emb.limit(3), k = 2, Seq("label")))
    assert(p.contains("BroadcastHashJoin"), s"expected a hash join on label:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"constraint must ride the join key, not a post-filtered cross product:\n$p")
  }

  test("latestState aggregates with map-side partials — no window sort of the log") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val events = (1 to 50).map(i =>
      (i.toLong, new java.sql.Timestamp(t0.getTime + i * 1000L), (i % 5).toLong,
        "t", i * 0.5)).toDF("event_id", "ts", "user_id", "event_type", "value")
    val p = plan(Sessions.latestState(events))
    assert(!p.contains("Window"), s"compaction must not be a window over every event:\n$p")
    // partial+final pair: the aggregate appears on both sides of the exchange
    assert("SortAggregate|HashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final aggregation:\n$p")
  }

  test("incremental dedup never cross-products the batch against the index") {
    val batch = (1 to 30).map(i => (i.toLong, s"t${i % 7}")).toDF("doc_id", "text")
    val index = (1 to 100).map(i => s"x$i").toDF("fp")
    val p = plan(Dedup.incremental(batch, index, col("text")))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"admission must be an fp-keyed equi-join:\n$p")
  }
}
