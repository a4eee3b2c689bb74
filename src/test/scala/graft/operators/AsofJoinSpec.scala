package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class AsofJoinSpec extends SparkTestBase {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("asof join picks the latest right row at or before left time") {
    import spark.implicits._
    val left = Seq(
      (1L, ts(100), "e1"), (1L, ts(200), "e2"), (1L, ts(50), "e0"),
      (2L, ts(100), "e3"), (3L, ts(100), "e4"))
      .toDF("k", "t", "name")
    val right = Seq(
      (1L, ts(60), 6.0), (1L, ts(100), 10.0), (1L, ts(150), 15.0),
      (2L, ts(400), 40.0))
      .toDF("k", "rt", "v")

    val got = AsofJoin.asofJoin(left, right, "k", "k", "t", "rt", Seq("v"))
      .select(col("name"), col("asof_time"), col("asof_v"))
      .collect().map(r => (r.getString(0),
        Option(r.getTimestamp(1)).map(_.getTime / 1000), Option(r.get(2))))
      .toSet

    assert(got == Set(
      ("e0", None, None),              // no right row at/before t=50
      ("e1", Some(100L), Some(10.0)),  // inclusive: rt == t matches
      ("e2", Some(150L), Some(15.0)),
      ("e3", None, None),              // right row only in the future
      ("e4", None, None)))             // key with no right rows at all
  }

  test("null keys and null times never match (SQL join semantics)") {
    import spark.implicits._
    val left = Seq(
      (Option(1L), Option(ts(100)), "e1"),
      (Option.empty[Long], Option(ts(100)), "e_nullkey"),
      (Option(1L), Option.empty[Timestamp], "e_nulltime"))
      .toDF("k", "t", "name")
    val right = Seq(
      (Option(1L), Option(ts(50)), 5.0),
      (Option.empty[Long], Option(ts(40)), 4.0),   // null key: matches nothing
      (Option(1L), Option.empty[Timestamp], 99.0)) // null time: matches nothing
      .toDF("k", "rt", "v")
    val got = AsofJoin.asofJoin(left, right, "k", "k", "t", "rt", Seq("v"))
      .select(col("name"), col("asof_time"), col("asof_v"))
      .collect().map(r => r.getString(0) ->
        (Option(r.getTimestamp(1)).map(_.getTime / 1000), Option(r.get(2)))).toMap
    assert(got("e1") == (Some(50L), Some(5.0)))
    assert(got("e_nullkey") == (None, None), "null left key must not match")
    assert(got("e_nulltime") == (None, None), "null left time must not match")
  }

  test("asof join matches brute-force argmax on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val left = (1 to 300).map(i =>
      (rnd.nextInt(10).toLong, ts(rnd.nextInt(1000).toLong), i.toLong))
      .toDF("k", "t", "id")
    val right = (1 to 200).map(i =>
      (rnd.nextInt(10).toLong, ts(rnd.nextInt(1000).toLong), i.toDouble))
      .toDF("k", "rt", "v")

    val got = AsofJoin.asofJoin(left, right, "k", "k", "t", "rt")
      .select(col("id"), unix_timestamp(col("asof_time")).as("asof_s"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap

    val rightRows = right.collect().map(r =>
      (r.getLong(0), r.getTimestamp(1).getTime / 1000))
    val exp = left.collect().map { r =>
      val (k, t, id) = (r.getLong(0), r.getTimestamp(1).getTime / 1000, r.getLong(2))
      val best = rightRows.filter(x => x._1 == k && x._2 <= t)
        .map(_._2).sorted.lastOption
      id -> best.map(_.asInstanceOf[Any])
    }.toMap
    assert(got == exp)
  }
}
