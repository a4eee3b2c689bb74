package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class RangeJoinSpec extends SparkTestBase {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("band join finds exactly the pairs within the band (brute force)") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val times = (1 to 400).map(i => i.toLong -> ts(rnd.nextInt(5000).toLong))
    val l = times.toDF("id", "t")
    val r = times.map { case (i, t) => (i + 1000, t) }.toDF("rid", "rt")

    // multiset comparison: a bug emitting a pair once per candidate
    // bucket (instead of exactly once) must fail, so no .toSet
    val got = RangeJoin.bandJoin(l, r, "t", "rt", bandSeconds = 30)
      .select(col("id"), col("rid")).collect()
      .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq

    val exp = (for {
      (i, t) <- times
      (j, u) <- times
      if math.abs(t.getTime - u.getTime) <= 30000L
    } yield (i, j + 1000)).sorted
    assert(got == exp)
    assert(exp.size > times.size) // sanity: some real cross-row pairs
  }

  test("band edges are inclusive; outside the band excluded") {
    import spark.implicits._
    val l = Seq((1L, ts(100))).toDF("id", "t")
    val r = Seq((10L, ts(40)), (11L, ts(160)), (12L, ts(39)), (13L, ts(161)))
      .toDF("rid", "rt")
    val got = RangeJoin.bandJoin(l, r, "t", "rt", bandSeconds = 60)
      .select(col("rid")).collect().map(_.getLong(0)).toSet
    assert(got == Set(10L, 11L)) // exactly ±60 s kept, ±61 s dropped
  }
}
