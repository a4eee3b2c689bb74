package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Misra-Gries heavy-hitters aggregate: exact when vocab ≤ k, the
  * under-count/bound/coverage guarantees under compaction with
  * planted skew, merge correctness across partitions, and SQL-text
  * reachability. */
class HeavyHittersSpec extends SparkTestBase {

  private def hhRows(df: org.apache.spark.sql.DataFrame, k: Int): Seq[(String, Long, Long)] =
    df.agg(HeavyHitters.heavyHitters(col("term"), k).as("hh"))
      .select(explode(col("hh")).as("c"))
      .select("c.term", "c.est", "c.err_bound")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

  test("vocab under capacity: summary is exact with zero error") {
    import spark.implicits._
    val df = (0 until 1000).map(i => s"t${i % 7}").toDF("term").repartition(4)
    val got = hhRows(df, 16).map { case (t, e, _) => t -> e }.toMap
    val exact = df.groupBy("term").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exact)
    assert(hhRows(df, 16).forall(_._3 == 0L), "no compaction → err_bound 0")
  }

  test("planted skew under compaction: bounds and coverage hold") {
    import spark.implicits._
    // 5 heavy terms (2000 each) + 500 rare terms (4 each): n = 12000
    val rows = (0 until 5).flatMap(h => Seq.fill(2000)(s"heavy$h")) ++
      (0 until 500).flatMap(r => Seq.fill(4)(s"rare$r"))
    val df = rows.toDF("term").repartition(8)
    val k = 20
    val out = hhRows(df, k)
    assert(out.nonEmpty && out.size <= k)
    val exact = df.groupBy("term").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = rows.size.toLong
    out.foreach { case (t, est, err) =>
      assert(est <= exact(t), s"$t over-counted: $est > ${exact(t)}")
      assert(exact(t) <= est + err, s"$t bound broken: ${exact(t)} > $est + $err")
      assert(err <= n / (k + 1), s"err $err exceeds n/(k+1) = ${n / (k + 1)}")
    }
    // every item with true freq > err_bound must survive — the heavy
    // five (2000 ≫ 12000/21 ≈ 571) are guaranteed present
    val terms = out.map(_._1).toSet
    (0 until 5).foreach(h => assert(terms.contains(s"heavy$h"), s"heavy$h evicted"))
  }

  test("output is sorted by estimate desc then term") {
    import spark.implicits._
    val df = (Seq.fill(50)("b") ++ Seq.fill(50)("a") ++ Seq.fill(9)("z"))
      .toDF("term")
    val out = hhRows(df, 8)
    assert(out == out.sortBy(e => (-e._2, e._1)), out.toString)
  }

  test("nulls are skipped; empty input yields an empty summary") {
    import spark.implicits._
    val df = Seq(Some("x"), None, Some("x"), None).toDF("term")
    assert(hhRows(df, 4) == Seq(("x", 2L, 0L)))
    val empty = Seq.empty[String].toDF("term")
    assert(hhRows(empty, 4).isEmpty)
  }

  test("reachable from SQL text via heavy_hitters(term, k)") {
    import spark.implicits._
    GraftFunctions.registerAll(spark)
    (0 until 90).map(i => s"w${i % 3}").toDF("term")
      .createOrReplaceTempView("hh_terms")
    val rows = spark.sql(
      "SELECT inline(heavy_hitters(term, 8)) FROM hh_terms")
      .collect().toSeq
    assert(rows == Seq(Row("w0", 30L, 0L), Row("w1", 30L, 0L), Row("w2", 30L, 0L)))
  }
}
