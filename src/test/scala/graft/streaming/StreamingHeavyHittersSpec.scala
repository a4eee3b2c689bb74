package graft.streaming

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Streaming twin of q_sketch_heavy: the mergeable Misra-Gries
  * summary folded incrementally across micro-batches must equal the
  * batch summary on the same rows (exact under capacity), and keep
  * its under-count/bound guarantees when compaction fires. */
class StreamingHeavyHittersSpec extends SparkTestBase {

  private def run(rows: Seq[String], k: Int, splitAt: Int): Seq[(String, Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    val agg = EventStreams.heavyTermsStream(stream.toDF().toDF("term"),
      col("term"), k)
    val name = s"hh_stream_${k}_$splitAt"
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName(name).start()
    try {
      stream.addData(rows.take(splitAt))
      q.processAllAvailable()
      stream.addData(rows.drop(splitAt))
      q.processAllAvailable()
      spark.sql(s"SELECT inline(hh) FROM $name")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    } finally q.stop()
  }

  test("under capacity: streaming summary equals exact batch counts") {
    import spark.implicits._
    val rows = (0 until 600).map(i => s"t${i % 9}")
    val got = run(rows, k = 16, splitAt = 250)
    val exact = rows.toDF("term").groupBy("term").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.map { case (t, e, _) => t -> e }.toMap == exact)
    assert(got.forall(_._3 == 0L), "no compaction under capacity")
  }

  test("over capacity: bounds and heavy-item coverage survive micro-batching") {
    val rng = new scala.util.Random(42)
    val rows = rng.shuffle(
      ((0 until 3).flatMap(h => Seq.fill(900)(s"heavy$h")) ++
        (0 until 300).flatMap(r => Seq.fill(3)(s"rare$r"))).toList)
    val k = 12
    val out = run(rows, k, splitAt = rows.size / 2)
    assert(out.nonEmpty && out.size <= k)
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = rows.size.toLong
    out.foreach { case (t, est, err) =>
      assert(est <= exact(t), s"$t over-counted")
      assert(exact(t) <= est + err, s"$t bound broken: ${exact(t)} vs $est+$err")
      assert(err <= n / (k + 1))
    }
    val terms = out.map(_._1).toSet
    (0 until 3).foreach(h => assert(terms.contains(s"heavy$h"), s"heavy$h evicted"))
  }
}
