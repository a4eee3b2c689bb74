package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Deterministic training-order shuffle: reproducible, total, dense
  * per-shard positions; overflow-safe on huge ids. */
class TrainOrderSpec extends SparkTestBase {

  private def corpus = {
    import spark.implicits._
    (0L until 5000L).toDF("doc_id")
  }

  test("same input → identical order on repeated runs") {
    val a = Sampling.trainOrder(corpus, "doc_id", nShards = 8)
    val b = Sampling.trainOrder(corpus, "doc_id", nShards = 8)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("every row is placed exactly once; shards are in range") {
    val out = Sampling.trainOrder(corpus, "doc_id", nShards = 8).cache()
    assert(out.count() == 5000L)
    assert(out.select("doc_id").distinct().count() == 5000L)
    val shards = out.select("shard").distinct().collect().map(_.getLong(0))
    assert(shards.forall(s => s >= 0 && s < 8), shards.toSeq.toString)
    out.unpersist()
  }

  test("per-shard positions are dense 0..n-1 and ordered by (okey, id)") {
    val out = Sampling.trainOrder(corpus, "doc_id", nShards = 4).cache()
    // dense: max(pos) = count-1 and distinct(pos) = count per shard
    val perShard = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"),
        countDistinct("pos").as("nd")).collect()
    perShard.foreach { r =>
      assert(r.getAs[Long]("mx") == r.getAs[Long]("n") - 1, r.toString)
      assert(r.getAs[Long]("nd") == r.getAs[Long]("n"), r.toString)
    }
    // ordered: pos ranks agree with (okey, doc_id) sort order
    val viol = out.as("x").join(out.as("y"),
        col("x.shard") === col("y.shard") && col("x.pos") < col("y.pos") &&
          (col("x.okey") > col("y.okey") ||
            (col("x.okey") === col("y.okey") && col("x.doc_id") > col("y.doc_id"))))
      .count()
    assert(viol == 0L)
    out.unpersist()
  }

  test("order is a real shuffle, not identity, and spreads across shards") {
    val out = Sampling.trainOrder(corpus, "doc_id", nShards = 8)
    // shard sizes are roughly balanced (LCG pseudo-uniform)
    val sizes = out.groupBy("shard").count().collect().map(_.getLong(1))
    assert(sizes.length == 8)
    assert(sizes.forall(n => math.abs(n - 625.0) < 200), sizes.toSeq.toString)
    // the in-shard order differs from id order (it IS shuffled)
    val firstShard = out.filter(col("shard") === 0).orderBy("pos")
      .select("doc_id").collect().map(_.getLong(0))
    assert(firstShard.toSeq != firstShard.sorted.toSeq)
  }

  test("okey never overflows for huge ids") {
    import spark.implicits._
    val huge = Seq(Long.MaxValue, Long.MaxValue - 7, 1L << 62, 0L).toDF("id")
    val keys = Sampling.trainOrder(huge, "id", nShards = 3)
      .select("okey").collect().map(_.getLong(0))
    assert(keys.forall(k => k >= 0 && k < 1000003L), keys.toSeq.toString)
  }
}
