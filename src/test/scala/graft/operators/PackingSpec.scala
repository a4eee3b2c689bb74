package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Concat-and-chunk sequence packing: offsets are the running token
  * sum per shard, chunk spans follow from integer arithmetic, and
  * boundary-straddling docs span multiple chunks. */
class PackingSpec extends SparkTestBase {

  private def docs(rows: Seq[(Long, String, Long)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "n_tok")
  }

  test("offsets accumulate per shard and chunks split at capacity") {
    val d = docs(Seq(
      (1L, "a", 100L), (2L, "a", 100L), (3L, "a", 100L), // a: 0,100,200
      (4L, "b", 300L), (5L, "b", 50L)))                  // b: 0,300
    val out = Packing.packChunks(d, col("n_tok"), seqLen = 256)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("start_tok"), r.getAs[Long]("chunk_id"),
          r.getAs[Long]("n_chunks"))).toMap
    assert(out(1L) == (0L, 0L, 1L))
    assert(out(2L) == (100L, 0L, 1L))
    // doc 3 starts at 200, ends at 299 → straddles chunks 0 and 1
    assert(out(3L) == (200L, 0L, 2L))
    // shard b restarts at 0; doc 4 spans tokens 0..299 → chunks 0,1
    assert(out(4L) == (0L, 0L, 2L))
    assert(out(5L) == (300L, 1L, 1L))
  }

  test("exact-boundary and empty docs") {
    val d = docs(Seq((1L, "a", 256L), (2L, "a", 0L), (3L, "a", 256L)))
    val out = Packing.packChunks(d, col("n_tok"), seqLen = 256)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("start_tok"), r.getAs[Long]("chunk_id"),
          r.getAs[Long]("n_chunks"))).toMap
    assert(out(1L) == (0L, 0L, 1L))   // fills chunk 0 exactly
    assert(out(2L) == (256L, 1L, 0L)) // empty doc spans no chunks
    assert(out(3L) == (256L, 1L, 1L)) // fills chunk 1 exactly
  }

  test("total chunk count matches ceil(shard tokens / seqLen)") {
    val d = docs((1L to 40L).map(i => (i, s"s${i % 3}", 37L)))
    val out = Packing.packChunks(d, col("n_tok"), seqLen = 64)
    val perShard = out.groupBy(col("source"))
      .agg(max(col("start_tok") + col("n_tok")).as("tot"),
        max(expr("chunk_id + n_chunks")).as("chunks"))
      .collect()
    perShard.foreach { r =>
      val expected = (r.getAs[Long]("tot") + 63) / 64
      assert(r.getAs[Long]("chunks") == expected,
        s"shard ${r.getString(0)}: ${r.getAs[Long]("chunks")} != $expected")
    }
  }
}
