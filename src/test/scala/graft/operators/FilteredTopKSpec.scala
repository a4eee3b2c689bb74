package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Metadata-constrained vector search: the constraint is part of the
  * join key, so neighbors must come exclusively from the query's own
  * slice, ranking within the slice must match unconstrained search
  * restricted to that slice, and a selective filter must never
  * backfill from other slices. */
class FilteredTopKSpec extends SparkTestBase {

  import spark.implicits._

  // two labels; within a label vectors point the same way (high cos),
  // across labels they are near-orthogonal
  private def fixture = (0 until 40).map { i =>
    val lab = i % 2
    (i.toLong,
      Array.tabulate(8)(j =>
        (if (j % 2 == lab) 1.0 + 0.001 * i else 0.01 * ((i * 7 + j) % 5)).toFloat),
      s"label$lab")
  }.toDF("vec_id", "embedding", "label")

  test("every neighbor shares the query's label") {
    val emb = fixture
    val queries = emb.filter(col("vec_id") < 4)
    val out = Similarity.filteredTopK(emb, queries, k = 5, Seq("label"))
    val labelOf = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(labelOf(r.getAs[Long]("qid")) == labelOf(r.getAs[Long]("neighbor_id")),
        s"cross-slice neighbor for qid=${r.getAs[Long]("qid")}")
    }
    // exactly k neighbors per query (each slice has 20 > 5 members)
    assert(rows.groupBy(_.getAs[Long]("qid")).forall(_._2.length == 5))
  }

  test("matches brute-force top-k computed on the slice alone") {
    val emb = fixture
    val slice = emb.filter(col("label") === "label0")
    val queries = slice.filter(col("vec_id") === 0)
    val constrained = Similarity.filteredTopK(emb, queries, k = 5, Seq("label"))
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("neighbor_id"), r.getAs[Double]("score")))
    val sliceOnly = Similarity.bruteForceTopK(slice, queries, k = 5)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("neighbor_id"), r.getAs[Double]("score")))
    assert(constrained.toSeq == sliceOnly.toSeq)
  }

  test("a singleton slice yields no neighbors rather than backfilling") {
    val emb = fixture.union(
      Seq((999L, Array.fill(8)(1.0f), "lonely")).toDF("vec_id", "embedding", "label"))
    val queries = emb.filter(col("vec_id") === 999L)
    assert(Similarity.filteredTopK(emb, queries, k = 5, Seq("label")).count() == 0L)
  }
}
