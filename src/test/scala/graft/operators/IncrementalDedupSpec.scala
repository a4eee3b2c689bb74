package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Incremental exact dedup: a new batch classified against a stored
  * fingerprint index — dup_of_index beats dup_in_batch, the batch's
  * min-doc_id claims each novel fingerprint, and only novel rows are
  * admitted. The index never needs the corpus text, only fp. */
class IncrementalDedupSpec extends SparkTestBase {

  import spark.implicits._

  test("classifies dup_of_index / dup_in_batch / novel correctly") {
    val index = Seq("fpA", "fpB", "fpA").toDF("fp") // duplicate index rows are fine
    val batch = Seq(
      (1L, "doc one"),   // fp "fpA" → already indexed
      (2L, "doc two"),   // fp "fpC" → novel (first claimant)
      (3L, "doc three"), // fp "fpC" → dup within the batch
      (4L, "doc four"))  // fp "fpD" → novel
      .toDF("doc_id", "text")
    val fp = when(col("doc_id") === 1, "fpA")
      .when(col("doc_id") === 4, "fpD").otherwise("fpC")
    val out = Dedup.incremental(batch, index, fp).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("status"), r.getAs[Boolean]("keep")))).toMap
    assert(out == Map(
      1L -> (("dup_of_index", false)),
      2L -> (("novel", true)),
      3L -> (("dup_in_batch", false)),
      4L -> (("novel", true))))
  }

  test("index membership wins even for the batch's min doc_id") {
    val index = Seq("x").toDF("fp")
    val batch = Seq((10L, "a"), (11L, "b")).toDF("doc_id", "text")
    val out = Dedup.incremental(batch, index, lit("x")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status")).toMap
    assert(out == Map(10L -> "dup_of_index", 11L -> "dup_of_index"))
  }

  test("empty index admits one keeper per distinct fingerprint") {
    val index = spark.emptyDataset[String].toDF("fp")
    val batch = (1 to 20).map(i => (i.toLong, s"t${i % 5}")).toDF("doc_id", "text")
    val out = Dedup.incremental(batch, index, col("text"))
    assert(out.filter(col("keep")).count() == 5L)
    assert(out.filter(col("status") === "dup_of_index").count() == 0L)
    // keepers are the min doc_id of each fingerprint class (1..5)
    assert(out.filter(col("keep")).select("doc_id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
  }
}
