package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.Dedup

/** Batch/streaming parity for incremental admission: batch mode must
  * match `Dedup.incremental` exactly; across micro-batches the first
  * ARRIVAL claims a fingerprint and the claim survives into later
  * batches. */
class StreamingAdmissionSpec extends SparkTestBase {

  import spark.implicits._

  test("batch mode matches Dedup.incremental") {
    val index = Seq("fpA", "fpB").toDF("fp")
    val batch = Seq(
      (1L, "fpA"), (2L, "fpC"), (3L, "fpC"), (4L, "fpD"), (5L, "fpB"))
      .toDF("doc_id", "key")
    val expected = Dedup.incremental(batch, index, col("key")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("status"), r.getAs[Boolean]("keep")))).toMap
    val got = StreamingAdmission.admission(batch, index, col("key")).collect()
      .map(r => r.doc_id -> ((r.status, r.keep))).toMap
    assert(got == expected)
    assert(got(2L) == (("novel", true)) && got(3L) == (("dup_in_batch", false)))
  }

  test("a fingerprint claimed in an earlier micro-batch stays claimed") {
    implicit val sqlCtx = spark.sqlContext
    val index = Seq("known").toDF("fp")
    val stream = MemoryStream[(Long, String)]
    val q = StreamingAdmission.admission(
        stream.toDS().toDF("doc_id", "key"), index, col("key"))
      .writeStream.outputMode("append").format("memory")
      .queryName("admission_out").start()
    try {
      stream.addData((10L, "fresh"), (11L, "known"))
      q.processAllAvailable()
      // doc 12 has a LOWER id than none here, but its fp was claimed
      // by doc 10 in the previous batch — arrival order wins
      stream.addData((12L, "fresh"), (13L, "fresh2"))
      q.processAllAvailable()
      val out = spark.table("admission_out").collect()
        .map(r => r.getLong(0) -> ((r.getString(2), r.getBoolean(3)))).toMap
      assert(out == Map(
        10L -> (("novel", true)),
        11L -> (("dup_of_index", false)),
        12L -> (("dup_in_batch", false)),
        13L -> (("novel", true))))
    } finally q.stop()
  }
}
