package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.Dedup

/** Batch/streaming parity for FUZZY incremental admission: the
  * streaming twin must produce verdicts identical to
  * `Dedup.incrementalNearDup` on the same docs, regardless of how the
  * stream is micro-batched (verdicts depend only on the static
  * index, so arrival order cannot matter — asserted, not assumed). */
class StreamingNearDupSpec extends SparkTestBase {

  import spark.implicits._

  private val base =
    "spark filter join group order window scan sort hash value batch " +
      "stream table column vector query key line part data small"
  private def mutate(text: String, n: Int, tag: String): String = {
    val toks = text.split(" ")
    toks.indices.take(n).foreach(i => toks(i) = s"$tag$i")
    toks.mkString(" ")
  }

  private def indexDf = Seq(
    (100L, base),
    (101L, mutate(base, 18, "far")), // far from base
    (102L, "tiny doc")               // <3 tokens: no shingles, no bands
  ).toDF("doc_id", "text")

  // 1-2 mutated tokens keep Jaccard well above 0.5; 18 push it below
  private val streamDocs = Seq(
    (1L, mutate(base, 1, "x")),   // near-dup of 100
    (2L, mutate(base, 18, "y")),  // novel (low Jaccard to everything)
    (3L, base),                   // exact text of 100 → near-dup
    (4L, mutate(base, 2, "z")),   // near-dup of 100
    (5L, "qq ww")                 // no shingles → novel
  )

  test("per-row signatures are bit-identical to batch Dedup.minhash") {
    val all = indexDf.collect().map(r => (r.getLong(0), r.getString(1))) ++
      streamDocs
    val withShingles = all.filter(_._2.split(" ", -1).length >= 3)
    val docs = withShingles.toSeq.toDF("doc_id", "text")
    val batch = Dedup.minhash(docs, numBands = 16, rowsPerBand = 2)
      .select(col("doc_id"), col("bands")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    withShingles.foreach { case (id, text) =>
      val mine = StreamingNearDupAdmission
        .signatureOf(text, numBands = 16, rowsPerBand = 2).toList
      assert(mine == batch(id), s"band keys diverge for doc $id")
    }
    // shingle-less docs: batch drops them from minhash, per-row
    // signature is empty — both classify novel
    all.filter(_._2.split(" ", -1).length < 3).foreach { case (_, text) =>
      assert(StreamingNearDupAdmission
        .signatureOf(text, numBands = 16, rowsPerBand = 2).isEmpty)
    }
  }

  test("batch mode matches Dedup.incrementalNearDup verdict for verdict") {
    val batchDocs = streamDocs.toDF("doc_id", "text")
    val expected = Dedup.incrementalNearDup(batchDocs, indexDf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("status"), Option(r.getAs[java.lang.Long]("match_id")).map(_.toLong),
          r.getAs[Boolean]("keep")))).toMap
    val got = StreamingNearDupAdmission.admission(batchDocs, indexDf).collect()
      .map(v => v.doc_id -> ((v.status, v.match_id, v.keep))).toMap
    assert(got == expected)
    // and the fixture exercises both classes
    assert(expected(3L)._1 == "near_dup" && expected(3L)._2.contains(100L))
    assert(expected(2L)._1 == "novel" && expected(5L)._1 == "novel")
  }

  test("checkpointed restart resumes fuzzy admission without re-emitting verdicts") {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val root = java.nio.file.Files.createTempDirectory("graft_neardup").toFile.getAbsolutePath
    val in = s"$root/in"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    new java.io.File(in).mkdirs()
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def start() = {
      val stream = spark.readStream.schema(schema).parquet(in)
      StreamingNearDupAdmission.admission(stream, indexDf)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", out)
        .start()
    }
    // batch 1 before first start
    streamDocs.take(2).toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // batch 2 lands while the query is DOWN; restart must pick it up
    // from the checkpoint and emit each verdict exactly once
    streamDocs.drop(2).toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val rows = spark.read.parquet(out).collect()
    assert(rows.length == streamDocs.size, s"expected one verdict per doc, got ${rows.length}")
    val got = rows.map(r => r.getAs[Long]("doc_id") ->
      ((r.getAs[String]("status"), Option(r.get(2)).map(_.asInstanceOf[Long])))).toMap
    val expected = Dedup.incrementalNearDup(
        streamDocs.toDF("doc_id", "text"), indexDf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("status"), Option(r.getAs[java.lang.Long]("match_id")).map(_.toLong)))).toMap
    assert(got == expected)
  }

  test("micro-batched stream produces the same verdicts as one batch") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = StreamingNearDupAdmission.admission(
        stream.toDS().toDF("doc_id", "text"), indexDf)
      .writeStream.outputMode("append").format("memory")
      .queryName("neardup_out").start()
    try {
      stream.addData(streamDocs(0), streamDocs(1))
      q.processAllAvailable()
      stream.addData(streamDocs(2))
      q.processAllAvailable()
      stream.addData(streamDocs(3), streamDocs(4))
      q.processAllAvailable()
      val got = spark.table("neardup_out").collect()
        .map(r => r.getLong(0) ->
          ((r.getString(1), Option(r.get(2)).map(_.asInstanceOf[Long]), r.getBoolean(3)))).toMap
      val expected = Dedup.incrementalNearDup(
          streamDocs.toDF("doc_id", "text"), indexDf).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[String]("status"), Option(r.getAs[java.lang.Long]("match_id")).map(_.toLong),
            r.getAs[Boolean]("keep")))).toMap
      assert(got == expected, s"stream verdicts $got != batch $expected")
      assert(got.size == streamDocs.size)
    } finally q.stop()
  }
}
