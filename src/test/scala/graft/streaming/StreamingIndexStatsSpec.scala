package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase
import graft.operators.Retrieval

/** Streaming BM25 index-stats maintenance: after any micro-batch
  * arrival pattern, the streamed df table and corpus scalars are
  * bit-equal to the batch aggregation over the same documents — so
  * BM25 from the streamed index is bit-equal to batch BM25. */
class StreamingIndexStatsSpec extends SparkTestBase {

  private val docs = Seq(
    (0L, "spark data tool"),
    (1L, "data data data of the of the"),
    (2L, "spark spark data of the"),
    (3L, "data of"),
    (4L, "tool data of the a and in"),
    (5L, "fresh terms stream in late"))

  test("streamed df + corpus stats equal the batch aggregation bit-for-bit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val sdf = stream.toDS().toDF("doc_id", "text")
    val qDf = StreamingIndexStats.dfCounts(sdf)
      .writeStream.outputMode("complete").format("memory")
      .queryName("stream_df").start()
    val qStats = StreamingIndexStats.corpusStats(sdf)
      .writeStream.outputMode("complete").format("memory")
      .queryName("stream_stats").start()
    try {
      stream.addData(docs(0), docs(1))
      qDf.processAllAvailable(); qStats.processAllAvailable()
      stream.addData(docs(2))
      qDf.processAllAvailable(); qStats.processAllAvailable()
      stream.addData(docs(3), docs(4), docs(5))
      qDf.processAllAvailable(); qStats.processAllAvailable()

      val batch = docs.toDF("doc_id", "text")
      val gotDf = spark.table("stream_df").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val expDf = Retrieval.dfCounts(batch).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(gotDf == expDf)

      val gotStats = spark.table("stream_stats").collect()(0)
      val expStats = Retrieval.corpusStats(batch).collect()(0)
      assert((gotStats.getLong(0), gotStats.getLong(1)) ==
        ((expStats.getLong(0), expStats.getLong(1))))
    } finally { qDf.stop(); qStats.stop() }
  }

  test("mid-stream snapshot equals the batch over the docs seen so far") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = StreamingIndexStats.dfCounts(stream.toDS().toDF("doc_id", "text"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("stream_df_mid").start()
    try {
      stream.addData(docs(0), docs(1), docs(2))
      q.processAllAvailable()
      val got = spark.table("stream_df_mid").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val exp = Retrieval.dfCounts(docs.take(3).toDF("doc_id", "text"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == exp)
    } finally q.stop()
  }
}
