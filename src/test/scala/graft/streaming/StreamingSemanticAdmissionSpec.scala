package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.Dedup

/** Batch/streaming parity for SEMANTIC admission: the streaming twin
  * must produce verdicts identical to
  * `Dedup.incrementalSemanticAdmission` against the SAME stored
  * index, regardless of micro-batching, with zero state rows. */
class StreamingSemanticAdmissionSpec extends SparkTestBase {

  import spark.implicits._

  // 3 direction clusters, 8 dims (the SemanticIndexSpec fixture)
  private def corpusDF = {
    (0 until 60).map { i =>
      val base = Array.fill(8)(0.0)
      base(i % 3) = 10.0
      base(3 + i % 5) = 1.0 + (i % 7) * 0.1
      (i.toLong, base.toSeq)
    }.toDF("vec_id", "embedding")
  }

  private def streamVecs = {
    val c7 = corpusDF.filter(col("vec_id") === 7L)
      .select(col("embedding")).head().getSeq[Double](0)
    Seq(
      (100L, c7.map(_ + 0.001)),                              // near-dup of cluster around 7
      (101L, c7),                                             // exact copy
      (200L, Seq(0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 9.0)),    // novel direction
      (300L, Seq.fill(8)(0.0)))                               // zero vector: novel, no crash
  }

  test("streaming verdicts equal batch verdicts per arrival pattern; state stays empty") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sem_twin").toString
    try {
      val corpus = corpusDF
      Dedup.buildSemanticIndex(corpus, nlist = 4, dir)
      val batchVecs = streamVecs.toDF("vec_id", "embedding")
      val expected = Dedup.incrementalSemanticAdmission(batchVecs, corpus,
          dir, threshold = 0.9).collect()
        .map(r => r.getAs[Long]("vec_id") ->
          ((r.getAs[String]("status"),
            Option(r.getAs[java.lang.Long]("match_id")).map(_.toLong),
            r.getAs[Boolean]("keep")))).toMap
      // the fixture exercises both classes
      assert(expected(101L)._1 == "near_dup")
      assert(expected(100L)._1 == "near_dup")
      assert(expected(200L)._1 == "novel" && expected(300L)._1 == "novel")
      // batch mode of the twin
      val got0 = StreamingSemanticAdmission.admission(batchVecs, corpus, dir,
          threshold = 0.9).collect()
        .map(v => v.vec_id -> ((v.status, v.match_id, v.keep))).toMap
      assert(got0 == expected)
      // streaming arrival patterns
      val patterns = Seq(
        Seq(streamVecs),
        streamVecs.map(Seq(_)),
        Seq(streamVecs.take(2), streamVecs.drop(2)))
      patterns.zipWithIndex.foreach { case (batches, pi) =>
        implicit val sq = spark.sqlContext
        val mem = MemoryStream[(Long, Seq[Double])]
        val out = StreamingSemanticAdmission.admission(
          mem.toDF().toDF("vec_id", "embedding"), corpus, dir,
          threshold = 0.9)
        val q = out.writeStream.format("memory")
          .queryName(s"sem_adm_$pi").outputMode("append").start()
        try {
          batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
          val got = spark.table(s"sem_adm_$pi").collect()
            .map(r => r.getAs[Long]("vec_id") ->
              ((r.getAs[String]("status"),
                Option(r.getAs[java.lang.Long]("match_id")).map(_.toLong),
                r.getAs[Boolean]("keep")))).toMap
          assert(got == expected, s"pattern $pi diverged: $got vs $expected")
          // non-vacuous zero-state check (see StreamingAudioAdmissionSpec)
          assert(q.recentProgress.nonEmpty, "no streaming progress observed")
          q.recentProgress.foreach(p =>
            assert(p.stateOperators.map(_.numRowsTotal).sum == 0L,
              "admission must keep zero state rows"))
        } finally q.stop()
      }
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(new java.io.File(dir))
    }
  }
}
