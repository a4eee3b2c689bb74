package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase

/** Scaling evidence for the STREAMING fuzzy-admission path, matching
  * the measured-not-argued standard the batch side holds (BASELINE.md
  * scale tables): per-batch wall time across a 10× batch-size step,
  * and the state-size contract — the fold keys only within one
  * micro-batch, so the state store must hold ZERO rows afterwards
  * (admission state lives in the persisted band index, not the
  * stream; a stream that ran for a year holds no more state than one
  * that ran a minute).
  *
  * Wall-clock assertions are deliberately loose (30× budget for a 10×
  * step) — this host has documented starvation windows — while the
  * state assertion is exact. Measured rows/sec go to BASELINE.md. */
class StreamingThroughputSpec extends SparkTestBase {

  import spark.implicits._

  private val vocab = Array("spark", "filter", "join", "group", "order",
    "window", "scan", "sort", "hash", "value", "batch", "stream", "table",
    "column", "vector", "query", "key", "line", "part", "data")

  /** Deterministic ~20-token doc; ~1/3 are near-dups of index docs. */
  private def docText(i: Long): String = {
    val r = new scala.util.Random(i)
    if (i % 3 == 0) {
      val toks = (0 until 20).map(k => vocab(((i / 3 + k) % vocab.length).toInt)).toArray
      toks(0) = s"x$i" // 1-token mutation: stays above the 0.5 Jaccard bar
      toks.mkString(" ")
    } else
      (0 until 20).map(_ => vocab(r.nextInt(vocab.length)) + r.nextInt(1000))
        .mkString(" ")
  }

  private def indexDf = (0L until 300L)
    .map(i => (i, (0 until 20).map(k => vocab(((i + k) % vocab.length).toInt)).mkString(" ")))
    .toDF("doc_id", "text")

  private def runBatchThrough(n: Int): (Double, Long) = {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val verdicts = StreamingNearDupAdmission.admission(
      in.toDF().toDF("doc_id", "text"), indexDf)
    in.addData((0 until n).map(i => (i.toLong + 1000000L, docText(i.toLong))))
    val t0 = System.nanoTime()
    val q = verdicts.writeStream
      .format("memory").queryName(s"thru_$n")
      .outputMode("append")
      .start()
    q.processAllAvailable()
    val sec = (System.nanoTime() - t0) / 1e9
    val stateRows = Option(q.lastProgress)
      .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
    val out = spark.table(s"thru_$n").count()
    q.stop()
    assert(out == n, s"every doc must get exactly one verdict: $out != $n")
    (sec, stateRows)
  }

  test("10x batch step scales sub-30x and leaves ZERO state-store rows") {
    runBatchThrough(200) // JIT/codegen warm-up outside the timings
    val (secSmall, stateSmall) = runBatchThrough(1000)
    val (secBig, stateBig) = runBatchThrough(10000)
    info(f"batch 1k: $secSmall%.2f s (${1000 / secSmall}%.0f rows/s), state rows $stateSmall")
    info(f"batch 10k: $secBig%.2f s (${10000 / secBig}%.0f rows/s), state rows $stateBig")
    // the admission fold holds no cross-batch state — the bounded-
    // memory claim, asserted exactly
    assert(stateSmall == 0L && stateBig == 0L,
      s"state store must stay empty, got $stateSmall/$stateBig")
    // loose wall-clock contract: 10× rows within 30× time even on a
    // noisy host — catches accidental O(batch²) candidate blow-ups
    assert(secBig < secSmall * 30 + 5.0,
      f"10x batch took $secBig%.2f s vs $secSmall%.2f s")
  }
}
