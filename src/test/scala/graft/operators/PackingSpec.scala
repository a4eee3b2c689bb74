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

  test("empty doc at a non-aligned offset still spans 0 chunks") {
    val d = docs(Seq((1L, "a", 100L), (2L, "a", 0L), (3L, "a", 100L)))
    val out = Packing.packChunks(d, col("n_tok"), seqLen = 256)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("start_tok"), r.getAs[Long]("n_chunks"))).toMap
    // start_tok = 100 is mid-chunk: the raw span arithmetic would
    // claim 1 chunk; an empty doc must span 0
    assert(out(2L) == (100L, 0L))
    assert(out(3L) == (100L, 1L))
  }

  test("chunk boundaries stay exact above 2^53 tokens (integer div, not double)") {
    // start_tok = 2^53 + 2047: as a double this rounds (ties-to-even)
    // up to 2^53 + 2048, so floor(double / 2048) would misplace the
    // doc into chunk 2^42 + 1; integer div keeps it in chunk 2^42.
    val big = (1L << 53) + 2047L
    val d = docs(Seq((1L, "a", big), (2L, "a", 5L)))
    val out = Packing.packChunks(d, col("n_tok"), seqLen = 2048)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("start_tok"), r.getAs[Long]("chunk_id"))).toMap
    assert(out(2L) == (big, 1L << 42))
  }

  test("chunkSegments tiles every interior chunk to exactly seqLen tokens") {
    val d = docs(Seq(
      (1L, "a", 100L), (2L, "a", 0L), (3L, "a", 300L), (4L, "a", 112L),
      (5L, "b", 700L)))
    val seg = Packing.chunkSegments(d, col("n_tok"), seqLen = 256).collect()
    // empty docs emit no segments
    assert(!seg.exists(_.getAs[Long]("doc_id") == 2L))
    // doc 3 (span 100..399) splits at the 256 boundary
    val d3 = seg.filter(_.getAs[Long]("doc_id") == 3L)
      .map(r => (r.getAs[Long]("chunk_id"), r.getAs[Long]("tok_start"),
        r.getAs[Long]("tok_len"), r.getAs[Long]("chunk_off"))).sortBy(_._1)
    assert(d3.toSeq == Seq((0L, 0L, 156L, 100L), (1L, 156L, 144L, 0L)))
    // per-doc segment lengths sum to n_tok; doc-relative spans abut
    val byDoc = seg.groupBy(_.getAs[Long]("doc_id"))
    for ((id, rows) <- byDoc) {
      val n = Map(1L -> 100L, 3L -> 300L, 4L -> 112L, 5L -> 700L)(id)
      assert(rows.map(_.getAs[Long]("tok_len")).sum == n, s"doc $id")
      val spans = rows.map(r => (r.getAs[Long]("tok_start"), r.getAs[Long]("tok_len")))
        .sortBy(_._1)
      assert(spans.head._1 == 0L)
      spans.sliding(2).foreach {
        case Array((s0, l0), (s1, _)) => assert(s0 + l0 == s1, s"doc $id gap")
        case _ =>
      }
    }
    // every chunk except each shard's last tiles to exactly seqLen
    val byChunk = seg.groupBy(r => (r.getAs[String]("source"), r.getAs[Long]("chunk_id")))
    val lastChunk = byChunk.keys.groupBy(_._1).map { case (s, ks) => s -> ks.map(_._2).max }
    for (((src, cid), rows) <- byChunk if cid != lastChunk(src)) {
      assert(rows.map(_.getAs[Long]("tok_len")).sum == 256L, s"chunk $src/$cid")
      assert(rows.map(_.getAs[Long]("chunk_off")).min == 0L)
    }
  }

  test("slidingWindows covers every token with bounded overlap") {
    val d = docs(Seq(
      (1L, "a", 100L),  // shorter than window → one truncated window
      (2L, "a", 512L),  // exactly one window
      (3L, "a", 513L),  // one token past → second window
      (4L, "a", 0L),    // empty → no windows
      (5L, "a", 896L),  // 512 + 384 exactly → 2 windows, both cover to 896
      (6L, "a", 2000L)))
    val out = Packing.slidingWindows(d, col("n_tok"), window = 512, stride = 384)
      .collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(r => (r.getAs[Long]("win_id"),
        r.getAs[Long]("win_start"), r.getAs[Long]("win_len"))).sortBy(_._1).toSeq)
      .toMap
    assert(out(1L) == Seq((0L, 0L, 100L)))
    assert(out(2L) == Seq((0L, 0L, 512L)))
    assert(out(3L) == Seq((0L, 0L, 512L), (1L, 384L, 129L)))
    assert(!out.contains(4L))
    assert(out(5L) == Seq((0L, 0L, 512L), (1L, 384L, 512L)))
    // doc 6: windows at 0, 384, 768, 1152, 1536 — last covers to 2000
    assert(out(6L).map(_._2) == Seq(0L, 384L, 768L, 1152L, 1536L))
    assert(out(6L).last == (4L, 1536L, 464L))
    // coverage invariant: windows abut or overlap, and the union of
    // [win_start, win_start+win_len) spans [0, n_tok) for every doc
    for ((id, wins) <- out) {
      val n = Map(1L -> 100L, 2L -> 512L, 3L -> 513L, 5L -> 896L, 6L -> 2000L)(id)
      assert(wins.head._2 == 0L)
      assert(wins.last._2 + wins.last._3 == n, s"doc $id end")
      wins.sliding(2).foreach {
        case Seq((_, s0, l0), (_, s1, _)) =>
          assert(s1 <= s0 + l0, s"doc $id gap"); assert(s1 - s0 == 384L)
        case _ =>
      }
      assert(wins.forall(_._3 <= 512L))
    }
  }

  test("slidingWindows with stride == window is disjoint chunking") {
    val d = docs(Seq((1L, "a", 1000L)))
    val out = Packing.slidingWindows(d, col("n_tok"), window = 256, stride = 256)
      .collect().map(r => (r.getAs[Long]("win_start"), r.getAs[Long]("win_len")))
      .sortBy(_._1)
    assert(out.toSeq == Seq((0L, 256L), (256L, 256L), (512L, 256L), (768L, 232L)))
  }

  test("slidingWindows invariants hold across random (window, stride) configs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val cfg = for {
      w <- Gen.chooseNum(1, 300)
      s <- Gen.chooseNum(1, w)
    } yield (w, s)
    val lens = new scala.util.Random(11).shuffle(
      (0L to 40L) ++ Seq(1L, 299L, 300L, 301L, 600L, 601L, 1000L)).zipWithIndex
      .map { case (n, i) => (i.toLong, "a", n) }
    val d = docs(lens)
    (0 until 6).foreach { i =>
      cfg(Gen.Parameters.default, Seed(i.toLong)).foreach { case (w, s) =>
        val byDoc = Packing.slidingWindows(d, col("n_tok"), w, s)
          .collect()
          .groupBy(_.getAs[Long]("doc_id"))
          .view.mapValues(_.map(r => (r.getAs[Long]("win_id"),
            r.getAs[Long]("win_start"), r.getAs[Long]("win_len")))
            .sortBy(_._1).toSeq).toMap
        for ((id, _, n) <- lens) {
          val wins = byDoc.getOrElse(id, Seq.empty)
          if (n == 0L) assert(wins.isEmpty, s"w=$w s=$s empty doc")
          else {
            val expected = if (n <= w) 1L else (n - w + s - 1) / s + 1
            assert(wins.size.toLong == expected, s"w=$w s=$s n=$n count")
            assert(wins.head._2 == 0L)
            assert(wins.last._2 + wins.last._3 == n, s"w=$w s=$s n=$n end")
            wins.foreach { case (k, st, ln) =>
              assert(st == k * s); assert(ln == math.min(w.toLong, n - st))
              assert(ln >= 1L, s"w=$w s=$s n=$n empty window")
            }
          }
        }
      }
    }
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
