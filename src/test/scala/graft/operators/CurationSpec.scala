package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** End-to-end curation: a planted corpus where each stage (eval
  * holdout, quality gate, language gate, dedup, decontamination,
  * packing) removes exactly one known doc, and the final report's
  * arithmetic is recomputed by hand. */
class CurationSpec extends SparkTestBase {

  // ~100 tokens, stopword-dense enough for the 'en' gate, long
  // tokens for the quality gate; `tag` makes texts distinct
  private def goodText(tag: String): String =
    (Seq.fill(10)("the") ++ (0 until 90).map(i => s"${tag}word$i")).mkString(" ")

  private def corpus = {
    import spark.implicits._
    Seq(
      (10L, "s1", goodText("ev")),   // eval doc (id % 10 == 0): held out
      (1L, "s1", goodText("k")),     // survives everything
      (2L, "s1", goodText("k")),     // exact dup of 1 → dedup drops
      (3L, "s1", goodText("ev")),    // same text as eval → contaminated
      (4L, "s1", "tiny low quality"),// fails the quality gate
      (5L, "s1", (0 until 100).map(i => s"xw$i").mkString(" ")), // no stopwords → 'unk'
      (6L, "s2", goodText("m")),     // second source, 2 clean docs
      (7L, "s2", goodText("n"))
    ).map { case (id, src, t) => (id, src, t, t.length.toLong) }
      .toDF("doc_id", "source", "text", "n_chars")
  }

  test("each stage drops its planted doc; report arithmetic is exact") {
    val docs = corpus
    val ev = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
    val out = Curation.curate(docs, ev, targetPerSource = 1000L, seqLen = 64)
      .orderBy("source").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("s1", "s2"))
    val nTok = (tag: String) => (goodText(tag).length + 3) / 4 // ceil(len/4)
    val s1 = out(0); val s2 = out(1)
    assert(s1.getAs[Long]("n_docs") == 1L, s"s1: $s1")
    assert(s1.getAs[Long]("n_tokens") == nTok("k").toLong)
    assert(s1.getAs[Long]("n_chunks") == (nTok("k") + 63) / 64)
    assert(s2.getAs[Long]("n_docs") == 2L, s"s2: $s2")
    val s2tok = nTok("m") + nTok("n")
    assert(s2.getAs[Long]("n_tokens") == s2tok.toLong)
    // packing tiling invariant: distinct chunks == ceil(total/seqLen)
    assert(s2.getAs[Long]("n_chunks") == (s2tok + 63) / 64)
  }

  test("rebalance stage caps a dominant source") {
    import spark.implicits._
    // 40 distinct clean docs in s1, 3 in s2; cap at 8 expected/source
    val docs = ((1L to 40L).map(i => (i * 10 + 1, "s1", goodText(s"a$i"))) ++
      (1L to 3L).map(i => (i * 10 + 3, "s2", goodText(s"b$i"))))
      .map { case (id, src, t) => (id, src, t, t.length.toLong) }
      .toDF("doc_id", "source", "text", "n_chars")
    val ev = docs.limit(0)
    val out = Curation.curate(docs, ev, targetPerSource = 8L, seqLen = 64)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_docs")).toMap
    // s1 rate = 8000 div 40 = 200 permille → expected 8 kept (LCG cut);
    // s2 rate = min(1000, 8000 div 3) = 1000 → all 3 kept
    assert(out("s2") == 3L)
    assert(out("s1") < 40L && out("s1") > 0L, s"s1 kept ${out("s1")}")
  }

  test("empty eval set disables holdout and decontamination") {
    import spark.implicits._
    val docs = Seq((10L, "s1", goodText("e")))
      .map { case (id, src, t) => (id, src, t, t.length.toLong) }
      .toDF("doc_id", "source", "text", "n_chars")
    val out = Curation.curate(docs, docs.limit(0), seqLen = 64).collect()
    assert(out.length == 1 && out(0).getAs[Long]("n_docs") == 1L)
  }

  test("host gate drops alias-farm hosts whole and equals curate on the survivors") {
    import spark.implicits._
    // s1 docs live on an alias-farm host (one canonical page under
    // per-doc tracking params → dup pressure 3/4); s2's host serves
    // distinct pages (pressure 0)
    val docs = Seq(
      (1L, "s1", goodText("a")), (2L, "s1", goodText("b")),
      (3L, "s1", goodText("c")), (4L, "s1", goodText("d")),
      (6L, "s2", goodText("m")), (7L, "s2", goodText("n")))
      .map { case (id, src, t) => (id, src, t, t.length.toLong) }
      .toDF("doc_id", "source", "text", "n_chars")
    val urls = docs.select(col("doc_id"),
      when(col("source") === "s1",
        concat(lit("https://farm.example.com/page?utm_source=x"),
          col("doc_id").cast("string")))
        .otherwise(concat(lit("https://ok.example.com/p/"),
          col("doc_id").cast("string"))).as("url"))
    val ev = docs.limit(0)
    val gated = Curation.curateWithHostGate(docs, urls, ev,
        maxHostDupE6 = 500000L, seqLen = 64)
      .orderBy("source").collect()
    // s1's host (dup 3/4 ≥ 50%) dropped whole; s2 untouched
    assert(gated.map(_.getString(0)).toSeq == Seq("s2"))
    // and the composition equals plain curate over the surviving docs
    val expected = Curation.curate(docs.filter(col("source") === "s2"), ev,
        seqLen = 64).orderBy("source").collect()
    assert(gated.map(_.toSeq).toSeq == expected.map(_.toSeq).toSeq)
  }

  test("media gate drops exactly the flagged docs and equals curate on the rest") {
    import spark.implicits._
    val docs = (1L to 8L).map(id => (id, "s", goodText(id.toString)))
      .map { case (id, src, t) => (id, src, t, t.length.toLong) }
      .toDF("doc_id", "source", "text", "n_chars")
    val drops = Seq(3L, 6L).toDF("doc_id")
    val ev = docs.limit(0)
    val gated = Curation.curateWithMediaGate(docs, drops, ev, seqLen = 64)
      .orderBy("source").collect()
    val expected = Curation.curate(
        docs.filter(!col("doc_id").isin(3L, 6L)), ev, seqLen = 64)
      .orderBy("source").collect()
    assert(gated.map(_.toSeq).toSeq == expected.map(_.toSeq).toSeq)
  }

  test("planted media verdicts reduce to the ≡4/≡9/≡14 residues") {
    import spark.implicits._
    // the q_curate_media determinism assumption, proven on a corpus
    // slice: each modality's dedup over the planted media drops the
    // twin carriers and ONLY them (sources keep by min-id)
    val docs = (0L to 99L).map(id => (id, "s", s"text $id", 7L))
      .toDF("doc_id", "source", "text", "n_chars")
    def verdictDrops(media: org.apache.spark.sql.DataFrame): Set[Long] = {
      val r = media.collect()
      r.map(_.getLong(0)).toSet
    }
    val img = (0L to 99L).flatMap { id =>
      if (id % 20 == 0)
        Some((id, Multimodal.plantHeader(id, Array.emptyByteArray)))
      else if (id % 20 == 4)
        ImageDedup.reencodedTwin(
          Multimodal.plantHeader(id - 4, Array.emptyByteArray)).map((id, _))
      else None
    }.toDF("doc_id", "media")
    val aud = (0L to 99L).flatMap { id =>
      if (id % 20 == 0) Some((id, Multimodal.plantWav(id)))
      else if (id % 20 == 14)
        AudioDedup.reencodedTwin(Multimodal.plantWav(id - 14)).map((id, _))
      else None
    }.toDF("doc_id", "media")
    val vid = (0L to 99L).flatMap { id =>
      if (id % 20 == 0) Some((id, Multimodal.plantAvi(id)))
      else if (id % 20 == 9)
        VideoDedup.reencodedTwin(Multimodal.plantAvi(id - 9)).map((id, _))
      else None
    }.toDF("doc_id", "media")
    val imgDrops = verdictDrops(
      ImageDedup.dedup(img).filter(!col("keep")).select("doc_id"))
    val audDrops = verdictDrops(
      AudioDedup.dedup(aud).filter(!col("keep")).select("doc_id"))
    val vidDrops = verdictDrops(
      VideoDedup.dedup(vid).filter(!col("keep")).select("doc_id"))
    assert(imgDrops === (0L to 99L).filter(_ % 20 == 4).toSet)
    assert(audDrops === (0L to 99L).filter(_ % 20 == 14).toSet)
    assert(vidDrops === (0L to 99L).filter(_ % 20 == 9).toSet)
  }
}
