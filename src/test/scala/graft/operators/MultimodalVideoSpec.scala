package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** RIFF/AVI video path ([[Multimodal.plantAvi]] / [[Multimodal
  * .decodeAvi]] / [[Multimodal.videoFrames]]): real container walk
  * (declared sizes, even-padding rule, movi descent), temporal
  * subsampling, and per-frame decode parity with the standalone
  * JPEG decoder. */
class MultimodalVideoSpec extends SparkTestBase {

  test("container walk returns every frame in order; payloads decode like standalone JPEGs") {
    for (docId <- 0L to 12L) {
      val avi = Multimodal.plantAvi(docId)
      val frames = Multimodal.decodeAvi(avi)
        .getOrElse(fail(s"doc $docId: valid AVI rejected"))
      assert(frames.length == Multimodal.plantedVideoFrames(docId))
      frames.zipWithIndex.foreach { case (fb, f) =>
        val direct = Multimodal.plantJpeg(Multimodal.plantedFrameSeed(docId, f))
        assert(fb.sameElements(direct),
          s"doc $docId frame $f: chunk payload differs from the planted stream")
        assert(Multimodal.decodeJpeg(fb).isDefined,
          s"doc $docId frame $f: extracted frame does not decode")
      }
      // geometry is constant across a stream's frames
      val dims = frames.flatMap(Multimodal.decodeJpeg(_).map(t => (t._1, t._2))).toSet
      assert(dims.size == 1, s"doc $docId: frame geometry varies: $dims")
    }
  }

  test("malformed containers are rejected, never thrown") {
    val good = Multimodal.plantAvi(3L)
    assert(Multimodal.decodeAvi(Array.empty[Byte]).isEmpty)
    assert(Multimodal.decodeAvi("RIFFxxxxWAVE".getBytes).isEmpty)
    // truncation breaks the declared RIFF size
    assert(Multimodal.decodeAvi(good.dropRight(7)).isEmpty)
    // a corrupted inner chunk size that overruns the list is rejected
    val bad = good.clone()
    val movi = (0 until bad.length - 4)
      .find(i => new String(bad.slice(i, i + 4), "US-ASCII") == "movi").get
    bad(movi + 8) = 0x7f.toByte // blow up the first 00dc size byte...
    assert(Multimodal.decodeAvi(bad).isEmpty ||
      Multimodal.decodeAvi(bad).get.isEmpty)
  }

  test("videoFrames samples every 2nd frame and matches the planted arithmetic") {
    import spark.implicits._
    val docs = (0L to 9L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val rows = Multimodal.videoFrames(
        Multimodal.withPlantedVideo(docs), everyN = 2)
      .collect().map(r => (r.doc_id, r.frame_idx)).sorted
    val expected = (0L to 9L).flatMap { id =>
      (0 until Multimodal.plantedVideoFrames(id))
        .filter(_ % 2 == 0).map(f => (id, f.toLong))
    }.sorted
    assert(rows.toSeq == expected, "sampled (doc, frame) set off")
    // one frame's means equal the standalone decode of its seed
    val r0 = Multimodal.videoFrames(Multimodal.withPlantedVideo(
        docs.filter(col("doc_id") === 5L)), everyN = 2)
      .collect().find(_.frame_idx == 2L).get
    val (w, h, px) = Multimodal.decodeJpeg(
      Multimodal.plantJpeg(Multimodal.plantedFrameSeed(5L, 2))).get
    val sums = new Array[Long](3)
    px.zipWithIndex.foreach { case (b, i) => sums(i % 3) += b & 0xff }
    assert(r0.width == w && r0.height == h &&
      r0.chan_sums.toSeq == sums.toSeq && r0.n_px == w.toLong * h)
  }
}
