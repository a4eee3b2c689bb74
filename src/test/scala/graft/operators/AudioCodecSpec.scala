package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The REAL RIFF/WAVE PCM codec: planted containers must decode
  * bit-for-bit (interleaving, signedness, little-endianness, the
  * even-padding chunk walk), and malformed containers must return
  * None, never throw. Pure JVM — no SparkSession. */
class AudioCodecSpec extends AnyFunSuite {

  test("planted WAVs decode to the exact planted interleaved samples") {
    // span both channel counts, all three rates, odd junk lengths
    (0L until 16L).foreach { docId =>
      val Some((rate, ch, samples)) = Multimodal.decodeWav(Multimodal.plantWav(docId))
      assert(rate == Multimodal.plantedRate(docId))
      assert(ch == Multimodal.plantedChannels(docId))
      val n = Multimodal.plantedFrames(docId)
      assert(samples.length == n * ch)
      for (i <- 0 until n; c <- 0 until ch)
        assert(samples(i * ch + c) == Multimodal.plantedSample(docId, i, c).toShort,
          s"doc $docId sample ($i,$c)")
    }
  }

  test("negative samples round-trip (LE 16-bit two's complement)") {
    // planted values span [-32768, 32767]; find a doc with a negative
    // min and assert signedness survived
    val Some((_, _, samples)) = Multimodal.decodeWav(Multimodal.plantWav(3L))
    assert(samples.exists(_ < 0), "fixture never crossed zero — weak test")
    assert(samples.min >= Short.MinValue && samples.max <= Short.MaxValue)
  }

  test("malformed containers return None, never throw") {
    val good = Multimodal.plantWav(5L)
    // truncation anywhere
    Seq(0, 3, 11, 20, good.length - 1).foreach { cut =>
      assert(Multimodal.decodeWav(good.take(cut)).isEmpty, s"cut at $cut")
    }
    // wrong magic
    val notRiff = good.clone(); notRiff(0) = 'X'.toByte
    assert(Multimodal.decodeWav(notRiff).isEmpty)
    val notWave = good.clone(); notWave(8) = 'X'.toByte
    assert(Multimodal.decodeWav(notWave).isEmpty)
    // RIFF size field inconsistent with the actual byte count
    val badSize = good.clone(); badSize(4) = (badSize(4) ^ 0x7f).toByte
    assert(Multimodal.decodeWav(badSize).isEmpty)
    // non-PCM format tag
    val fmtAt = good.indexOfSlice("fmt ".getBytes("US-ASCII").toSeq)
    assert(fmtAt > 0)
    val nonPcm = good.clone(); nonPcm(fmtAt + 8) = 3 // IEEE float
    assert(Multimodal.decodeWav(nonPcm).isEmpty)
    // 8-bit depth rejected
    val bad8 = good.clone(); bad8(fmtAt + 22) = 8
    assert(Multimodal.decodeWav(bad8).isEmpty)
    // data before fmt violates ordering
    val dataAt = good.indexOfSlice("data".getBytes("US-ASCII").toSeq)
    val reordered = good.clone()
    "tmaf".zipWithIndex.foreach { case (c, j) => reordered(fmtAt + j) = c.toByte }
    assert(Multimodal.decodeWav(reordered).isEmpty)
    assert(dataAt > fmtAt)
  }

  test("chunk walk honors the even-padding rule (odd junk chunk before fmt)") {
    // plantWav always writes an odd-length LIST chunk + 1 pad byte;
    // a decoder skipping size-without-pad would land mid-stream and
    // miss fmt. All docs decode → the rule is honored. Also prove the
    // junk is really odd for at least one doc.
    val wav = Multimodal.plantWav(9L)
    val listAt = wav.indexOfSlice("LIST".getBytes("US-ASCII").toSeq)
    assert(listAt == 12)
    val junkLen = (wav(16) & 0xff) | ((wav(17) & 0xff) << 8)
    assert(junkLen % 2 == 1, "junk chunk not odd — padding path untested")
    assert(Multimodal.decodeWav(wav).nonEmpty)
  }
}
