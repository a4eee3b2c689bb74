package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.scalatest.funsuite.AnyFunSuite

/** Progressive-JPEG decode coverage. Two independent angles:
  *
  *  1. the planted progressive twin ([[Multimodal.plantJpegProgressive]])
  *     must decode pixel-identical to the baseline planted stream of
  *     the same doc — across doc_ids this sweeps image sizes (1/2/4
  *     Y blocks → EOB0/EOB1/EOB2 runs), APP0 offsets, negative DCs,
  *     and the DC successive-approximation refine bit;
  *  2. a spec-local GRAYSCALE encoder (baseline + progressive with a
  *     libjpeg-like scan script: DC Al=1→refine, AC 1..63 Al=1→refine)
  *     encodes the SAME random quantized coefficient blocks both
  *     ways; the two streams must decode byte-identically. The
  *     entropy paths are completely disjoint (single-scan sequential
  *     vs spectral selection + successive approximation with EOB
  *     runs, ZRL-in-refine, newly-significant insertion, correction
  *     bits), so agreement pins the §G.2 state machine.
  */
class MultimodalProgressiveSpec extends AnyFunSuite {

  test("planted progressive twin decodes pixel-identical to the baseline plant") {
    (0L until 240L).foreach { id =>
      val base = Multimodal.decodeJpeg(Multimodal.plantJpeg(id))
      val prog = Multimodal.decodeJpeg(Multimodal.plantJpegProgressive(id))
      assert(base.isDefined, s"baseline decode failed for doc $id")
      assert(prog.isDefined, s"progressive decode failed for doc $id")
      val (bw, bh, bp) = base.get
      val (pw, ph, pp) = prog.get
      assert(bw == pw && bh == ph, s"dims differ for doc $id")
      assert(java.util.Arrays.equals(bp, pp), s"pixels differ for doc $id")
    }
  }

  test("the progressive plant classifies as jpeg_progressive, decodes via decodeImage") {
    val bytes = Multimodal.plantJpegProgressive(7L)
    assert(Multimodal.jpegKind(bytes) == "jpeg_progressive")
    assert(Multimodal.decodeImage(bytes).isDefined)
    val (fmt, w, h) = Multimodal.parseImageHeader(bytes)
    assert(fmt == "jpeg" && w == Multimodal.plantedWidth(7L) &&
      h == Multimodal.plantedHeight(7L))
  }

  test("truncated and corrupted progressive streams return None, never throw") {
    val good = Multimodal.plantJpegProgressive(11L)
    (1 until good.length by 7).foreach { n =>
      Multimodal.decodeJpeg(good.take(n)) // must not throw
    }
    // flip bytes inside the entropy data / headers
    (20 until good.length by 11).foreach { p =>
      val bad = good.clone(); bad(p) = (bad(p) ^ 0x55).toByte
      Multimodal.decodeJpeg(bad) // must not throw
    }
  }

  // ---- spec-local grayscale encoders over arbitrary coefficients ----

  /** MSB-first bit writer with 0xFF stuffing (mirror of the
    * production writer, local so the test is self-contained). */
  private final class BW(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def put(bits: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { putBit((bits >>> i) & 1); i -= 1 }
    }
    private def putBit(v: Int): Unit = {
      acc = (acc << 1) | v; n += 1
      if (n == 8) { out.write(acc); if (acc == 0xff) out.write(0); acc = 0; n = 0 }
    }
    def flush(): Unit = while (n != 0) putBit(1)
  }

  /** Zigzag index k (0..63) → natural order, same table as the codec. */
  private val zig: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // AC Huffman table for both encoders: EOB, ZRL, and (r, s≤3) for
  // every run — 50 symbols, all canonical at length 6 (max code 49,
  // not all-ones). Symbol order IS code order.
  private val acSyms: Seq[Int] =
    Seq(0x00, 0xf0) ++ (for (r <- 0 to 15; s <- 1 to 3) yield (r << 4) | s)
  private val acCode: Map[Int, Int] = acSyms.zipWithIndex.toMap

  private def cat(v: Int): Int = {
    val m = math.abs(v); var c = 0
    while ((1 << c) <= m) c += 1
    c
  }

  private def putSigned(bw: BW, v: Int, s: Int): Unit = {
    val enc = if (v >= 0) v else v + (1 << s) - 1
    bw.put(enc & ((1 << s) - 1), s)
  }

  /** Shared headers: SOI, DQT(all-ones → identity dequant), SOF(n),
    * DHT (DC: categories 0..11 at length 4; AC: [[acSyms]] at 6). */
  private def headers(out: java.io.ByteArrayOutputStream, w: Int, h: Int,
                      sofMarker: Int, dri: Int): Unit = {
    def b(v: Int): Unit = out.write(v & 0xff)
    def be16(v: Int): Unit = { b(v >>> 8); b(v) }
    b(0xff); b(0xd8)
    b(0xff); b(0xdb); be16(2 + 65); b(0); (0 until 64).foreach(_ => b(1))
    b(0xff); b(sofMarker); be16(8 + 3)
    b(8); be16(h); be16(w); b(1); b(1); b(0x11); b(0)
    b(0xff); b(0xc4); be16(2 + (17 + 12) + (17 + acSyms.size))
    b(0x00); { val bits = new Array[Int](16); bits(3) = 12; bits.foreach(b) }
    (0 to 11).foreach(b)
    b(0x10); { val bits = new Array[Int](16); bits(5) = acSyms.size; bits.foreach(b) }
    acSyms.foreach(b)
    if (dri > 0) { b(0xff); b(0xdd); be16(4); be16(dri) }
  }

  /** Baseline-sequential grayscale encode of quantized coefficient
    * blocks (zigzag order, one Array[Int](64) per 8×8 block,
    * blocks in raster order for a w×8·ceil(nBlocks·8/w) image). */
  private def encodeBaseline(blocks: Seq[Array[Int]], w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    headers(out, w, h, 0xc0, dri = 0)
    def b(v: Int): Unit = out.write(v & 0xff)
    def be16(v: Int): Unit = { b(v >>> 8); b(v) }
    b(0xff); b(0xda); be16(6 + 2); b(1); b(1); b(0x00); b(0); b(63); b(0)
    val bw = new BW(out)
    var pred = 0
    blocks.foreach { blk =>
      val diff = blk(0) - pred; pred = blk(0)
      val dc = cat(diff)
      bw.put(dc, 4)
      if (dc > 0) putSigned(bw, diff, dc)
      var k = 1; var run = 0
      while (k < 64) {
        if (blk(k) == 0) run += 1
        else {
          while (run > 15) { bw.put(acCode(0xf0), 6); run -= 16 }
          val s = cat(blk(k))
          bw.put(acCode((run << 4) | s), 6)
          putSigned(bw, blk(k), s)
          run = 0
        }
        k += 1
      }
      if (run > 0) bw.put(acCode(0x00), 6)
    }
    bw.flush()
    b(0xff); b(0xd9)
    out.toByteArray
  }

  /** Progressive grayscale encode of the SAME blocks with the
    * libjpeg-like script: DC first Al=1 → DC refine; AC 1..63 first
    * Al=1 → AC refine Al=0 (per-block EOB0 terminations; the §G.2.2.3
    * refine encoder interleaves newly-significant (r,1) symbols,
    * eager ZRL on 16 zero-history positions, and position-ordered
    * correction bits). `dri` > 0 inserts RSTn every `dri` blocks in
    * every scan (predictors and EOB state reset). */
  private def encodeProgressive(blocks: Seq[Array[Int]], w: Int, h: Int,
                                dri: Int = 0): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    headers(out, w, h, 0xc2, dri)
    def b(v: Int): Unit = out.write(v & 0xff)
    def be16(v: Int): Unit = { b(v >>> 8); b(v) }
    def sos(ss: Int, se: Int, ah: Int, al: Int): Unit = {
      b(0xff); b(0xda); be16(6 + 2); b(1); b(1); b(0x00)
      b(ss); b(se); b((ah << 4) | al)
    }
    // scan 1: DC first, Al=1
    sos(0, 0, 0, 1)
    var bw = new BW(out); var rst = 0; var pred = 0
    blocks.zipWithIndex.foreach { case (blk, bi) =>
      if (dri > 0 && bi > 0 && bi % dri == 0) {
        bw.flush(); b(0xff); b(0xd0 | rst); rst = (rst + 1) & 7
        bw = new BW(out); pred = 0
      }
      val v = blk(0) >> 1
      val diff = v - pred; pred = v
      val dc = cat(diff)
      bw.put(dc, 4)
      if (dc > 0) putSigned(bw, diff, dc)
    }
    bw.flush()
    // scan 2: DC refine, Al=0 — one raw bit per block
    sos(0, 0, 1, 0)
    bw = new BW(out); rst = 0
    blocks.zipWithIndex.foreach { case (blk, bi) =>
      if (dri > 0 && bi > 0 && bi % dri == 0) {
        bw.flush(); b(0xff); b(0xd0 | rst); rst = (rst + 1) & 7
        bw = new BW(out)
      }
      bw.put(blk(0) & 1, 1)
    }
    bw.flush()
    // scan 3: AC first, band 1..63, Al=1 — values sign·(|v|>>1)
    sos(1, 63, 0, 1)
    bw = new BW(out); rst = 0
    blocks.zipWithIndex.foreach { case (blk, bi) =>
      if (dri > 0 && bi > 0 && bi % dri == 0) {
        bw.flush(); b(0xff); b(0xd0 | rst); rst = (rst + 1) & 7
        bw = new BW(out)
      }
      var k = 1; var run = 0; var emitted = false
      while (k < 64) {
        val t0 = blk(k)
        val t = if (t0 >= 0) t0 >> 1 else -((-t0) >> 1)
        if (t == 0) run += 1
        else {
          while (run > 15) { bw.put(acCode(0xf0), 6); run -= 16 }
          val s = cat(t)
          bw.put(acCode((run << 4) | s), 6)
          putSigned(bw, t, s)
          run = 0; emitted = true
        }
        k += 1
      }
      if (run > 0 || !emitted) bw.put(acCode(0x00), 6) // EOB0
    }
    bw.flush()
    // scan 4: AC refine, Al=0 — §G.2.2.3 encoder
    sos(1, 63, 1, 0)
    bw = new BW(out); rst = 0
    blocks.zipWithIndex.foreach { case (blk, bi) =>
      if (dri > 0 && bi > 0 && bi % dri == 0) {
        bw.flush(); b(0xff); b(0xd0 | rst); rst = (rst + 1) & 7
        bw = new BW(out)
      }
      val pending = ArrayBuffer.empty[Int]
      def flushPending(): Unit = { pending.foreach(bit => bw.put(bit, 1)); pending.clear() }
      var r = 0
      var decoderK = 1 // decoder's k after its last symbol's advance
      var k = 1
      while (k < 64) {
        val v = blk(k)
        val hist = math.abs(v) >> 1
        if (hist != 0) pending += (math.abs(v) & 1)
        else if (v != 0) { // newly significant, |v| == 1
          bw.put(acCode((r << 4) | 1), 6)
          bw.put(if (v > 0) 1 else 0, 1)
          flushPending()
          r = 0
          decoderK = k + 1
        } else {
          r += 1
          if (r == 16) { // eager ZRL: decoder skips exactly 16 zero-history
            bw.put(acCode(0xf0), 6)
            flushPending()
            r = 0
            decoderK = k + 1
          }
        }
        k += 1
      }
      if (decoderK < 64) { // decoder still inside the band: EOB0 + tail corrections
        bw.put(acCode(0x00), 6)
        flushPending()
      }
    }
    bw.flush()
    b(0xff); b(0xd9)
    out.toByteArray
  }

  private def randomBlocks(seed: Int, n: Int, density: Double,
                           maxMag: Int): Seq[Array[Int]] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      val blk = new Array[Int](64)
      blk(0) = rnd.nextInt(201) - 100
      (1 until 64).foreach { k =>
        if (rnd.nextDouble() < density) {
          val m = 1 + rnd.nextInt(maxMag)
          blk(k) = if (rnd.nextBoolean()) m else -m
        }
      }
      blk
    }
  }

  private def roundTrip(blocks: Seq[Array[Int]], w: Int, h: Int,
                        dri: Int = 0, label: String): Unit = {
    val base = Multimodal.decodeJpeg(encodeBaseline(blocks, w, h))
    val prog = Multimodal.decodeJpeg(encodeProgressive(blocks, w, h, dri))
    assert(base.isDefined, s"$label: baseline decode failed")
    assert(prog.isDefined, s"$label: progressive decode failed")
    assert(base.get._1 == prog.get._1 && base.get._2 == prog.get._2, label)
    assert(java.util.Arrays.equals(base.get._3, prog.get._3),
      s"$label: progressive pixels differ from baseline")
  }

  test("nonzero-AC progressive scans agree with baseline on the same coefficients") {
    // 2 blocks, moderate density: newly-significant + history mix
    roundTrip(randomBlocks(1, 2, 0.25, 7), 16, 8, label = "sparse")
    // dense: many correction bits per symbol advance
    roundTrip(randomBlocks(2, 2, 0.7, 7), 16, 8, label = "dense")
    // |v| ≤ 1 everywhere: EVERY nonzero AC is newly-significant in
    // the refine scan (first AC scan codes nothing)
    roundTrip(randomBlocks(3, 4, 0.3, 1), 16, 16, label = "all-new")
    // very sparse: long zero runs → eager ZRL in the refine scan
    roundTrip(randomBlocks(4, 2, 0.03, 1), 16, 8, label = "zrl")
    // all-zero ACs: pure EOB scans
    roundTrip(randomBlocks(5, 2, 0.0, 1), 16, 8, label = "dc-only")
  }

  test("progressive restart markers reset predictors and EOB state") {
    roundTrip(randomBlocks(6, 4, 0.25, 7), 16, 16, dri = 1, label = "dri1")
    roundTrip(randomBlocks(7, 6, 0.4, 3), 16, 24, dri = 2, label = "dri2")
  }
}
