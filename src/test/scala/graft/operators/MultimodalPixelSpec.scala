package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The REAL PNG pixel codec, verified bit-for-bit: genuine zlib
  * IDAT (JDK Deflater/Inflater), chunk CRC32 validation, and all
  * five PNG scanline filters (None/Sub/Up/Average/Paeth) must
  * round-trip the planted arithmetic pixels exactly. Pure JVM — no
  * SparkSession. */
class MultimodalPixelSpec extends AnyFunSuite {

  private def expectedPixels(docId: Long): Array[Byte] = {
    val w = Multimodal.plantedWidth(docId)
    val h = Multimodal.plantedHeight(docId)
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      px((y * w + x) * 3 + c) = Multimodal.plantedPixel(docId, x, y, c).toByte
    px
  }

  test("planted PNGs decode to the exact planted pixels (all five filter types)") {
    // plantPng cycles the filter type y % 5, so any doc with h >= 5
    // exercises None, Sub, Up, Average AND Paeth in one image
    val tall = (0L until 40L by 2).filter(Multimodal.plantedHeight(_) >= 5)
    assert(tall.nonEmpty)
    (tall ++ Seq(0L, 2L, 4L, 6L, 100L, 123456L)).foreach { docId =>
      val Some((w, h, px)) = Multimodal.decodePng(Multimodal.plantPng(docId))
      assert(w == Multimodal.plantedWidth(docId))
      assert(h == Multimodal.plantedHeight(docId))
      assert(px.toSeq == expectedPixels(docId).toSeq, s"pixels differ for doc $docId")
    }
  }

  test("each individual filter type round-trips through filter/unfilter") {
    val w = 7
    val rnd = new scala.util.Random(42)
    (0 to 4).foreach { ft =>
      val prev = Array.fill(3 * w)(rnd.nextInt(256).toByte)
      val line = Array.fill(3 * w)(rnd.nextInt(256).toByte)
      val filtered = Multimodal.filterLine(ft, line, prev)
      val back = filtered.clone()
      Multimodal.unfilterLine(ft, back, prev)
      assert(back.toSeq == line.toSeq, s"filter type $ft did not round-trip")
    }
  }

  /** Rebuild a planted PNG with its IDAT split into two chunks —
    * decoders must concatenate IDAT payloads before inflating. */
  test("multi-chunk IDAT streams concatenate before inflate") {
    val one = Multimodal.plantPng(6L)
    def be32(i: Int): Int =
      ((one(i) & 0xff) << 24) | ((one(i + 1) & 0xff) << 16) |
        ((one(i + 2) & 0xff) << 8) | (one(i + 3) & 0xff)
    val idatLen = be32(33)
    assert(new String(one, 37, 4, "US-ASCII") == "IDAT" && idatLen > 4)
    val data = java.util.Arrays.copyOfRange(one, 41, 41 + idatLen)
    val out = new java.io.ByteArrayOutputStream()
    out.write(one, 0, 33) // signature + IHDR untouched
    Multimodal.writeChunk(out, "IDAT", data.take(idatLen / 2))
    Multimodal.writeChunk(out, "IDAT", data.drop(idatLen / 2))
    Multimodal.writeChunk(out, "IEND", Array.emptyByteArray)
    assert(Multimodal.decodePng(out.toByteArray).map(_._3.toSeq) ==
      Multimodal.decodePng(one).map(_._3.toSeq))
  }

  test("corrupt streams yield None: CRC flip, truncation, bad filter, wrong size") {
    val good = Multimodal.plantPng(8L)
    // flip one IDAT payload byte → chunk CRC32 mismatch
    val flipped = good.clone()
    flipped(45) = (flipped(45) ^ 0x40).toByte
    assert(Multimodal.decodePng(flipped).isEmpty)
    // truncate mid-IDAT
    assert(Multimodal.decodePng(good.take(good.length - 20)).isEmpty)
    // unknown scanline filter type (9) inside a well-formed chunk stream
    val w = Multimodal.plantedWidth(8L); val h = Multimodal.plantedHeight(8L)
    def rebuilt(raw: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(good, 0, 33)
      Multimodal.writeChunk(out, "IDAT", Multimodal.deflate(raw))
      Multimodal.writeChunk(out, "IEND", Array.emptyByteArray)
      out.toByteArray
    }
    val badFilter = new Array[Byte](h * (1 + 3 * w))
    (0 until h).foreach(y => badFilter(y * (1 + 3 * w)) = 9)
    assert(Multimodal.decodePng(rebuilt(badFilter)).isEmpty)
    // inflated size disagrees with IHDR dims (one extra scanline)
    assert(Multimodal.decodePng(rebuilt(new Array[Byte]((h + 1) * (1 + 3 * w)))).isEmpty)
    // unsupported IHDR class (grayscale color type) is refused, not mis-decoded
    val gray = good.clone()
    gray(25) = 0
    val td = java.util.Arrays.copyOfRange(gray, 12, 12 + 17)
    val crc = new java.util.zip.CRC32(); crc.update(td)
    val cv = crc.getValue.toInt
    gray(29) = (cv >>> 24).toByte; gray(30) = (cv >>> 16).toByte
    gray(31) = (cv >>> 8).toByte; gray(32) = cv.toByte
    assert(Multimodal.decodePng(gray).isEmpty)
  }

  test("decompression bomb: huge IHDR over a tiny IDAT is rejected before allocation") {
    // well-formed chunk stream (valid CRCs) claiming 4096×4096 RGB
    // (~50 MB filtered) backed by a few-byte IDAT: the 1032:1 zlib
    // ratio bound must refuse it up front — None, no OOM-sized buffers
    val out = new java.io.ByteArrayOutputStream()
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).foreach(out.write)
    val w = 4096; val h = 4096
    val ihdr = new Array[Byte](13)
    ihdr(0) = (w >>> 24).toByte; ihdr(1) = (w >>> 16).toByte
    ihdr(2) = (w >>> 8).toByte; ihdr(3) = w.toByte
    ihdr(4) = (h >>> 24).toByte; ihdr(5) = (h >>> 16).toByte
    ihdr(6) = (h >>> 8).toByte; ihdr(7) = h.toByte
    ihdr(8) = 8; ihdr(9) = 2
    Multimodal.writeChunk(out, "IHDR", ihdr)
    Multimodal.writeChunk(out, "IDAT", Multimodal.deflate(new Array[Byte](16)))
    Multimodal.writeChunk(out, "IEND", Array.emptyByteArray)
    val bomb = out.toByteArray
    assert(bomb.length < 200)
    assert(Multimodal.decodePng(bomb).isEmpty)
  }

  test("JPEG walk honors fill bytes and standalone markers (RSTn/TEM)") {
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    out.write(0xff); out.write(0xff) // legal fill padding
    out.write(0xff); out.write(0x01) // TEM: standalone, no length
    out.write(0xff); out.write(0xd0) // RST0: standalone, no length
    out.write(0xff); out.write(0xc0) // SOF0
    out.write(0x00); out.write(11)   // length
    out.write(8)
    out.write(0x01); out.write(0x18) // height 280
    out.write(0x02); out.write(0x30) // width 560
    out.write(3); (1 to 3).foreach { c => out.write(c); out.write(0x11); out.write(0) }
    assert(Multimodal.parseImageHeader(out.toByteArray) == (("jpeg", 560, 280)))
    // EOI before any SOF → no dims, reported corrupt, no overrun
    val eoi = Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)
    assert(Multimodal.parseImageHeader(eoi) == (("corrupt", -1, -1)))
  }

  /** Independent recomputation of the planted JPEG's decoded RGB:
    * per-pixel luma from the 8×8 block grid, constant chroma, and
    * the exact integer JFIF conversion. */
  private def expectedJpegRgb(docId: Long): Array[Byte] = {
    val w = Multimodal.plantedWidth(docId)
    val h = Multimodal.plantedHeight(docId)
    val cb = Multimodal.plantedCb(docId)
    val cr = Multimodal.plantedCr(docId)
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val yv = Multimodal.plantedY(docId, x / 8, y / 8)
      val (r, g, b) = Multimodal.yccToRgbE6(yv, cb, cr)
      px((y * w + x) * 3) = r.toByte
      px((y * w + x) * 3 + 1) = g.toByte
      px((y * w + x) * 3 + 2) = b.toByte
    }
    px
  }

  test("planted JPEGs decode to the exact planted content (baseline 4:2:0)") {
    // span the width/height moduli so both 1- and 2-block-wide/tall
    // crops (and every APP0 pad length) are exercised
    ((1L until 32L by 2) ++ Seq(101L, 999L, 123457L)).foreach { docId =>
      val jpeg = Multimodal.plantJpeg(docId)
      val Some((w, h, px)) = Multimodal.decodeJpeg(jpeg)
      assert(w == Multimodal.plantedWidth(docId))
      assert(h == Multimodal.plantedHeight(docId))
      assert(px.toSeq == expectedJpegRgb(docId).toSeq, s"pixels differ for doc $docId")
      // decodeImage dispatches by magic bytes to the same result
      assert(Multimodal.decodeImage(jpeg).map(_._3.toSeq) == Some(px.toSeq))
    }
  }

  test("JPEG decoder rejects unsupported frames and malformed streams") {
    val good = Multimodal.plantJpeg(7L)
    // a sequential stream relabeled SOF2 is a MALFORMED progressive
    // frame (its full-band interleaved scan is illegal in §G) — the
    // now-supported progressive path must reject it, not mis-decode
    val sof = good.indexOfSlice(Seq(0xff.toByte, 0xc0.toByte))
    assert(sof > 0)
    val progressive = good.clone(); progressive(sof + 1) = 0xc2.toByte
    assert(Multimodal.decodeJpeg(progressive).isEmpty)
    // truncated entropy stream → None, never a throw or a short image
    assert(Multimodal.decodeJpeg(good.take(good.length - 4)).isEmpty)
    // a marker byte not followed by a stuffed zero inside the scan → None
    assert(Multimodal.decodeJpeg(Array[Byte](0xff.toByte, 0xd8.toByte)).isEmpty)
  }

  /** Test-local MSB-first entropy bit writer with byte stuffing —
    * independent of the production encoder. */
  private class Bw(out: java.io.ByteArrayOutputStream) {
    private var acc = 0; private var n = 0
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

  /** Hand-built GRAYSCALE baseline JPEG header (1 component, 4:4:4,
    * Q(0,0)=8 / rest 16, canonical DC table for categories 0-8 at
    * length 4, AC table {EOB, (0,1), ZRL} at length 2, optional DRI).
    * Exercises paths the planted fixtures never reach: single-
    * component scans, multi-MCU images, restart markers, and real
    * AC run-length coefficients. */
  private def grayHeader(w: Int, h: Int, dri: Int): java.io.ByteArrayOutputStream = {
    val bos = new java.io.ByteArrayOutputStream()
    def b(v: Int): Unit = bos.write(v & 0xff)
    def be16(v: Int): Unit = { b(v >>> 8); b(v) }
    b(0xff); b(0xd8)
    b(0xff); b(0xdb); be16(2 + 65); b(0); b(8); (1 until 64).foreach(_ => b(16))
    b(0xff); b(0xc0); be16(8 + 3); b(8); be16(h); be16(w); b(1); b(1); b(0x11); b(0)
    b(0xff); b(0xc4); be16(2 + (17 + 9) + (17 + 3))
    b(0x00); val bits = new Array[Int](16); bits(3) = 9
    bits.foreach(b); (0 to 8).foreach(b)
    b(0x10); val ab = new Array[Int](16); ab(1) = 3
    ab.foreach(b); Seq(0x00, 0x01, 0xf0).foreach(b) // codes 00, 01, 10
    if (dri > 0) { b(0xff); b(0xdd); be16(4); be16(dri) }
    b(0xff); b(0xda); be16(6 + 2); b(1); b(1); b(0x00); b(0); b(63); b(0)
    bos
  }

  private def putDc(bw: Bw, diff: Int): Unit = {
    val mag = math.abs(diff)
    var cat = 0
    while ((1 << cat) <= mag) cat += 1
    bw.put(cat, 4)
    if (cat > 0) {
      val v = if (diff >= 0) diff else diff + (1 << cat) - 1
      bw.put(v & ((1 << cat) - 1), cat)
    }
  }

  test("grayscale multi-MCU JPEG with restart markers decodes (DRI/RSTn + DC reset)") {
    // 16x8 grayscale: two 8x8 MCUs, DRI=1 -> RST0 between them and the
    // DC predictor must reset (the second block's diff is from 0, not
    // from the first block's DC)
    val bos = grayHeader(16, 8, dri = 1)
    val bw = new Bw(bos)
    putDc(bw, 40 - 128); bw.put(0, 2)  // MCU0: DC-only, EOB (code 00)
    bw.flush()
    bos.write(0xff); bos.write(0xd0)   // RST0
    val bw2 = new Bw(bos)
    putDc(bw2, 200 - 128); bw2.put(0, 2) // MCU1 after predictor reset
    bw2.flush()
    bos.write(0xff); bos.write(0xd9)
    val Some((w, h, px)) = Multimodal.decodeJpeg(bos.toByteArray)
    assert(w == 16 && h == 8)
    for (y <- 0 until 8; x <- 0 until 16; c <- 0 until 3) {
      val expect = if (x < 8) 40 else 200
      assert((px((y * 16 + x) * 3 + c) & 0xff) == expect,
        s"($x,$y,$c) = ${px((y * 16 + x) * 3 + c) & 0xff}, want $expect")
    }
  }

  test("AC run-length path: zigzag placement, ZRL, dequant, IDCT of non-DC blocks") {
    // single 8x8 grayscale block: DC=0, AC at zigzag k=1 -> +1, then
    // ZRL (16 zeros), AC at zigzag k=18 -> -1, EOB
    val bos = grayHeader(8, 8, dri = 0)
    val bw = new Bw(bos)
    putDc(bw, 0)
    bw.put(1, 2); bw.put(1, 1) // (run 0, size 1) code 01, value bit 1 -> +1
    bw.put(2, 2)               // ZRL code 10
    bw.put(1, 2); bw.put(0, 1) // (run 0, size 1), value bit 0 -> extend = -1
    bw.put(0, 2)               // EOB code 00
    bw.flush()
    bos.write(0xff); bos.write(0xd9)
    val Some((w, h, px)) = Multimodal.decodeJpeg(bos.toByteArray)
    assert(w == 8 && h == 8)
    // independent expected pixels: dequantized natural-order coefs
    // (zigzag 1 -> natural 1; after ZRL, zigzag 18 -> natural 26),
    // direct double IDCT, +128 level shift, round, clamp
    val coef = new Array[Double](64)
    coef(1) = 1 * 16.0   // q[k>=1] = 16
    coef(26) = -1 * 16.0
    def c0(u: Int) = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    for (y <- 0 until 8; x <- 0 until 8; ch <- 0 until 3) {
      var s = 0.0
      for (v <- 0 until 8; u <- 0 until 8)
        s += c0(u) * c0(v) * coef(v * 8 + u) *
          math.cos((2 * x + 1) * u * math.Pi / 16.0) *
          math.cos((2 * y + 1) * v * math.Pi / 16.0)
      val expect = math.max(0, math.min(255, math.floor(0.25 * s + 128.5).toInt))
      assert((px((y * 8 + x) * 3 + ch) & 0xff) == expect,
        s"($x,$y) = ${px((y * 8 + x) * 3 + ch) & 0xff}, want $expect")
    }
  }

  /** Hand-built 3-component COLOR baseline header with parametric
    * luma sampling — (2,2)=4:2:0 is covered by the planted fixtures;
    * this builder reaches the 4:4:4 (1,1) and 4:2:2 (2,1) geometries
    * real crawl data carries. One shared Q table (Q(0,0)=8, rest 16)
    * and the grayscale tests' DC/AC tables, used by all components. */
  private def colorHeader(w: Int, h: Int, hy: Int, vy: Int): java.io.ByteArrayOutputStream = {
    val bos = new java.io.ByteArrayOutputStream()
    def b(v: Int): Unit = bos.write(v & 0xff)
    def be16(v: Int): Unit = { b(v >>> 8); b(v) }
    b(0xff); b(0xd8)
    b(0xff); b(0xdb); be16(2 + 65); b(0); b(8); (1 until 64).foreach(_ => b(16))
    b(0xff); b(0xc0); be16(8 + 9); b(8); be16(h); be16(w); b(3)
    b(1); b((hy << 4) | vy); b(0)
    b(2); b(0x11); b(0)
    b(3); b(0x11); b(0)
    b(0xff); b(0xc4); be16(2 + (17 + 9) + (17 + 3))
    b(0x00); val bits = new Array[Int](16); bits(3) = 9
    bits.foreach(b); (0 to 8).foreach(b)
    b(0x10); val ab = new Array[Int](16); ab(1) = 3
    ab.foreach(b); Seq(0x00, 0x01, 0xf0).foreach(b)
    b(0xff); b(0xda); be16(6 + 6); b(3)
    b(1); b(0x00); b(2); b(0x00); b(3); b(0x00); b(0); b(63); b(0)
    bos
  }

  /** DC-only interleaved color scan: per MCU, the Y blocks in
    * (by, bx) order then one Cb and one Cr block, each DC+EOB;
    * per-component differential predictors as §F.1.1.5.1. */
  private def colorJpeg(w: Int, h: Int, hy: Int, vy: Int,
                        yDc: (Int, Int) => Int, cbDc: Int => Int,
                        crDc: Int => Int): Array[Byte] = {
    val bos = colorHeader(w, h, hy, vy)
    val bw = new Bw(bos)
    val mcuW = (w + 8 * hy - 1) / (8 * hy)
    val mcuH = (h + 8 * vy - 1) / (8 * vy)
    val pred = new Array[Int](3)
    def block(c: Int, dc: Int): Unit = {
      putDc(bw, dc - pred(c)); pred(c) = dc
      bw.put(0, 2) // EOB
    }
    var m = 0
    for (my <- 0 until mcuH; mx <- 0 until mcuW) {
      for (by <- 0 until vy; bx <- 0 until hy)
        block(0, yDc(mx * hy + bx, my * vy + by) - 128)
      block(1, cbDc(m) - 128)
      block(2, crDc(m) - 128)
      m += 1
    }
    bw.flush()
    bos.write(0xff); bos.write(0xd9)
    bos.toByteArray
  }

  test("4:4:4 color JPEG decodes exactly (no chroma subsampling)") {
    // 16x8 = two MCUs of one block per component; every component
    // changes across the MCU boundary so the per-component DC
    // predictors and the identity upsample are both on the path
    val yv = Array(40, 200); val cb = Array(100, 140); val cr = Array(90, 160)
    val jpeg = colorJpeg(16, 8, hy = 1, vy = 1,
      (bx, _) => yv(bx), m => cb(m), m => cr(m))
    val Some((w, h, px)) = Multimodal.decodeJpeg(jpeg)
    assert(w == 16 && h == 8)
    for (y <- 0 until 8; x <- 0 until 16) {
      val b = x / 8
      val (er, eg, eb) = Multimodal.yccToRgbE6(yv(b), cb(b), cr(b))
      val o = (y * 16 + x) * 3
      assert((px(o) & 0xff) == er && (px(o + 1) & 0xff) == eg
        && (px(o + 2) & 0xff) == eb, s"($x,$y) differs")
    }
  }

  test("4:2:2 color JPEG decodes exactly (horizontal-only subsampling + crop)") {
    // 24x8, MCU = 16x8: two MCUs, the second horizontally cropped.
    // Luma block x/8 ∈ {0,1,2}; chroma sample index x/2 crosses its
    // block boundary at x=16, so the x·compH/hmax mapping is exercised
    // across blocks, not just within one
    val yv = Array(40, 80, 120, 220) // 4th block cropped away
    val cb = Array(100, 140); val cr = Array(90, 160)
    val jpeg = colorJpeg(24, 8, hy = 2, vy = 1,
      (bx, _) => yv(bx), m => cb(m), m => cr(m))
    val Some((w, h, px)) = Multimodal.decodeJpeg(jpeg)
    assert(w == 24 && h == 8)
    for (y <- 0 until 8; x <- 0 until 24) {
      val m = (x / 2) / 8 // chroma block after x·1/2 downmap
      val (er, eg, eb) = Multimodal.yccToRgbE6(yv(x / 8), cb(m), cr(m))
      val o = (y * 24 + x) * 3
      assert((px(o) & 0xff) == er && (px(o + 1) & 0xff) == eg
        && (px(o + 2) & 0xff) == eb, s"($x,$y) differs")
    }
  }

  test("JPEG entropy data is genuinely Huffman-coded (DC bits present)") {
    // two docs with different planted luma must differ in the entropy
    // payload, not only in headers — and corrupting one entropy byte
    // must change or kill the decode, proving the bits are read
    val a = Multimodal.plantJpeg(1L)
    val scanA = a.indexOfSlice(Seq(0xff.toByte, 0xda.toByte))
    assert(scanA > 0)
    val first = scanA + 14 // SOS segment is 14 bytes; first entropy byte after it
    val mutated = a.clone()
    mutated(first) = (mutated(first) ^ 0x55).toByte
    val orig = Multimodal.decodeJpeg(a)
    val got = Multimodal.decodeJpeg(mutated)
    assert(got.isEmpty || got.map(_._3.toSeq) != orig.map(_._3.toSeq),
      "flipping entropy bits changed nothing — the payload is not being decoded")
  }

  test("jpegKind separates progressive from corrupt (the crawl rejection taxonomy)") {
    // a real planted baseline stream classifies as baseline
    val base = Multimodal.plantJpeg(3L)
    assert(Multimodal.jpegKind(base) == "jpeg_baseline")
    // the same stream with its SOF0 marker rewritten to SOF2 is a
    // PROGRESSIVE frame: decodeJpeg must still reject it (None), but
    // the classifier must name it, not lump it with corrupt
    val sof = base.indexOfSlice(Seq(0xff.toByte, 0xc0.toByte))
    assert(sof > 0)
    val prog = base.clone()
    prog(sof + 1) = 0xc2.toByte
    assert(Multimodal.decodeJpeg(prog).isEmpty, "progressive must not decode")
    assert(Multimodal.jpegKind(prog) == "jpeg_progressive")
    // APPn/COM segments before the frame header are walked, not assumed
    val app = Array(0xff, 0xd8, 0xff, 0xe0, 0x00, 0x04, 0x4a, 0x46,
      0xff, 0xfe, 0x00, 0x03, 0x21, 0xff, 0xc2, 0x00, 0x0b).map(_.toByte)
    assert(Multimodal.jpegKind(app) == "jpeg_progressive")
    // lossless (SOF3) is unsupported-but-valid — its own class
    val lossless = app.clone(); lossless(14) = 0xc3.toByte
    assert(Multimodal.jpegKind(lossless) == "jpeg_unsupported")
    // EOI before any frame header, truncation mid-walk: corrupt
    assert(Multimodal.jpegKind(Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte))
      == "jpeg_corrupt")
    assert(Multimodal.jpegKind(Array(0xff, 0xd8, 0xff, 0xe0, 0x40, 0x00)
      .map(_.toByte)) == "jpeg_corrupt")
    // non-JPEG containers
    assert(Multimodal.jpegKind(Multimodal.plantPng(2L)) == "png")
    assert(Multimodal.jpegKind("plain text".getBytes) == "unknown")
    assert(Multimodal.jpegKind(Array.emptyByteArray) == "unknown")
  }
}
