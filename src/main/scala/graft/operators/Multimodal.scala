package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, decoded/feature-extracted in batched partition
  * passes (the JVM analogue of an Arrow-batched Pandas UDF), with
  * partition-parallel execution and no shuffle.
  *
  * Both codecs are REAL and dependency-free:
  *  - PNG: planted fixtures carry genuine zlib-compressed IDAT
  *    scanlines (java.util.zip Deflater at plant time), and
  *    [[decodePng]] walks the chunk stream (CRC32-validated),
  *    inflates with java.util.zip.Inflater, and unfilters all five
  *    PNG filter types (None/Sub/Up/Average/Paeth, per the public
  *    PNG spec) to recover actual pixels.
  *  - JPEG: planted fixtures are complete baseline-sequential 4:2:0
  *    JPEGs (ITU T.81) with real Huffman-coded entropy data, and
  *    [[decodeJpeg]] runs the full baseline pipeline — segment walk,
  *    canonical Huffman decode with byte unstuffing, differential DC
  *    prediction, dequantization, separable IDCT, chroma upsampling,
  *    and exact-integer JFIF YCbCr→RGB ([[yccToRgbE6]]). The planted
  *    blocks are DC-only, which makes the lossy format lossless by
  *    construction, so oracles recompute the decoded pixels in pure
  *    arithmetic.
  * The emitted features are the real per-channel sums/means of the
  * decoded pixels for BOTH formats.
  */
object Multimodal {

  final case class MediaMeta(doc_id: Long, n_bytes: Int, format: String,
                             width: Int, height: Int, features: Array[Float],
                             chan_sums: Array[Long], n_px: Long)

  /** Attach a binary "media" column. With real data this is the raw
    * image/audio payload; here it is the utf-8 payload of `text`. */
  def withBinary(docs: DataFrame): DataFrame =
    docs.withColumn("media", encode(col("text"), "utf-8"))

  /** Deterministic planted dimensions for the synthetic fixture (the
    * DuckDB oracle recomputes these arithmetically; the Spark path
    * recovers them by PARSING the planted header bytes, so a broken
    * parser hash-mismatches the oracle). Small moduli keep the
    * planted PNG pixel grids (w·h·3 bytes) fixture-sized. */
  def plantedWidth(docId: Long): Int = ((docId * 31 + 7) % 13 + 4).toInt
  def plantedHeight(docId: Long): Int = ((docId * 17 + 3) % 11 + 3).toInt

  /** Deterministic planted pixel value at (x, y, channel) — pure
    * arithmetic, so the DuckDB oracle recomputes the decoded image
    * (and any feature of it) independently of the codec. */
  def plantedPixel(docId: Long, x: Int, y: Int, c: Int): Int =
    ((docId * 7 + y.toLong * 31 + x.toLong * 13 + c.toLong * 97) % 256).toInt

  /** Planted JPEG content, defined in YCbCr: luma is constant per
    * 8×8 block (one value per block coordinate, so the decoder's DC
    * prediction chain across the MCU's four Y blocks is exercised),
    * chroma is constant per image (one 4:2:0 subsampled block).
    * DC-only blocks make baseline JPEG LOSSLESS by construction —
    * a constant block's FDCT has a single DC coefficient 8·(v−128),
    * which quantizes exactly with Q(0,0)=8 — so the oracle can
    * recompute the decoded pixels arithmetically. */
  def plantedY(docId: Long, bx: Int, by: Int): Int =
    ((docId * 11 + bx.toLong * 53 + by.toLong * 29) % 256).toInt
  def plantedCb(docId: Long): Int = ((docId * 19 + 35) % 256).toInt
  def plantedCr(docId: Long): Int = ((docId * 23 + 71) % 256).toInt

  /** JFIF YCbCr→RGB in EXACT e6 integer fixed point (coefficients
    * 1.402 / 0.344136 / 0.714136 / 1.772 scaled by 10^6, round via
    * +500000, floor-divide). The +256·10^6 offset keeps every
    * numerator positive so truncating division (Spark `div`, DuckDB
    * `//`) equals floor division in both engines — the conversion is
    * bit-identical in Scala, Spark SQL, and DuckDB with no
    * transcendental or float drift at all. */
  def yccToRgbE6(y: Int, cb: Int, cr: Int): (Int, Int, Int) = {
    def cl(v: Long): Int = math.min(255L, math.max(0L, v)).toInt
    val r = cl((1000000L * y + 1402000L * (cr - 128) + 500000L + 256000000L) / 1000000L - 256L)
    val g = cl((1000000L * y - 344136L * (cb - 128) - 714136L * (cr - 128) + 500000L + 256000000L) / 1000000L - 256L)
    val b = cl((1000000L * y + 1772000L * (cb - 128) + 500000L + 256000000L) / 1000000L - 256L)
    (r, g, b)
  }

  private def crc32(bytes: Array[Byte], off: Int, len: Int): Int = {
    val crc = new java.util.zip.CRC32()
    crc.update(bytes, off, len)
    crc.getValue.toInt
  }

  private[operators] def writeChunk(out: java.io.ByteArrayOutputStream, chunkType: String,
                                    data: Array[Byte]): Unit = {
    def be32(v: Int): Unit = {
      out.write(v >>> 24 & 0xff); out.write(v >>> 16 & 0xff)
      out.write(v >>> 8 & 0xff); out.write(v & 0xff)
    }
    be32(data.length)
    val td = chunkType.getBytes("US-ASCII") ++ data
    out.write(td, 0, td.length)
    be32(crc32(td, 0, td.length))
  }

  /** Apply PNG filter `ft` (0-4) to scanline `raw` given the prior
    * unfiltered scanline (`prev`, all-zero for the first row), bpp=3.
    * Plant-time counterpart of [[unfilterLine]]; both implement the
    * public PNG spec's filter algorithms. */
  private[operators] def filterLine(ft: Int, raw: Array[Byte], prev: Array[Byte]): Array[Byte] = {
    val n = raw.length
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val a = if (i >= 3) raw(i - 3) & 0xff else 0 // left
      val b = prev(i) & 0xff                       // up
      val cc = if (i >= 3) prev(i - 3) & 0xff else 0 // up-left
      val x = raw(i) & 0xff
      val pred = ft match {
        case 0 => 0
        case 1 => a
        case 2 => b
        case 3 => (a + b) / 2
        case 4 => paeth(a, b, cc)
      }
      out(i) = ((x - pred) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Invert PNG filter `ft` in place over `line` (bpp=3). */
  private[operators] def unfilterLine(ft: Int, line: Array[Byte], prev: Array[Byte]): Unit = {
    val n = line.length
    var i = 0
    while (i < n) {
      val a = if (i >= 3) line(i - 3) & 0xff else 0
      val b = prev(i) & 0xff
      val cc = if (i >= 3) prev(i - 3) & 0xff else 0
      val pred = ft match {
        case 0 => 0
        case 1 => a
        case 2 => b
        case 3 => (a + b) / 2
        case 4 => paeth(a, b, cc)
      }
      line(i) = (((line(i) & 0xff) + pred) & 0xff).toByte
      i += 1
    }
  }

  /** Paeth predictor, verbatim from the public PNG specification. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Build a COMPLETE valid PNG for the fixture: signature, IHDR
    * (8-bit truecolor), IDAT carrying genuinely zlib-compressed
    * filtered scanlines (filter type cycles y % 5, covering all five
    * PNG filters), IEND. Pixels follow [[plantedPixel]] so the image
    * content is arithmetic-recomputable by the oracle while the byte
    * stream itself must survive real inflate + unfilter. */
  def plantPng(docId: Long): Array[Byte] = {
    val w = plantedWidth(docId)
    val h = plantedHeight(docId)
    val out = new java.io.ByteArrayOutputStream(64 + h * (1 + 3 * w))
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).foreach(out.write)
    val ihdr = new Array[Byte](13)
    ihdr(0) = (w >>> 24).toByte; ihdr(1) = (w >>> 16).toByte
    ihdr(2) = (w >>> 8).toByte; ihdr(3) = w.toByte
    ihdr(4) = (h >>> 24).toByte; ihdr(5) = (h >>> 16).toByte
    ihdr(6) = (h >>> 8).toByte; ihdr(7) = h.toByte
    ihdr(8) = 8; ihdr(9) = 2 // bit depth 8, color type 2 (truecolor)
    writeChunk(out, "IHDR", ihdr)
    // filtered scanline stream: [filter byte][3w filtered bytes] × h
    val raw = new java.io.ByteArrayOutputStream(h * (1 + 3 * w))
    var prev = new Array[Byte](3 * w)
    var y = 0
    while (y < h) {
      val line = new Array[Byte](3 * w)
      var x = 0
      while (x < w) {
        var c = 0
        while (c < 3) { line(3 * x + c) = plantedPixel(docId, x, y, c).toByte; c += 1 }
        x += 1
      }
      val ft = y % 5
      raw.write(ft)
      val filtered = filterLine(ft, line, prev)
      raw.write(filtered, 0, filtered.length)
      prev = line
      y += 1
    }
    writeChunk(out, "IDAT", deflate(raw.toByteArray))
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Genuine zlib compression via the JDK Deflater (default level —
    * fixed/dynamic Huffman blocks as the codec chooses). */
  private[operators] def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 32)
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Build the fixture media bytes: even doc_ids get the complete
    * pixel-bearing PNG from [[plantPng]]; odd doc_ids get the
    * complete pixel-bearing baseline JPEG from [[plantJpeg]]. The
    * `payload` argument is retained for API stability but no longer
    * embedded — the JPEG entropy-coded data is now real. */
  def plantHeader(docId: Long, payload: Array[Byte]): Array[Byte] =
    if (docId % 2 == 0) plantPng(docId) else plantJpeg(docId)

  /** DC quantization step for planted JPEGs: the planted constant
    * blocks have FDCT DC = 8·(v−128), so Q(0,0)=8 makes the
    * quantized DC exactly v−128 — a lossless round trip. */
  private final val JpegDcQ = 8

  /** MSB-first JPEG entropy bit writer with mandatory 0xFF→0xFF00
    * byte stuffing; flush pads the final byte with 1-bits per the
    * public JPEG spec (ITU T.81 §B.1.1.5/F.1.2.3). */
  private final class JpegBitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def put(bits: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { putBit((bits >>> i) & 1); i -= 1 }
    }
    private def putBit(v: Int): Unit = {
      acc = (acc << 1) | v; n += 1
      if (n == 8) {
        out.write(acc)
        if (acc == 0xff) out.write(0) // byte stuffing
        acc = 0; n = 0
      }
    }
    def flush(): Unit = while (n != 0) putBit(1)
  }

  /** Build a COMPLETE valid baseline-sequential 4:2:0 JPEG (ITU
    * T.81): SOI, APP0/JFIF with (docId % 8) pad bytes — so the
    * frame-header offset VARIES per doc and a fixed-offset "parser"
    * fails — DQT (luma + chroma tables, Q(0,0)=[[JpegDcQ]]), SOF0
    * (Y sampled 2×2, Cb/Cr 1×1), DHT (canonical DC tables for
    * categories 0–8 at uniform code length 4; one-entry AC tables
    * whose single symbol is EOB at code length 1), SOS, and real
    * Huffman-coded entropy data: one 16×16 MCU = 4 Y blocks + Cb +
    * Cr, each DC-only with differential DC prediction per component
    * and an EOB, byte-stuffed. Content follows [[plantedY]]/
    * [[plantedCb]]/[[plantedCr]] so the decoded image is
    * arithmetic-recomputable by the oracle while the byte stream
    * must survive a real Huffman + dequant + IDCT + upsample +
    * color-convert decode. */
  def plantJpeg(docId: Long): Array[Byte] = {
    val w = plantedWidth(docId)
    val h = plantedHeight(docId)
    val out = new java.io.ByteArrayOutputStream(320)
    def b(v: Int): Unit = out.write(v & 0xff)
    def be16(v: Int): Unit = { b(v >>> 8); b(v) }
    b(0xff); b(0xd8)                                  // SOI
    val pad = (docId % 8).toInt
    b(0xff); b(0xe0); be16(16 + pad)                  // APP0, len incl. itself
    out.write("JFIF".getBytes("US-ASCII")); b(0)
    b(1); b(1)                                        // version
    b(0); be16(72); be16(72)                          // density
    b(0); b(0)                                        // thumbnail
    (0 until pad).foreach(_ => b(0))
    // DQT: table 0 (luma) + table 1 (chroma), 8-bit precision. Only
    // Q(0,0) matters (all ACs are zero); the rest is an arbitrary 16.
    b(0xff); b(0xdb); be16(2 + 2 * 65)
    (0 to 1).foreach { id => b(id); b(JpegDcQ); (1 until 64).foreach(_ => b(16)) }
    // SOF0: baseline, 4:2:0 — Y h=2,v=2 (q-table 0); Cb/Cr 1,1 (q-table 1)
    b(0xff); b(0xc0); be16(8 + 3 * 3)
    b(8); be16(h); be16(w); b(3)
    b(1); b(0x22); b(0)
    b(2); b(0x11); b(1)
    b(3); b(0x11); b(1)
    // DHT: four tables in one segment. DC 0/1: 9 symbols (categories
    // 0..8) all at length 4 → canonical codes 0000..1000. AC 0/1: the
    // single EOB symbol (0x00) at length 1 → code '0'. DC-only blocks
    // never need another AC code, and neither table uses the
    // forbidden all-ones code.
    b(0xff); b(0xc4); be16(2 + 2 * (17 + 9) + 2 * (17 + 1))
    (0 to 1).foreach { id =>
      b(0x00 | id)                                    // class 0 = DC
      val bits = new Array[Int](16); bits(3) = 9
      bits.foreach(b); (0 to 8).foreach(b)
      b(0x10 | id)                                    // class 1 = AC
      val abits = new Array[Int](16); abits(0) = 1
      abits.foreach(b); b(0x00)
    }
    // SOS: 3 components, Y→tables (0,0), Cb/Cr→tables (1,1)
    b(0xff); b(0xda); be16(6 + 2 * 3)
    b(3); b(1); b(0x00); b(2); b(0x11); b(3); b(0x11)
    b(0); b(63); b(0)
    // entropy-coded data: single MCU, Y blocks in raster order then
    // Cb, Cr; each block = Huffman(DC category) + category bits + EOB
    val bw = new JpegBitWriter(out)
    def putBlock(dc: Int, pred: Int): Int = {
      val diff = dc - pred
      val mag = math.abs(diff)
      var cat = 0
      while ((1 << cat) <= mag) cat += 1
      bw.put(cat, 4)                                  // canonical code == symbol index
      if (cat > 0) {
        val v = if (diff >= 0) diff else diff + (1 << cat) - 1
        bw.put(v & ((1 << cat) - 1), cat)
      }
      bw.put(0, 1)                                    // EOB (1-bit code '0')
      dc
    }
    var predY = 0
    Seq((0, 0), (1, 0), (0, 1), (1, 1)).foreach { case (bx, by) =>
      predY = putBlock(plantedY(docId, bx, by) - 128, predY)
    }
    putBlock(plantedCb(docId) - 128, 0)
    putBlock(plantedCr(docId) - 128, 0)
    bw.flush()
    b(0xff); b(0xd9)                                  // EOI
    out.toByteArray
  }

  /** PROGRESSIVE twin of [[plantJpeg]]: the same planted 4:2:0
    * DC-only content re-coded as a multi-scan SOF2 stream exercising
    * every progressive scan kind a decoder must handle —
    *
    *  1. interleaved DC first at successive-approximation Al=1
    *     (codes each quantized DC arithmetically shifted right once,
    *     differentially per component);
    *  2. interleaved DC refinement (Ah=1→Al=0): one raw bit per
    *     block restoring the dropped low bit (two's complement makes
    *     `(dc>>1)<<1 + (dc&1) = dc` exact for negatives too);
    *  3-5. per-component AC first scans over the full 1..63 band
    *     whose blocks are all end-of-band — coded as a single EOBn
    *     run per component (run length = that component's block
    *     count), so the EOB-run machinery is on the decode path.
    *
    * The pixel content is identical to [[plantJpeg]]'s by
    * construction, so the SAME oracle arithmetic verifies the
    * progressive decode exactly. */
  def plantJpegProgressive(docId: Long): Array[Byte] = {
    val w = plantedWidth(docId)
    val h = plantedHeight(docId)
    val out = new java.io.ByteArrayOutputStream(360)
    def b(v: Int): Unit = out.write(v & 0xff)
    def be16(v: Int): Unit = { b(v >>> 8); b(v) }
    b(0xff); b(0xd8)                                  // SOI
    val pad = (docId % 8).toInt
    b(0xff); b(0xe0); be16(16 + pad)                  // APP0 (varying offset)
    out.write("JFIF".getBytes("US-ASCII")); b(0)
    b(1); b(1); b(0); be16(72); be16(72); b(0); b(0)
    (0 until pad).foreach(_ => b(0))
    b(0xff); b(0xdb); be16(2 + 2 * 65)                // DQT luma + chroma
    (0 to 1).foreach { id => b(id); b(JpegDcQ); (1 until 64).foreach(_ => b(16)) }
    // SOF2: progressive, same geometry/sampling as the baseline twin
    b(0xff); b(0xc2); be16(8 + 3 * 3)
    b(8); be16(h); be16(w); b(3)
    b(1); b(0x22); b(0)
    b(2); b(0x11); b(1)
    b(3); b(0x11); b(1)
    // DHT: DC 0/1 as baseline (categories 0..8, 4-bit codes); AC 0/1
    // carry the three EOBn symbols needed here — EOB0/EOB1/EOB2
    // (0x00/0x10/0x20) canonical at length 2 (codes 00/01/10)
    b(0xff); b(0xc4); be16(2 + 2 * (17 + 9) + 2 * (17 + 3))
    (0 to 1).foreach { id =>
      b(0x00 | id)
      val bits = new Array[Int](16); bits(3) = 9
      bits.foreach(b); (0 to 8).foreach(b)
      b(0x10 | id)
      val abits = new Array[Int](16); abits(1) = 3
      abits.foreach(b); b(0x00); b(0x10); b(0x20)
    }
    val dcQ = Array(
      plantedY(docId, 0, 0) - 128, plantedY(docId, 1, 0) - 128,
      plantedY(docId, 0, 1) - 128, plantedY(docId, 1, 1) - 128,
      plantedCb(docId) - 128, plantedCr(docId) - 128)
    def sos(comps: Seq[(Int, Int, Int)], ss: Int, se: Int, ah: Int, al: Int): Unit = {
      b(0xff); b(0xda); be16(6 + 2 * comps.size)
      b(comps.size)
      comps.foreach { case (id, td, ta) => b(id); b((td << 4) | ta) }
      b(ss); b(se); b((ah << 4) | al)
    }
    def putDcDiff(bw: JpegBitWriter, diff: Int): Unit = {
      val mag = math.abs(diff)
      var cat = 0
      while ((1 << cat) <= mag) cat += 1
      bw.put(cat, 4)
      if (cat > 0) {
        val v = if (diff >= 0) diff else diff + (1 << cat) - 1
        bw.put(v & ((1 << cat) - 1), cat)
      }
    }
    // scan 1: DC first, Al=1 — interleaved single MCU, Y×4, Cb, Cr
    sos(Seq((1, 0, 0), (2, 1, 1), (3, 1, 1)), 0, 0, 0, 1)
    val bw1 = new JpegBitWriter(out)
    var predY = 0
    (0 to 3).foreach { k => putDcDiff(bw1, (dcQ(k) >> 1) - predY); predY = dcQ(k) >> 1 }
    putDcDiff(bw1, dcQ(4) >> 1)
    putDcDiff(bw1, dcQ(5) >> 1)
    bw1.flush()
    // scan 2: DC refinement, Ah=1, Al=0 — one raw low bit per block
    sos(Seq((1, 0, 0), (2, 1, 1), (3, 1, 1)), 0, 0, 1, 0)
    val bw2 = new JpegBitWriter(out)
    dcQ.foreach(v => bw2.put(v & 1, 1))
    bw2.flush()
    // scans 3-5: AC first over the whole band, all blocks EOB — one
    // EOBn run of exactly the component's block count
    def eobRun(bw: JpegBitWriter, n: Int): Unit = {
      var r = 0
      while ((1 << (r + 1)) <= n) r += 1
      bw.put(r, 2)                                    // EOBr: canonical code 00/01/10
      if (r > 0) bw.put(n - (1 << r), r)              // extra run bits
    }
    val nY = ((w + 7) / 8) * ((h + 7) / 8)
    Seq((1, 0, nY), (2, 1, 1), (3, 1, 1)).foreach { case (id, ta, n) =>
      sos(Seq((id, 0, ta)), 1, 63, 0, 0)
      val bw = new JpegBitWriter(out)
      eobRun(bw, n)
      bw.flush()
    }
    b(0xff); b(0xd9)                                  // EOI
    out.toByteArray
  }

  /** REAL dependency-free image header decode: identifies the format
    * by magic bytes and parses the dimensions from the header —
    * PNG via the IHDR chunk (validating the chunk type AND its CRC32),
    * JPEG by walking segments from SOI to the first SOFn frame header
    * (C0–CF except the non-frame C4/C8/CC), skipping 0xFF fill bytes
    * and the length-less standalone markers (TEM 0x01, RSTn D0–D7)
    * per the public JPEG spec. Returns ("unknown"/"corrupt", -1, -1)
    * instead of throwing on arbitrary bytes — a decode stage must
    * never kill the job on one bad blob. */
  def parseImageHeader(bytes: Array[Byte]): (String, Int, Int) = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int): Int = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    if (bytes.length >= 8 && u8(0) == 0x89 && u8(1) == 0x50 && u8(2) == 0x4e &&
        u8(3) == 0x47 && u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a && u8(7) == 0x0a) {
      if (bytes.length >= 33 && be32(8) == 13 &&
          bytes(12) == 'I' && bytes(13) == 'H' && bytes(14) == 'D' && bytes(15) == 'R') {
        if (crc32(bytes, 12, 4 + 13) == be32(29))
          ("png", be32(16), be32(20))
        else ("corrupt", -1, -1)
      } else ("corrupt", -1, -1)
    } else if (bytes.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      var i = 2
      while (i + 2 <= bytes.length && u8(i) == 0xff) {
        // legal 0xFF fill bytes may pad between segments
        while (i + 2 <= bytes.length && u8(i + 1) == 0xff) i += 1
        if (i + 2 > bytes.length) return ("corrupt", -1, -1)
        val marker = u8(i + 1)
        if (marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          return if (i + 9 <= bytes.length) ("jpeg", be16(i + 7), be16(i + 5))
            else ("corrupt", -1, -1)
        }
        if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) {
          i += 2 // standalone marker: no length field
        } else if (marker == 0xd9 || marker == 0xda || marker == 0x00) {
          // EOI / start-of-scan / stuffed byte before any SOF: no dims
          return ("corrupt", -1, -1)
        } else {
          if (i + 4 > bytes.length) return ("corrupt", -1, -1)
          i += 2 + be16(i + 2) // segment length includes its own 2 bytes
        }
      }
      ("corrupt", -1, -1)
    } else ("unknown", -1, -1)
  }

  /** REAL PNG pixel decode (JDK-only): chunk walk with per-chunk
    * CRC32 validation, multi-IDAT concatenation, zlib inflate
    * (java.util.zip.Inflater) with an exact expected-size bound, and
    * scanline unfiltering for all five PNG filter types. Supports
    * the fixture class (8-bit truecolor). Total: any malformation —
    * bad CRC, truncated stream, wrong inflated size, unknown filter
    * type — yields None, never an exception.
    *
    * @return Some((width, height, rgbPixels)) with `rgbPixels`
    *         row-major w·h·3 bytes, or None. */
  def decodePng(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    try {
      val (fmt, w, h) = parseImageHeader(bytes)
      if (fmt != "png" || w <= 0 || h <= 0 || w.toLong * h > (1L << 26)) return None
      if ((bytes(24) & 0xff) != 8 || (bytes(25) & 0xff) != 2) return None // 8-bit RGB only
      def be32(i: Int): Int =
        ((bytes(i) & 0xff) << 24) | ((bytes(i + 1) & 0xff) << 16) |
          ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
      // walk chunks after IHDR, concatenating IDAT payloads. The
      // buffer can never exceed the input, so cap its initial
      // capacity by the input size — a hostile IHDR claiming 2^26
      // pixels in a 100-byte payload must not pre-allocate ~100 MB.
      val idat = new java.io.ByteArrayOutputStream(
        math.min(bytes.length, h * (1 + 3 * w) / 2 + 32))
      var i = 33
      var done = false
      while (!done) {
        if (i + 8 > bytes.length) return None
        val len = be32(i)
        if (len < 0 || i + 12 + len > bytes.length) return None
        val ctype = new String(bytes, i + 4, 4, "US-ASCII")
        if (crc32(bytes, i + 4, 4 + len) != be32(i + 8 + len)) return None
        if (ctype == "IDAT") idat.write(bytes, i + 8, len)
        else if (ctype == "IEND") done = true
        i += 12 + len
      }
      // inflate to exactly h·(1 + 3w) filtered bytes — but first bound
      // the claimed output against what the IDAT stream could possibly
      // inflate to (zlib's theoretical max ratio is ~1032:1): a
      // decompression bomb's tiny IDAT with a huge IHDR is rejected
      // BEFORE the big allocations, not after.
      val expected = h * (1 + 3 * w)
      if (expected.toLong > 1032L * idat.size + 64L) return None
      val inf = new java.util.zip.Inflater()
      inf.setInput(idat.toByteArray)
      val filtered = new Array[Byte](expected)
      var off = 0
      while (!inf.finished() && off < expected && !inf.needsInput()) {
        val n = inf.inflate(filtered, off, expected - off)
        if (n == 0 && !inf.finished()) { inf.end(); return None }
        off += n
      }
      val complete = inf.finished() && off == expected
      inf.end()
      if (!complete) return None
      // unfilter scanlines into the pixel buffer
      val px = new Array[Byte](h * w * 3)
      val zero = new Array[Byte](3 * w)
      var y = 0
      while (y < h) {
        val ft = filtered(y * (1 + 3 * w)) & 0xff
        if (ft > 4) return None
        val line = new Array[Byte](3 * w)
        System.arraycopy(filtered, y * (1 + 3 * w) + 1, line, 0, 3 * w)
        val prev = if (y == 0) zero else java.util.Arrays.copyOfRange(px, (y - 1) * 3 * w, y * 3 * w)
        unfilterLine(ft, line, prev)
        System.arraycopy(line, 0, px, y * 3 * w, 3 * w)
        y += 1
      }
      Some((w, h, px))
    } catch { case _: Throwable => None }
  }

  // ----- baseline JPEG decoder (ITU T.81 sequential DCT, JDK-only) -----

  /** Thrown internally on any malformation; callers convert to None. */
  private final class JpegBad extends RuntimeException(null, null, false, false)
  private def bad(): Nothing = throw new JpegBad

  /** Canonical Huffman decode tables (T.81 §F.2.2.3 MINCODE/MAXCODE/
    * VALPTR construction from the DHT BITS list). */
  private final class JpegHuff(bits: Array[Int], val vals: Array[Int]) {
    val mincode = new Array[Int](17)
    val maxcode = Array.fill[Int](17)(-1)
    val valptr = new Array[Int](17)
    private var code = 0
    private var k = 0
    (1 to 16).foreach { l =>
      valptr(l) = k
      mincode(l) = code
      if (bits(l - 1) > 0) { k += bits(l - 1); code += bits(l - 1); maxcode(l) = code - 1 }
      code <<= 1
    }
    if (k != vals.length) bad()
  }

  /** MSB-first entropy bit reader with 0xFF00 unstuffing. Hitting a
    * real marker or the end of input mid-symbol is a decode error
    * (RSTn handling happens at byte level between restart
    * intervals, not here). */
  private final class JpegBitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var n = 0
    def bit(): Int = {
      if (n == 0) {
        if (pos >= bytes.length) bad()
        var v = bytes(pos) & 0xff; pos += 1
        if (v == 0xff) {
          if (pos >= bytes.length || (bytes(pos) & 0xff) != 0x00) bad()
          pos += 1 // stuffed zero byte
        }
        acc = v; n = 8
      }
      n -= 1
      (acc >>> n) & 1
    }
    def bits(len: Int): Int = {
      var v = 0; var i = 0
      while (i < len) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def align(): Unit = n = 0
    def decode(t: JpegHuff): Int = {
      var l = 1
      var code = bit()
      while (code > t.maxcode(l)) {
        if (l == 16) bad()
        l += 1
        code = (code << 1) | bit()
      }
      t.vals(t.valptr(l) + code - t.mincode(l))
    }
  }

  /** Zigzag scan order → natural (row-major v*8+u) coefficient index,
    * from the public JPEG spec. */
  private val JpegZigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** C(u)·cos((2x+1)uπ/16) basis table for the separable IDCT. */
  private val JpegCosT: Array[Double] = {
    val t = new Array[Double](64)
    var x = 0
    while (x < 8) {
      var u = 0
      while (u < 8) {
        val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
        t(x * 8 + u) = c * math.cos((2 * x + 1) * u * math.Pi / 16.0)
        u += 1
      }
      x += 1
    }
    t
  }

  /** Separable 2-D inverse DCT (T.81 §A.3.3) of one dequantized
    * 8×8 block (natural order), level-shifted +128 and clamped to
    * 0..255. For the planted DC-only blocks the result is exactly
    * the planted constant (float error ~1e-13 ≪ the 0.5 rounding
    * margin), which is what makes the fixture round trip lossless. */
  private def jpegIdct(coef: Array[Int], out: Array[Int]): Unit = {
    val tmp = new Array[Double](64)
    var u = 0
    while (u < 8) { // columns: tmp(u, y) = Σ_v ct(y,v)·F(u,v)
      var y = 0
      while (y < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += JpegCosT(y * 8 + v) * coef(v * 8 + u); v += 1 }
        tmp(y * 8 + u) = s
        y += 1
      }
      u += 1
    }
    var y = 0
    while (y < 8) { // rows: f(x,y) = 1/4 Σ_u ct(x,u)·tmp(u,y)
      var x = 0
      while (x < 8) {
        var s = 0.0
        var uu = 0
        while (uu < 8) { s += JpegCosT(x * 8 + uu) * tmp(y * 8 + uu); uu += 1 }
        val px = math.floor(0.25 * s + 128.5).toInt
        out(y * 8 + x) = if (px < 0) 0 else if (px > 255) 255 else px
        x += 1
      }
      y += 1
    }
  }

  /** REAL dependency-free baseline JPEG pixel decode (JDK-only):
    * full segment walk (multi-table DQT/DHT, DRI), canonical Huffman
    * decode of the entropy-coded scan with byte unstuffing and
    * restart-marker handling, differential DC prediction per
    * component, run-length AC decode (EOB/ZRL), dequantization,
    * separable IDCT, nearest-neighbor chroma upsampling for
    * arbitrary sampling factors (4:2:0 / 4:2:2 / 4:4:4), and JFIF
    * YCbCr→RGB via the exact integer [[yccToRgbE6]]. Grayscale
    * (1-component) scans decode with R=G=B=Y. PROGRESSIVE (SOF2)
    * frames decode too — multi-scan spectral selection + successive
    * approximation per T.81 §G.2 ([[decodeJpegProgressiveScan]]),
    * accumulated in coefficient buffers and finalized at EOI.
    * Arithmetic-coded, lossless, hierarchical, and 12-bit frames are
    * rejected. Any malformation yields None, never an exception.
    *
    * @return Some((width, height, rgbPixels)) with `rgbPixels`
    *         row-major w·h·3 bytes, or None. */
  def decodeJpeg(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    try {
      if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return None
      def u8(i: Int): Int = { if (i >= bytes.length) bad(); bytes(i) & 0xff }
      def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
      val quant = new Array[Array[Int]](4)             // zigzag order, 8-bit
      val huffs = new Array[JpegHuff](8)               // class*4 + id
      var w = -1; var h = -1
      // per component: id, hSamp, vSamp, quant table id, DC table, AC table
      var compId: Array[Int] = null
      var compH: Array[Int] = null
      var compV: Array[Int] = null
      var compTq: Array[Int] = null
      var compTd: Array[Int] = null
      var compTa: Array[Int] = null
      var restartInterval = 0
      var progressive = false
      // progressive state: per-component coefficient buffers in
      // natural order, on the MCU-padded block grid
      var coefs: Array[Array[Int]] = null
      var blocksWFull: Array[Int] = null // padded blocks across, per comp
      var blocksHFull: Array[Int] = null
      var compBlocksW: Array[Int] = null // un-padded comp grid (ns=1 scans)
      var compBlocksH: Array[Int] = null
      var i = 2
      while (true) {
        // find the next marker, tolerating 0xFF fill bytes
        if (u8(i) != 0xff) bad()
        while (u8(i + 1) == 0xff) i += 1
        val marker = u8(i + 1)
        i += 2
        marker match {
          case 0xdb => // DQT: one or more tables
            val end = i + be16(i); i += 2
            while (i < end) {
              val pq = u8(i) >> 4; val tq = u8(i) & 15
              if (pq != 0 || tq > 3) bad() // 8-bit tables only
              val t = new Array[Int](64)
              var k = 0
              while (k < 64) { t(k) = u8(i + 1 + k); k += 1 }
              quant(tq) = t
              i += 65
            }
            if (i != end) bad()
          case 0xc4 => // DHT: one or more tables
            val end = i + be16(i); i += 2
            while (i < end) {
              val tc = u8(i) >> 4; val th = u8(i) & 15
              if (tc > 1 || th > 3) bad()
              val bits = Array.tabulate(16)(k => u8(i + 1 + k))
              val n = bits.sum
              if (n > 256) bad()
              val vals = Array.tabulate(n)(k => u8(i + 17 + k))
              huffs(tc * 4 + th) = new JpegHuff(bits, vals)
              i += 17 + n
            }
            if (i != end) bad()
          case 0xc0 | 0xc1 | 0xc2 => // SOF0/1 sequential, SOF2 progressive
            if (marker == 0xc2) progressive = true
            val len = be16(i)
            if (u8(i + 2) != 8) bad() // 8-bit precision only
            h = be16(i + 3); w = be16(i + 5)
            val nc = u8(i + 7)
            if ((nc != 1 && nc != 3) || len != 8 + 3 * nc) bad()
            if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26)) bad()
            compId = new Array[Int](nc); compH = new Array[Int](nc)
            compV = new Array[Int](nc); compTq = new Array[Int](nc)
            var c = 0
            while (c < nc) {
              compId(c) = u8(i + 8 + 3 * c)
              val hv = u8(i + 9 + 3 * c)
              compH(c) = hv >> 4; compV(c) = hv & 15
              if (compH(c) < 1 || compH(c) > 4 || compV(c) < 1 || compV(c) > 4) bad()
              compTq(c) = u8(i + 10 + 3 * c)
              if (compTq(c) > 3) bad()
              c += 1
            }
            i += len
          case 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
            bad() // lossless / arithmetic / hierarchical frames unsupported
          case 0xdd => // DRI
            if (be16(i) != 4) bad()
            restartInterval = be16(i + 2)
            i += 4
          case 0xda => // SOS
            if (compId == null) bad()
            val nc = compId.length
            val ns = u8(i + 2)
            if (be16(i) != 6 + 2 * ns) bad()
            val scanComp = new Array[Int](ns)
            val scanTd = new Array[Int](ns); val scanTa = new Array[Int](ns)
            var s = 0
            while (s < ns) {
              val cs = u8(i + 3 + 2 * s)
              val c = compId.indexOf(cs)
              if (c < 0) bad()
              scanComp(s) = c
              scanTd(s) = u8(i + 4 + 2 * s) >> 4
              scanTa(s) = u8(i + 4 + 2 * s) & 15
              s += 1
            }
            val ss = u8(i + 3 + 2 * ns)
            val se = u8(i + 4 + 2 * ns)
            val ahAl = u8(i + 5 + 2 * ns)
            val ah = ahAl >> 4; val al = ahAl & 15
            i += be16(i)
            if (!progressive) {
              // single interleaved sequential scan covering all comps
              if (ns != nc || ss != 0 || se != 63 || ah != 0 || al != 0) bad()
              compTd = new Array[Int](nc); compTa = new Array[Int](nc)
              var c = 0
              while (c < ns) {
                compTd(scanComp(c)) = scanTd(c); compTa(scanComp(c)) = scanTa(c)
                c += 1
              }
              return Some(decodeJpegScan(bytes, i, w, h, compH, compV, compTq, compTd,
                compTa, quant, huffs, restartInterval))
            } else {
              if (coefs == null) {
                val hmax = compH.max; val vmax = compV.max
                val mcuW = (w + 8 * hmax - 1) / (8 * hmax)
                val mcuH = (h + 8 * vmax - 1) / (8 * vmax)
                blocksWFull = Array.tabulate(nc)(c => mcuW * compH(c))
                blocksHFull = Array.tabulate(nc)(c => mcuH * compV(c))
                compBlocksW = Array.tabulate(nc)(c =>
                  ((w * compH(c) + hmax - 1) / hmax + 7) / 8)
                compBlocksH = Array.tabulate(nc)(c =>
                  ((h * compV(c) + vmax - 1) / vmax + 7) / 8)
                coefs = Array.tabulate(nc)(c =>
                  new Array[Int](blocksWFull(c) * blocksHFull(c) * 64))
              }
              i = decodeJpegProgressiveScan(bytes, i, scanComp, scanTd, scanTa,
                ss, se, ah, al, compH, compV, huffs, coefs,
                blocksWFull, blocksHFull, compBlocksW, compBlocksH, restartInterval)
            }
          case 0xd9 => // EOI: for progressive, all scans are in — finalize
            if (!progressive || coefs == null) bad()
            return Some(finalizeJpegProgressive(w, h, compH, compV, compTq, quant,
              coefs, blocksWFull, blocksHFull))
          case m if m == 0x01 || (m >= 0xd0 && m <= 0xd7) => () // standalone
          case _ => i += be16(i) // APPn / COM / other: skip by length
        }
      }
      None
    } catch { case _: JpegBad | _: ArrayIndexOutOfBoundsException | _: NegativeArraySizeException => None }
  }

  /** Entropy-decode the single interleaved scan into component
    * planes, then upsample + color-convert + crop. */
  private def decodeJpegScan(bytes: Array[Byte], scanStart: Int, w: Int, h: Int,
                             compH: Array[Int], compV: Array[Int], compTq: Array[Int],
                             compTd: Array[Int], compTa: Array[Int],
                             quant: Array[Array[Int]], huffs: Array[JpegHuff],
                             restartInterval: Int): (Int, Int, Array[Byte]) = {
    val nc = compH.length
    val hmax = compH.max; val vmax = compV.max
    val mcuW = (w + 8 * hmax - 1) / (8 * hmax)
    val mcuH = (h + 8 * vmax - 1) / (8 * vmax)
    // padded per-component planes (mcu grid × sampling factor blocks)
    val planeW = Array.tabulate(nc)(c => mcuW * compH(c) * 8)
    val planeH = Array.tabulate(nc)(c => mcuH * compV(c) * 8)
    val planes = Array.tabulate(nc)(c => new Array[Int](planeW(c) * planeH(c)))
    var c = 0
    while (c < nc) {
      if (quant(compTq(c)) == null || huffs(compTd(c)) == null || huffs(4 + compTa(c)) == null) bad()
      c += 1
    }
    val pred = new Array[Int](nc)
    val coef = new Array[Int](64)
    val block = new Array[Int](64)
    var br = new JpegBitReader(bytes, scanStart)
    var mcusDone = 0
    var nextRst = 0
    var my = 0
    while (my < mcuH) {
      var mx = 0
      while (mx < mcuW) {
        if (restartInterval > 0 && mcusDone > 0 && mcusDone % restartInterval == 0) {
          // byte-align and consume the RSTn marker; DC predictors reset
          br.align()
          var p = br.pos
          while (p + 1 < bytes.length && (bytes(p) & 0xff) == 0xff &&
            (bytes(p + 1) & 0xff) == 0xff) p += 1
          if (p + 1 >= bytes.length || (bytes(p) & 0xff) != 0xff ||
            (bytes(p + 1) & 0xff) != (0xd0 | nextRst)) bad()
          nextRst = (nextRst + 1) & 7
          java.util.Arrays.fill(pred, 0)
          br = new JpegBitReader(bytes, p + 2)
        }
        var ci = 0
        while (ci < nc) {
          val q = quant(compTq(ci))
          val dcT = huffs(compTd(ci))
          val acT = huffs(4 + compTa(ci))
          var by = 0
          while (by < compV(ci)) {
            var bx = 0
            while (bx < compH(ci)) {
              java.util.Arrays.fill(coef, 0)
              // DC: category + extend, differential per component
              val cat = br.decode(dcT)
              if (cat > 15) bad()
              val diff = if (cat == 0) 0 else jpegExtend(br.bits(cat), cat)
              pred(ci) += diff
              coef(0) = pred(ci) * q(0)
              // AC: run/size pairs until EOB or coefficient 63
              var k = 1
              while (k < 64) {
                val rs = br.decode(acT)
                val run = rs >> 4; val size = rs & 15
                if (size == 0) {
                  if (run == 15) k += 16 // ZRL
                  else k = 64            // EOB
                } else {
                  k += run
                  if (k > 63) bad()
                  coef(JpegZigzag(k)) = jpegExtend(br.bits(size), size) * q(k)
                  k += 1
                }
              }
              jpegIdct(coef, block)
              // place into the component plane
              val px0 = (mx * compH(ci) + bx) * 8
              val py0 = (my * compV(ci) + by) * 8
              var yy = 0
              while (yy < 8) {
                var xx = 0
                while (xx < 8) {
                  planes(ci)((py0 + yy) * planeW(ci) + px0 + xx) = block(yy * 8 + xx)
                  xx += 1
                }
                yy += 1
              }
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mcusDone += 1
        mx += 1
      }
      my += 1
    }
    jpegPlanesToRgb(w, h, compH, compV, planes, planeW)
  }

  /** Shared finalization for both JPEG paths: nearest-neighbor
    * chroma upsample + JFIF YCbCr→RGB (grayscale R=G=B=Y) + crop of
    * the padded component planes to w×h. */
  private def jpegPlanesToRgb(w: Int, h: Int, compH: Array[Int], compV: Array[Int],
                              planes: Array[Array[Int]],
                              planeW: Array[Int]): (Int, Int, Array[Byte]) = {
    val nc = compH.length
    val hmax = compH.max; val vmax = compV.max
    val px = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        if (nc == 1) {
          val v = planes(0)(y * planeW(0) + x)
          px(o) = v.toByte; px(o + 1) = v.toByte; px(o + 2) = v.toByte
        } else {
          val yv = planes(0)((y * compV(0) / vmax) * planeW(0) + (x * compH(0) / hmax))
          val cb = planes(1)((y * compV(1) / vmax) * planeW(1) + (x * compH(1) / hmax))
          val cr = planes(2)((y * compV(2) / vmax) * planeW(2) + (x * compH(2) / hmax))
          val (r, g, b) = yccToRgbE6(yv, cb, cr)
          px(o) = r.toByte; px(o + 1) = g.toByte; px(o + 2) = b.toByte
        }
        x += 1
      }
      y += 1
    }
    (w, h, px)
  }

  /** Entropy-decode ONE progressive scan (ITU T.81 §G.2) into the
    * per-component coefficient buffers, returning the byte position
    * of the next marker. Covers all four scan kinds:
    *
    *  - DC first (Ss=0, Ah=0): differential DC exactly as baseline,
    *    stored left-shifted by the point transform Al; interleaved
    *    (ns>1, MCU order) or single-component (comp block grid);
    *  - DC refinement (Ah>0): one raw bit per block, added at Al —
    *    two's complement makes `+= bit<<Al` correct for negatives;
    *  - AC first (Ss≥1, Ah=0, ns=1): run/size over the spectral band
    *    with EOBn end-of-band runs ((1<<r)−1 + r extra bits blocks);
    *  - AC refinement (Ah>0): the §G.2.2.3 correction-bit algorithm —
    *    newly-significant coefficients arrive as ±1<<Al via (r,1)
    *    symbols whose run counts ZERO-history positions only, while
    *    every nonzero-history coefficient passed (including the tail
    *    of every EOB-run block) consumes one correction bit.
    *
    * Restart markers byte-align and reset DC predictors AND the
    * EOB run, per §G.2.1. */
  private def decodeJpegProgressiveScan(bytes: Array[Byte], start: Int,
      scanComp: Array[Int], scanTd: Array[Int], scanTa: Array[Int],
      ss: Int, se: Int, ah: Int, al: Int,
      compH: Array[Int], compV: Array[Int], huffs: Array[JpegHuff],
      coefs: Array[Array[Int]], blocksWFull: Array[Int], blocksHFull: Array[Int],
      compBlocksW: Array[Int], compBlocksH: Array[Int],
      restartInterval: Int): Int = {
    val ns = scanComp.length
    if (al > 13 || (ah != 0 && ah != al + 1)) bad()
    var br = new JpegBitReader(bytes, start)
    val pred = new Array[Int](ns)
    var eobrun = 0
    var unitsDone = 0
    var nextRst = 0

    def restartCheck(): Unit =
      if (restartInterval > 0 && unitsDone > 0 && unitsDone % restartInterval == 0) {
        br.align()
        var p = br.pos
        while (p + 1 < bytes.length && (bytes(p) & 0xff) == 0xff &&
          (bytes(p + 1) & 0xff) == 0xff) p += 1
        if (p + 1 >= bytes.length || (bytes(p) & 0xff) != 0xff ||
          (bytes(p + 1) & 0xff) != (0xd0 | nextRst)) bad()
        nextRst = (nextRst + 1) & 7
        java.util.Arrays.fill(pred, 0)
        eobrun = 0
        br = new JpegBitReader(bytes, p + 2)
      }

    def decodeDc(c: Int, si: Int, bi: Int): Unit =
      if (ah == 0) {
        val dcT = huffs(scanTd(si))
        if (dcT == null) bad()
        val cat = br.decode(dcT)
        if (cat > 15) bad()
        val diff = if (cat == 0) 0 else jpegExtend(br.bits(cat), cat)
        pred(si) += diff
        coefs(c)(bi) = pred(si) << al
      } else if (br.bit() == 1) coefs(c)(bi) += (1 << al)

    if (ss == 0) { // DC scan
      if (se != 0) bad()
      if (ns > 1) { // interleaved, MCU order
        val c0 = scanComp(0)
        val mcuW = blocksWFull(c0) / compH(c0)
        val mcuH = blocksHFull(c0) / compV(c0)
        var my = 0
        while (my < mcuH) {
          var mx = 0
          while (mx < mcuW) {
            restartCheck()
            var si = 0
            while (si < ns) {
              val c = scanComp(si)
              var by = 0
              while (by < compV(c)) {
                var bx = 0
                while (bx < compH(c)) {
                  decodeDc(c, si,
                    ((my * compV(c) + by) * blocksWFull(c) + mx * compH(c) + bx) * 64)
                  bx += 1
                }
                by += 1
              }
              si += 1
            }
            unitsDone += 1
            mx += 1
          }
          my += 1
        }
      } else { // single component over its own (un-padded) block grid
        val c = scanComp(0)
        var byy = 0
        while (byy < compBlocksH(c)) {
          var bxx = 0
          while (bxx < compBlocksW(c)) {
            restartCheck()
            decodeDc(c, 0, (byy * blocksWFull(c) + bxx) * 64)
            unitsDone += 1
            bxx += 1
          }
          byy += 1
        }
      }
    } else { // AC scan: single component only
      if (ns != 1 || se > 63 || ss > se) bad()
      val c = scanComp(0)
      val acT = huffs(4 + scanTa(0))
      if (acT == null) bad()
      val one = 1 << al

      def acFirst(bi: Int): Unit =
        if (eobrun > 0) eobrun -= 1
        else {
          var k = ss
          var done = false
          while (!done && k <= se) {
            val rs = br.decode(acT)
            val r = rs >> 4; val sz = rs & 15
            if (sz == 0) {
              if (r < 15) {
                eobrun = (1 << r) - 1
                if (r > 0) eobrun += br.bits(r)
                done = true
              } else k += 16 // ZRL
            } else {
              k += r
              if (k > se) bad()
              coefs(c)(bi + JpegZigzag(k)) = jpegExtend(br.bits(sz), sz) * one
              k += 1
            }
          }
        }

      def acRefine(bi: Int): Unit = {
        var k = ss
        if (eobrun > 0) {
          eobrun -= 1
          while (k <= se) { // correction bits only, through the band
            val z = bi + JpegZigzag(k)
            val p = coefs(c)(z)
            if (p != 0 && br.bit() == 1 && (p & one) == 0)
              coefs(c)(z) = if (p > 0) p + one else p - one
            k += 1
          }
        } else while (k <= se) {
          val rs = br.decode(acT)
          var r = rs >> 4; val sz = rs & 15
          var newVal = 0
          if (sz == 0) {
            if (r < 15) {
              eobrun = (1 << r) - 1
              if (r > 0) eobrun += br.bits(r)
              r = 64 // sweep corrections through the rest of the band
            } // r == 15: ZRL — skip 16 zero-history positions
          } else {
            if (sz != 1) bad()
            newVal = if (br.bit() == 1) one else -one
          }
          var advancing = true
          while (advancing && k <= se) {
            val z = bi + JpegZigzag(k)
            val p = coefs(c)(z)
            if (p != 0) {
              if (br.bit() == 1 && (p & one) == 0)
                coefs(c)(z) = if (p > 0) p + one else p - one
            } else if (r == 0) {
              if (newVal != 0) coefs(c)(z) = newVal
              advancing = false
            } else r -= 1
            k += 1
          }
        }
      }

      var byy = 0
      while (byy < compBlocksH(c)) {
        var bxx = 0
        while (bxx < compBlocksW(c)) {
          restartCheck()
          val bi = (byy * blocksWFull(c) + bxx) * 64
          if (ah == 0) acFirst(bi) else acRefine(bi)
          unitsDone += 1
          bxx += 1
        }
        byy += 1
      }
    }
    br.align()
    br.pos
  }

  /** After the last progressive scan (EOI): dequantize each 8×8
    * coefficient block with its component's table (re-ordered to
    * natural order), IDCT into the padded planes, and hand off to
    * the same upsample/color-convert/crop as the baseline path. */
  private def finalizeJpegProgressive(w: Int, h: Int,
      compH: Array[Int], compV: Array[Int], compTq: Array[Int],
      quant: Array[Array[Int]], coefs: Array[Array[Int]],
      blocksWFull: Array[Int], blocksHFull: Array[Int]): (Int, Int, Array[Byte]) = {
    val nc = compH.length
    val planeW = Array.tabulate(nc)(c => blocksWFull(c) * 8)
    val planeH = Array.tabulate(nc)(c => blocksHFull(c) * 8)
    val planes = Array.tabulate(nc)(c => new Array[Int](planeW(c) * planeH(c)))
    val dq = new Array[Int](64)
    val block = new Array[Int](64)
    val qNat = new Array[Int](64)
    var c = 0
    while (c < nc) {
      val q = quant(compTq(c))
      if (q == null) bad()
      var k = 0
      while (k < 64) { qNat(JpegZigzag(k)) = q(k); k += 1 }
      var byy = 0
      while (byy < blocksHFull(c)) {
        var bxx = 0
        while (bxx < blocksWFull(c)) {
          val bi = (byy * blocksWFull(c) + bxx) * 64
          var j = 0
          while (j < 64) { dq(j) = coefs(c)(bi + j) * qNat(j); j += 1 }
          jpegIdct(dq, block)
          val px0 = bxx * 8; val py0 = byy * 8
          var yy = 0
          while (yy < 8) {
            var xx = 0
            while (xx < 8) {
              planes(c)((py0 + yy) * planeW(c) + px0 + xx) = block(yy * 8 + xx)
              xx += 1
            }
            yy += 1
          }
          bxx += 1
        }
        byy += 1
      }
      c += 1
    }
    jpegPlanesToRgb(w, h, compH, compV, planes, planeW)
  }

  /** T.81 §F.2.2.1 EXTEND: map `size`-bit magnitude bits to the
    * signed coefficient value. */
  private def jpegExtend(v: Int, size: Int): Int =
    if (v < (1 << (size - 1))) v - (1 << size) + 1 else v

  /** Format-dispatching pixel decode: PNG → [[decodePng]], JPEG →
    * [[decodeJpeg]]; anything else (or any malformation) → None. */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    parseImageHeader(bytes) match {
      case ("png", _, _)  => decodePng(bytes)
      case ("jpeg", _, _) => decodeJpeg(bytes)
      case _              => None
    }

  /** Fixture binary column with COMPLETE planted media: pixel-bearing
    * PNGs (even doc_ids) and header-planted JPEGs (odd). This is the
    * input [[decodeFeatures]]' codec is verified against end-to-end. */
  def withPlantedMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) => (id, plantHeader(id, payload)) })
      .toDF("doc_id", "media")
  }

  /** Fixture binary column planting the PROGRESSIVE JPEG twin for
    * EVERY doc — same planted pixel content as [[withPlantedMedia]]'s
    * JPEG half, re-coded as multi-scan SOF2, so the full progressive
    * decode path is exactly oracle-able by doc_id arithmetic. */
  def withPlantedProgressive(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, plantJpegProgressive(id))))
      .toDF("doc_id", "media")
  }

  /** Batched per-partition decode: binary column → typed features.
    * Dimensions come from the real header parse; the features are
    * the REAL per-channel means of the decoded pixels — PNG via
    * inflate+unfilter, JPEG via the baseline Huffman+IDCT path —
    * with exact integer channel sums alongside, so oracles can
    * verify in exact fixed-point arithmetic. Undecodable media
    * reports empty features rather than failing the stage.
    * `batchSize` models the Arrow batch shape — the decode sees a
    * buffered group of records at a time (vectorized-codec-
    * friendly), while Spark streams partitions without
    * materializing them. */
  def decodeFeatures(withMedia: DataFrame, batchSize: Int = 64): Dataset[MediaMeta] = {
    val spark = withMedia.sparkSession
    import spark.implicits._
    withMedia.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            val (fmt, w, h) = parseImageHeader(bytes)
            decodeImage(bytes) match {
              case Some((pw, ph, px)) =>
                val sums = new Array[Long](3)
                var i = 0
                while (i < px.length) { sums(i % 3) += px(i) & 0xff; i += 1 }
                val nPx = pw.toLong * ph
                val means = Array.tabulate(3)(c => (sums(c) / (nPx * 255.0)).toFloat)
                MediaMeta(id, bytes.length, fmt, pw, ph, means, sums, nPx)
              case None =>
                MediaMeta(id, bytes.length, fmt, w, h,
                  Array.empty[Float], Array.empty[Long], 0L)
            }
          }
        }
      }
  }

  /** Container-kind classifier — the REJECTION TAXONOMY a crawl
    * ingest needs: [[decodeJpeg]] correctly returns `None` for both
    * a progressive JPEG and a corrupt blob, but a pipeline must
    * REPORT them separately (progressive is a large, recoverable
    * fraction of real crawl data; corrupt is waste). Walks JPEG
    * markers (tolerating APPn/COM/fill bytes before the frame
    * header) to the first SOFn and classifies it:
    *  - SOF0/SOF1   → `jpeg_baseline`    (decodable here)
    *  - SOF2/6/10/14 → `jpeg_progressive` (valid, decoder out of scope)
    *  - other SOFn  → `jpeg_unsupported` (lossless/arithmetic/hierarchical)
    *  - walk fails  → `jpeg_corrupt`
    * Non-JPEG: `png` on the 8-byte signature, else `unknown`. */
  def jpegKind(bytes: Array[Byte]): String = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    if (bytes.length >= 8 && u8(0) == 0x89 && u8(1) == 0x50 && u8(2) == 0x4e &&
        u8(3) == 0x47 && u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a && u8(7) == 0x0a)
      return "png"
    if (bytes.length < 4 || u8(0) != 0xff || u8(1) != 0xd8) return "unknown"
    var i = 2
    while (i + 2 <= bytes.length && u8(i) == 0xff) {
      while (i + 2 <= bytes.length && u8(i + 1) == 0xff) i += 1
      if (i + 2 > bytes.length) return "jpeg_corrupt"
      val marker = u8(i + 1)
      if (marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
        return marker match {
          case 0xc0 | 0xc1 => "jpeg_baseline"
          // progressive DCT: Huffman (C2) and arithmetic (CA), plus
          // the differential variants (C6, CE)
          case 0xc2 | 0xc6 | 0xca | 0xce => "jpeg_progressive"
          case _ => "jpeg_unsupported"
        }
      }
      if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) i += 2
      else if (marker == 0xd9 || marker == 0xda || marker == 0x00)
        return "jpeg_corrupt" // EOI/SOS/stuffed byte before any frame header
      else {
        if (i + 4 > bytes.length) return "jpeg_corrupt"
        i += 2 + be16(i + 2)
      }
    }
    "jpeg_corrupt"
  }

  /** Deterministic 5-way kind planting for [[mediaMeta]]'s rejection
    * metric: a fixed-size stub header per class ahead of the raw
    * payload, so the kind (and the stub's byte cost) are exactly
    * oracle-able by doc_id arithmetic while the Spark side must WALK
    * the markers to recover it. */
  private[operators] def kindStub(docId: Long): Array[Byte] =
    (docId % 5) match {
      case 0 => Array(0xff, 0xd8, 0xff, 0xc0).map(_.toByte) // baseline SOF
      case 1 => Array(0xff, 0xd8, 0xff, 0xc2).map(_.toByte) // progressive SOF
      case 2 => Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte) // EOI before SOF: corrupt
      case 3 => Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
      case _ => Array.emptyByteArray                        // raw payload
    }

  /** Columnar metadata-only path (no decode): byte length + fake
    * dimensions derived arithmetically — SQL-expressible — plus the
    * typed [[jpegKind]] container classification over the planted
    * kind stubs, so the rejection metric (progressive vs corrupt vs
    * unknown) is a COUNTED, oracle-checked column rather than an
    * undifferentiated decode failure. */
  def mediaMeta(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val meta = withBinary(docs).select(col("doc_id"),
      length(col("media")).cast("long").as("n_bytes"),
      (pmod(length(col("media")), lit(640)) + 1).cast("long").as("fake_width"),
      (pmod(length(col("media")), lit(480)) + 1).cast("long").as("fake_height"))
    val kinds = withBinary(docs).select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val p = if (payload == null) Array.emptyByteArray else payload
        (id, jpegKind(kindStub(id) ++ p))
      })
      .toDF("doc_id", "media_kind")
    meta.join(kinds, Seq("doc_id"))
  }

  final case class Resized(doc_id: Long, width: Int, height: Int,
                           pixels: Array[Byte])

  /** Nearest-neighbor resample of a decoded w×h RGB pixel grid to
    * (tw, th): out(X, Y, c) = in(⌊X·w/tw⌋, ⌊Y·h/th⌋, c). The
    * resolution-normalize step of an image pipeline, on REAL decoded
    * pixels. */
  private[operators] def resizePixels(px: Array[Byte], w: Int, h: Int,
                                      tw: Int, th: Int): Array[Byte] = {
    val out = new Array[Byte](tw * th * 3)
    var yy = 0
    while (yy < th) {
      val sy = yy * h / th
      var xx = 0
      while (xx < tw) {
        val sx = xx * w / tw
        var c = 0
        while (c < 3) {
          out((yy * tw + xx) * 3 + c) = px((sy * w + sx) * 3 + c)
          c += 1
        }
        xx += 1
      }
      yy += 1
    }
    out
  }

  /** Batched per-partition resize to a fixed (w, h): decodes the
    * media ([[decodeImage]] — PNG inflate+unfilter or baseline JPEG
    * Huffman+IDCT) and nearest-neighbor-resamples the real pixels.
    * Non-decodable media (corrupt blobs) yields empty pixels rather
    * than failing the stage. Same contract as [[decodeFeatures]]:
    * partition-parallel, no shuffle, fixed output schema. */
  def resizeTo(withMedia: DataFrame, w: Int = 32, h: Int = 32,
               batchSize: Int = 64): Dataset[Resized] = {
    val spark = withMedia.sparkSession
    import spark.implicits._
    withMedia.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.map { case (id, bytes) =>
          decodeImage(bytes) match {
            case Some((pw, ph, px)) => Resized(id, w, h, resizePixels(px, pw, ph, w, h))
            case None => Resized(id, w, h, Array.emptyByteArray)
          }
        })
      }
  }

  final case class Frames(doc_id: Long, n_frames: Long, n_sampled: Long,
                          frames: Array[Array[Byte]])

  /** Frame sampler: models a video as consecutive fixed-size frames
    * and keeps every `everyN`-th — the temporal-subsample step of a
    * video pipeline. Frame *counts* are pure arithmetic on byte
    * length, so the query surface stays oracle-checkable while the
    * typed path carries the actual frame payloads. */
  def sampleFrames(withMedia: DataFrame, frameBytes: Int = 256,
                   everyN: Int = 4): Dataset[Frames] = {
    val spark = withMedia.sparkSession
    import spark.implicits._
    withMedia.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val nFrames = (bytes.length + frameBytes - 1) / frameBytes
        val sampled = (0 until nFrames by everyN).map { f =>
          java.util.Arrays.copyOfRange(bytes, f * frameBytes,
            math.min((f + 1) * frameBytes, bytes.length))
        }.toArray
        Frames(id, nFrames.toLong, sampled.length.toLong, sampled)
      })
  }

  // ---- audio: RIFF/WAVE container, 16-bit PCM ----

  final case class AudioMeta(doc_id: Long, sample_rate: Long,
                             n_channels: Long, n_frames: Long,
                             sum_amp: Long, sum_sq: Long, peak_amp: Long)

  def plantedRate(docId: Long): Int = 8000 + (docId % 3).toInt * 4000
  def plantedChannels(docId: Long): Int = (docId % 2).toInt + 1
  def plantedFrames(docId: Long): Int = (docId % 64).toInt + 16

  /** Planted 16-bit sample for frame `i`, channel `c` — pure doc_id
    * arithmetic so per-doc sums are exactly oracle-able. */
  def plantedSample(docId: Long, i: Int, c: Int): Int =
    ((docId * 7919L + i.toLong * 104729L + c.toLong * 31337L) % 65536L
      - 32768L).toInt

  /** Build a COMPLETE valid RIFF/WAVE file around the planted PCM:
    * RIFF size field, a LIST junk chunk of varying ODD length before
    * fmt (the RIFF even-padding rule is on every real decode path —
    * broadcast WAVs carry LIST/INFO, bext, cue chunks), canonical
    * 16-byte PCM fmt, and interleaved little-endian 16-bit data. */
  def plantWav(docId: Long): Array[Byte] = {
    val ch = plantedChannels(docId)
    val n = plantedFrames(docId)
    val rate = plantedRate(docId)
    val junkLen = (docId % 7).toInt * 2 + 1 // always odd → pad byte
    val dataLen = n * ch * 2
    val out = new java.io.ByteArrayOutputStream(44 + junkLen + 1 + dataLen)
    def b(v: Int): Unit = out.write(v & 0xff)
    def le16(v: Int): Unit = { b(v); b(v >>> 8) }
    def le32(v: Int): Unit = { b(v); b(v >>> 8); b(v >>> 16); b(v >>> 24) }
    def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    val riffBody = 4 + (8 + junkLen + 1) + (8 + 16) + (8 + dataLen)
    tag("RIFF"); le32(riffBody); tag("WAVE")
    tag("LIST"); le32(junkLen)
    (0 until junkLen).foreach(j => b((docId + j).toInt))
    b(0) // pad to even
    tag("fmt "); le32(16)
    le16(1)                    // PCM
    le16(ch)
    le32(rate)
    le32(rate * ch * 2)        // byte rate
    le16(ch * 2)               // block align
    le16(16)                   // bits per sample
    tag("data"); le32(dataLen)
    var i = 0
    while (i < n) {
      var c = 0
      while (c < ch) { le16(plantedSample(docId, i, c) & 0xffff); c += 1 }
      i += 1
    }
    out.toByteArray
  }

  /** REAL RIFF/WAVE decode — chunk walk with the even-padding rule,
    * strict fmt validation (PCM tag 1, 16-bit, consistent block
    * align), fmt-before-data ordering, and little-endian signed PCM
    * extraction. Returns (sampleRate, nChannels, interleaved
    * samples); any malformed container → None, never a throw. */
  def decodeWav(bytes: Array[Byte]): Option[(Int, Int, Array[Short])] = {
    def le16(i: Int): Int = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
    def le32(i: Int): Int = le16(i) | (le16(i + 2) << 16)
    def tagIs(i: Int, s: String): Boolean =
      bytes.length >= i + 4 && (0 until 4).forall(j => bytes(i + j) == s.charAt(j).toByte)
    try {
      if (bytes.length < 44 || !tagIs(0, "RIFF") || !tagIs(8, "WAVE")) return None
      if (le32(4) != bytes.length - 8) return None
      var i = 12
      var rate = 0; var ch = 0; var fmtSeen = false
      while (i + 8 <= bytes.length) {
        val size = le32(i + 4)
        if (size < 0 || i + 8 + size > bytes.length) return None
        if (tagIs(i, "fmt ")) {
          if (size < 16) return None
          if (le16(i + 8) != 1) return None         // PCM only
          ch = le16(i + 10)
          rate = le32(i + 12)
          if (ch < 1 || ch > 8 || rate <= 0) return None
          if (le16(i + 20) != ch * 2) return None    // block align
          if (le16(i + 22) != 16) return None        // 16-bit only
          fmtSeen = true
        } else if (tagIs(i, "data")) {
          if (!fmtSeen) return None                  // fmt must precede data
          if (size % (ch * 2) != 0) return None
          val samples = new Array[Short](size / 2)
          var k = 0
          while (k < samples.length) {
            samples(k) = le16(i + 8 + 2 * k).toShort
            k += 1
          }
          return Some((rate, ch, samples))
        }
        i += 8 + size + (size & 1)                   // even-padding rule
      }
      None
    } catch { case _: ArrayIndexOutOfBoundsException => None }
  }

  /** Fixture binary column planting a valid WAV for every doc. */
  def withPlantedAudio(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, plantWav(id))))
      .toDF("doc_id", "media")
  }

  /** Per-partition audio decode → typed features, all EXACT integer
    * math (sum, sum of squares, peak of the signed 16-bit samples) so
    * the oracle replays the planted-sample formula bit for bit.
    * Undecodable audio reports zeros rather than failing the stage —
    * the same tolerance contract as [[decodeFeatures]]. Linear CPU,
    * zero shuffle. */
  def audioFeatures(withAudio: DataFrame): Dataset[AudioMeta] = {
    val spark = withAudio.sparkSession
    import spark.implicits._
    withAudio.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        decodeWav(bytes) match {
          case Some((rate, ch, samples)) =>
            var sum = 0L; var sq = 0L; var peak = 0L
            var k = 0
            while (k < samples.length) {
              val v = samples(k).toLong
              sum += v; sq += v * v
              val a = math.abs(v)
              if (a > peak) peak = a
              k += 1
            }
            AudioMeta(id, rate.toLong, ch.toLong,
              (samples.length / ch).toLong, sum, sq, peak)
          case None => AudioMeta(id, 0L, 0L, 0L, 0L, 0L, 0L)
        }
      })
  }

  // ---- video: RIFF/AVI container + MJPEG frames ----

  /** Frames per planted video (3..7 — exercises varying movi chunk
    * counts) and the per-frame JPEG seed. The seed stride 1144 =
    * 8·11·13 keeps [[plantedWidth]]/[[plantedHeight]] (mod 13 / 11)
    * AND the APP0 pad (mod 8) IDENTICAL across a video's frames —
    * frames of one stream share geometry, as a real stream's do —
    * while the luma/chroma formulas (mod 256, stride 1144 ∤ 256)
    * vary per frame, so every sampled frame decodes to distinct,
    * doc_id+frame-arithmetic-recomputable content. */
  def plantedVideoFrames(docId: Long): Int = (docId % 5 + 3).toInt
  def plantedFrameSeed(docId: Long, f: Int): Long = docId + f * 1144L

  /** Plant a complete, valid RIFF/AVI container with MJPEG frames —
    * the video counterpart of [[plantWav]]: `RIFF('AVI ')` holding a
    * `LIST('hdrl')` with a real 56-byte `avih` main header (frame
    * count, geometry, 25 fps) and a `LIST('movi')` whose `00dc`
    * chunks each carry one [[plantJpeg]] frame, the RIFF even-
    * padding rule applied per chunk (baseline JPEG streams are
    * frequently odd-length, so the pad path is genuinely on the
    * walk). */
  def plantAvi(docId: Long): Array[Byte] = {
    val nf = plantedVideoFrames(docId)
    def le32(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
      o.write(v & 0xff); o.write((v >>> 8) & 0xff)
      o.write((v >>> 16) & 0xff); o.write((v >>> 24) & 0xff)
    }
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream(body.length + 10)
      o.write(id.getBytes("US-ASCII")); le32(o, body.length); o.write(body)
      if (body.length % 2 == 1) o.write(0) // RIFF even-padding rule
      o.toByteArray
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", kind.getBytes("US-ASCII") ++ body)
    val avih = new java.io.ByteArrayOutputStream(56)
    le32(avih, 40000); le32(avih, 0); le32(avih, 0); le32(avih, 0)
    le32(avih, nf); le32(avih, 0); le32(avih, 1); le32(avih, 0)
    le32(avih, plantedWidth(docId)); le32(avih, plantedHeight(docId))
    (0 until 4).foreach(_ => le32(avih, 0))
    val hdrl = list("hdrl", chunk("avih", avih.toByteArray))
    val movi = list("movi",
      (0 until nf).map(f => chunk("00dc", plantJpeg(plantedFrameSeed(docId, f))))
        .reduce(_ ++ _))
    val out = new java.io.ByteArrayOutputStream(hdrl.length + movi.length + 12)
    out.write("RIFF".getBytes("US-ASCII"))
    le32(out, 4 + hdrl.length + movi.length)
    out.write("AVI ".getBytes("US-ASCII"))
    out.write(hdrl); out.write(movi)
    out.toByteArray
  }

  /** Assemble a RIFF/AVI container from per-frame compressed
    * payloads — [[plantAvi]]'s container layout parameterized on the
    * frame streams, so fixtures can re-mux variant streams (a
    * re-encoded or frame-dropped twin) through the same walk
    * [[decodeAvi]] verifies: `RIFF('AVI ')` → `LIST('hdrl')` with the
    * 56-byte `avih` (frame count, geometry, 25 fps) → `LIST('movi')`
    * of `00dc` chunks, RIFF even-padding per chunk. */
  def aviFromFrames(frames: Seq[Array[Byte]], w: Int, h: Int): Array[Byte] = {
    def le32(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
      o.write(v & 0xff); o.write((v >>> 8) & 0xff)
      o.write((v >>> 16) & 0xff); o.write((v >>> 24) & 0xff)
    }
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream(body.length + 10)
      o.write(id.getBytes("US-ASCII")); le32(o, body.length); o.write(body)
      if (body.length % 2 == 1) o.write(0)
      o.toByteArray
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", kind.getBytes("US-ASCII") ++ body)
    val avih = new java.io.ByteArrayOutputStream(56)
    le32(avih, 40000); le32(avih, 0); le32(avih, 0); le32(avih, 0)
    le32(avih, frames.length); le32(avih, 0); le32(avih, 1); le32(avih, 0)
    le32(avih, w); le32(avih, h)
    (0 until 4).foreach(_ => le32(avih, 0))
    val hdrl = list("hdrl", chunk("avih", avih.toByteArray))
    val movi = list("movi",
      frames.map(fb => chunk("00dc", fb)).reduce(_ ++ _))
    val out = new java.io.ByteArrayOutputStream(hdrl.length + movi.length + 12)
    out.write("RIFF".getBytes("US-ASCII"))
    le32(out, 4 + hdrl.length + movi.length)
    out.write("AVI ".getBytes("US-ASCII"))
    out.write(hdrl); out.write(movi)
    out.toByteArray
  }

  /** REAL RIFF/AVI walk — the video twin of [[decodeWav]]: verify
    * `RIFF`/`AVI ` and the declared size, iterate top-level chunks
    * with the even-padding rule, descend into `LIST('movi')`, and
    * collect each `00dc`/`01dc` video chunk's payload (the per-frame
    * compressed stream — MJPEG here). Returns the frame payloads in
    * stream order; any malformed container → None, never a throw. */
  def decodeAvi(bytes: Array[Byte]): Option[Seq[Array[Byte]]] = {
    def le32(i: Int): Int =
      (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8) |
        ((bytes(i + 2) & 0xff) << 16) | ((bytes(i + 3) & 0xff) << 24)
    def tagIs(i: Int, s: String): Boolean =
      bytes.length >= i + 4 && (0 until 4).forall(j => bytes(i + j) == s.charAt(j).toByte)
    try {
      if (bytes.length < 12 || !tagIs(0, "RIFF") || !tagIs(8, "AVI ")) return None
      if (le32(4) != bytes.length - 8) return None
      val frames = Seq.newBuilder[Array[Byte]]
      var i = 12
      while (i + 8 <= bytes.length) {
        val sz = le32(i + 4)
        if (sz < 0 || i + 8 + sz > bytes.length) return None
        if (tagIs(i, "LIST") && sz >= 4 && tagIs(i + 8, "movi")) {
          var j = i + 12
          val end = i + 8 + sz
          while (j + 8 <= end) {
            val fsz = le32(j + 4)
            if (fsz < 0 || j + 8 + fsz > end) return None
            if ((tagIs(j, "00dc") || tagIs(j, "01dc")) && fsz > 0)
              frames += java.util.Arrays.copyOfRange(bytes, j + 8, j + 8 + fsz)
            j += 8 + fsz + (fsz % 2) // even-padding rule
          }
        }
        i += 8 + sz + (sz % 2)
      }
      Some(frames.result())
    } catch { case _: IndexOutOfBoundsException => None }
  }

  /** One row per SAMPLED frame: temporal subsample (every `everyN`-th
    * frame — the pretraining video-ingest rate reduction) + full
    * per-frame baseline-JPEG decode, per-channel sums exact. */
  final case class VideoFrame(doc_id: Long, frame_idx: Long,
                              n_frames: Long, width: Int, height: Int,
                              chan_sums: Array[Long], n_px: Long)

  def withPlantedVideo(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, plantAvi(id))))
      .toDF("doc_id", "media")
  }

  /** Per-partition container walk + sampled-frame decode → typed
    * rows. Linear CPU, zero shuffle (one flatMap over the scan);
    * undecodable containers/frames emit nothing rather than failing
    * the stage — the [[decodeFeatures]] tolerance contract. */
  def videoFrames(withVideo: DataFrame, everyN: Int = 2): Dataset[VideoFrame] = {
    require(everyN > 0, s"everyN must be positive, got $everyN")
    val spark = withVideo.sparkSession
    import spark.implicits._
    withVideo.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeAvi(bytes).toSeq.flatMap { frames =>
          frames.zipWithIndex
            .filter { case (_, f) => f % everyN == 0 }
            .flatMap { case (fb, f) =>
              decodeJpeg(fb).map { case (w, h, px) =>
                val sums = new Array[Long](3)
                var i = 0
                while (i < px.length) { sums(i % 3) += px(i) & 0xff; i += 1 }
                VideoFrame(id, f.toLong, frames.length.toLong, w, h,
                  sums, w.toLong * h)
              }
            }
        }
      })
  }
}
