package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, decoded/feature-extracted in batched partition
  * passes (the JVM analogue of an Arrow-batched Pandas UDF), with
  * partition-parallel execution and no shuffle.
  *
  * The PNG path is a REAL dependency-free decoder: planted fixtures
  * carry genuine zlib-compressed IDAT scanlines (java.util.zip
  * Deflater at plant time), and [[decodePng]] walks the chunk
  * stream (CRC32-validated), inflates with java.util.zip.Inflater,
  * and unfilters all five PNG filter types (None/Sub/Up/Average/
  * Paeth, per the public PNG spec) to recover actual pixels; the
  * emitted features are the real per-channel sums/means of those
  * pixels. JPEG stays header-only (SOI→SOFn segment walk for
  * dimensions): entropy-coded payload decode needs a Huffman+DCT
  * decoder, out of scope — JPEG rows honestly report NO payload
  * features rather than fabricated ones.
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
    * pixel-bearing PNG from [[plantPng]]; odd doc_ids get a JPEG
    * SOI + APP0/JFIF segment of VARIABLE length (so the SOF0 offset
    * differs per doc and a fixed-offset "parser" fails) + SOF0 frame
    * header carrying height/width, followed by the payload standing
    * in for the entropy-coded data. */
  def plantHeader(docId: Long, payload: Array[Byte]): Array[Byte] = {
    if (docId % 2 == 0) return plantPng(docId)
    val w = plantedWidth(docId)
    val h = plantedHeight(docId)
    val out = new java.io.ByteArrayOutputStream(payload.length + 48)
    def be16(v: Int): Unit = { out.write(v >>> 8 & 0xff); out.write(v & 0xff) }
    // JPEG: SOI, APP0 with (docId % 8) pad bytes, SOF0
    out.write(0xff); out.write(0xd8)                  // SOI
    val pad = (docId % 8).toInt
    out.write(0xff); out.write(0xe0)                  // APP0 marker
    be16(16 + pad)                                    // len incl. itself
    out.write("JFIF".getBytes("US-ASCII")); out.write(0)
    out.write(1); out.write(1)                        // version
    out.write(0); be16(72); be16(72)                  // density
    out.write(0); out.write(0)                        // thumbnail
    (0 until pad).foreach(_ => out.write(0))
    out.write(0xff); out.write(0xc0)                  // SOF0 marker
    be16(8 + 3 * 3)                                   // len: 3 components
    out.write(8)                                      // precision
    be16(h); be16(w)                                  // height, width
    out.write(3)                                      // n components
    (1 to 3).foreach { c => out.write(c); out.write(0x11); out.write(0) }
    out.write(payload, 0, payload.length)
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

  /** Batched per-partition decode: binary column → typed features.
    * Dimensions come from the real header parse; for PNGs the
    * features are the REAL per-channel means of the inflate+unfilter
    * decoded pixels (with exact integer channel sums alongside, so
    * oracles can verify in exact fixed-point arithmetic); JPEGs
    * (header-only decode) report empty features. `batchSize` models
    * the Arrow batch shape — the decode sees a buffered group of
    * records at a time (vectorized-codec-friendly), while Spark
    * streams partitions without materializing them. */
  def decodeFeatures(withMedia: DataFrame, batchSize: Int = 64): Dataset[MediaMeta] = {
    val spark = withMedia.sparkSession
    import spark.implicits._
    withMedia.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            val (fmt, w, h) = parseImageHeader(bytes)
            decodePng(bytes) match {
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

  /** Columnar metadata-only path (no decode): byte length + fake
    * dimensions derived arithmetically — SQL-expressible, oracled. */
  def mediaMeta(docs: DataFrame): DataFrame =
    withBinary(docs).select(col("doc_id"),
      length(col("media")).cast("long").as("n_bytes"),
      (pmod(length(col("media")), lit(640)) + 1).cast("long").as("fake_width"),
      (pmod(length(col("media")), lit(480)) + 1).cast("long").as("fake_height"))

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

  /** Batched per-partition resize to a fixed (w, h): decodes the PNG
    * payload ([[decodePng]]) and nearest-neighbor-resamples the real
    * pixels. Non-decodable media (JPEG header-only rows, corrupt
    * blobs) yield empty pixels rather than failing the stage. Same
    * contract as [[decodeFeatures]]: partition-parallel, no shuffle,
    * fixed output schema. */
  def resizeTo(withMedia: DataFrame, w: Int = 32, h: Int = 32,
               batchSize: Int = 64): Dataset[Resized] = {
    val spark = withMedia.sparkSession
    import spark.implicits._
    withMedia.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.map { case (id, bytes) =>
          decodePng(bytes) match {
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
}
