package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, decoded/feature-extracted in batched partition
  * passes. The decode itself is a clearly-marked STUB (no image/audio
  * libs in this container) — deterministic fake features — but the
  * Spark-side contract is real: schema, binary column handling,
  * per-partition batching (the JVM analogue of an Arrow-batched
  * Pandas UDF), and partition-parallel execution with no shuffle.
  */
object Multimodal {

  final case class MediaMeta(doc_id: Long, n_bytes: Int, format: String,
                             width: Int, height: Int, features: Array[Float])

  /** Attach a binary "media" column. With real data this is the raw
    * image/audio payload; here it is the utf-8 payload of `text`. */
  def withBinary(docs: DataFrame): DataFrame =
    docs.withColumn("media", encode(col("text"), "utf-8"))

  /** Deterministic planted dimensions for the synthetic fixture (the
    * DuckDB oracle recomputes these arithmetically; the Spark path
    * recovers them by PARSING the planted header bytes, so a broken
    * parser hash-mismatches the oracle). */
  def plantedWidth(docId: Long): Int = ((docId * 31 + 7) % 2000 + 1).toInt
  def plantedHeight(docId: Long): Int = ((docId * 17 + 3) % 1200 + 1).toInt

  /** Build a REAL image header for the fixture: even doc_ids get a
    * valid PNG signature + IHDR chunk (correct big-endian fields and
    * CRC32 over type+data, per the public PNG spec), odd doc_ids get
    * a JPEG SOI + APP0/JFIF segment of VARIABLE length (so the SOF0
    * offset differs per doc and a fixed-offset "parser" fails) +
    * SOF0 frame header carrying height/width. The text payload
    * follows the header, standing in for the compressed pixel data. */
  def plantHeader(docId: Long, payload: Array[Byte]): Array[Byte] = {
    val w = plantedWidth(docId)
    val h = plantedHeight(docId)
    val out = new java.io.ByteArrayOutputStream(payload.length + 48)
    def be16(v: Int): Unit = { out.write(v >>> 8 & 0xff); out.write(v & 0xff) }
    def be32(v: Int): Unit = { be16(v >>> 16); be16(v & 0xffff) }
    if (docId % 2 == 0) {
      // PNG: 8-byte signature, then IHDR (len=13, type, data, CRC32)
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).foreach(out.write)
      be32(13)
      val typeAndData = new java.io.ByteArrayOutputStream(17)
      typeAndData.write("IHDR".getBytes("US-ASCII"))
      def td16(v: Int): Unit = { typeAndData.write(v >>> 8 & 0xff); typeAndData.write(v & 0xff) }
      td16(w >>> 16); td16(w & 0xffff) // width  (be32)
      td16(h >>> 16); td16(h & 0xffff) // height (be32)
      typeAndData.write(8)             // bit depth
      typeAndData.write(2)             // color type (truecolor)
      typeAndData.write(0); typeAndData.write(0); typeAndData.write(0)
      val td = typeAndData.toByteArray
      out.write(td, 0, td.length)
      val crc = new java.util.zip.CRC32()
      crc.update(td, 0, td.length)
      be32(crc.getValue.toInt)
    } else {
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
    }
    out.write(payload, 0, payload.length)
    out.toByteArray
  }

  /** REAL dependency-free image header decode: identifies the format
    * by magic bytes and parses the dimensions from the header —
    * PNG via the IHDR chunk (validating the chunk type AND its CRC32),
    * JPEG by walking length-prefixed segments from SOI to the first
    * SOFn frame header (C0–CF except the non-frame C4/C8/CC). Returns
    * ("unknown"/"corrupt", -1, -1) instead of throwing on arbitrary
    * bytes — a decode stage must never kill the job on one bad blob. */
  def parseImageHeader(bytes: Array[Byte]): (String, Int, Int) = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int): Int = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    if (bytes.length >= 8 && u8(0) == 0x89 && u8(1) == 0x50 && u8(2) == 0x4e &&
        u8(3) == 0x47 && u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a && u8(7) == 0x0a) {
      if (bytes.length >= 33 && be32(8) == 13 &&
          bytes(12) == 'I' && bytes(13) == 'H' && bytes(14) == 'D' && bytes(15) == 'R') {
        val crc = new java.util.zip.CRC32()
        crc.update(bytes, 12, 4 + 13)
        if (crc.getValue == (be32(29).toLong & 0xffffffffL))
          ("png", be32(16), be32(20))
        else ("corrupt", -1, -1)
      } else ("corrupt", -1, -1)
    } else if (bytes.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      var i = 2
      while (i + 4 <= bytes.length && u8(i) == 0xff) {
        val marker = u8(i + 1)
        if (marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          return if (i + 9 <= bytes.length) ("jpeg", be16(i + 7), be16(i + 5))
            else ("corrupt", -1, -1)
        }
        i += 2 + be16(i + 2) // segment length includes its own 2 bytes
      }
      ("corrupt", -1, -1)
    } else ("unknown", -1, -1)
  }

  /** Fixture binary column WITH planted valid image headers: the
    * utf-8 text payload prefixed by a real PNG/JPEG header built by
    * [[plantHeader]]. This is the input [[decodeFeatures]]' parser is
    * verified against end-to-end. */
  def withPlantedMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) => (id, plantHeader(id, payload)) })
      .toDF("doc_id", "media")
  }

  /** STUB payload featurizer: stands in for the pixel-level feature
    * extract (e.g. decoded-image embedding). Deterministic pure
    * function of the bytes so tests and oracles are stable; the
    * header DIMENSIONS come from the real [[parseImageHeader]]. */
  def stubFeatures(bytes: Array[Byte]): Array[Float] =
    Array.tabulate(8)(i =>
      if (i < bytes.length) (bytes(i) & 0xff) / 255.0f else 0.0f)

  /** Batched per-partition decode: binary column → typed features.
    * Dimensions are parsed from the REAL header bytes
    * ([[parseImageHeader]]); payload features remain the clearly
    * marked stub. `batchSize` models the Arrow batch shape — the
    * decode sees a buffered group of records at a time
    * (vectorized-codec-friendly), while Spark streams partitions
    * without materializing them. */
  def decodeFeatures(withMedia: DataFrame, batchSize: Int = 64): Dataset[MediaMeta] = {
    val spark = withMedia.sparkSession
    import spark.implicits._
    withMedia.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            val (fmt, w, h) = parseImageHeader(bytes)
            MediaMeta(id, bytes.length, fmt, w, h, stubFeatures(bytes))
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

  /** STUB resize: stands in for a bilinear image resize. Samples the
    * payload at `w·h` evenly-spaced offsets — deterministic, output
    * shape exactly `w·h` bytes, as a real resize would guarantee. */
  def stubResize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](w * h)
    if (bytes.nonEmpty) {
      var i = 0
      while (i < out.length) {
        out(i) = bytes((i.toLong * bytes.length / out.length).toInt)
        i += 1
      }
    }
    out
  }

  /** Batched per-partition resize to a fixed (w, h): the
    * normalize-resolution step of an image pipeline. Same contract
    * as [[decodeFeatures]]: partition-parallel, no shuffle, fixed
    * output schema. */
  def resizeTo(withMedia: DataFrame, w: Int = 32, h: Int = 32,
               batchSize: Int = 64): Dataset[Resized] = {
    val spark = withMedia.sparkSession
    import spark.implicits._
    withMedia.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.map { case (id, bytes) =>
          Resized(id, w, h, stubResize(bytes, w, h))
        })
      }
  }

  final case class Frames(doc_id: Long, n_frames: Long, n_sampled: Long,
                          frames: Array[Array[Byte]])

  /** STUB frame sampler: models a video as consecutive fixed-size
    * frames and keeps every `everyN`-th — the temporal-subsample step
    * of a video pipeline. Frame *counts* are pure arithmetic on byte
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
