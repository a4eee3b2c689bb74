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

  final case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int,
                             height: Int, features: Array[Float])

  /** Attach a binary "media" column. With real data this is the raw
    * image/audio payload; here it is the utf-8 payload of `text`. */
  def withBinary(docs: DataFrame): DataFrame =
    docs.withColumn("media", encode(col("text"), "utf-8"))

  /** STUB decoder: stands in for an image decode (e.g. JPEG →
    * width/height/pixels). Deterministic pure function of the bytes
    * so tests and oracles are stable. Swap body for a real codec. */
  def stubDecode(bytes: Array[Byte]): (Int, Int, Array[Float]) = {
    val n = bytes.length
    val w = n % 640 + 1
    val h = n % 480 + 1
    val feats = Array.tabulate(8)(i =>
      if (i < n) (bytes(i) & 0xff) / 255.0f else 0.0f)
    (w, h, feats)
  }

  /** Batched per-partition decode: binary column → typed features.
    * `batchSize` models the Arrow batch shape — the decode sees a
    * buffered group of records at a time (vectorized-codec-friendly),
    * while Spark streams partitions without materializing them. */
  def decodeFeatures(withMedia: DataFrame, batchSize: Int = 64): Dataset[MediaMeta] = {
    val spark = withMedia.sparkSession
    import spark.implicits._
    withMedia.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            val (w, h, f) = stubDecode(bytes)
            MediaMeta(id, bytes.length, w, h, f)
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
