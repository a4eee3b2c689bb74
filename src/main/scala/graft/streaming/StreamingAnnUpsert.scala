package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.AnnIndex
import graft.sources.CorpusSink

/** Streaming UPSERT — the re-embedding pipeline's ingest shape, and
  * the streaming twin of [[AnnIndex.upsertIvfq]] (every other
  * lifecycle op already has one: append [[StreamingAnnAppend]],
  * delete [[StreamingIndexDelete]], maintenance
  * [[StreamingAnnMaintain]]). Each micro-batch carries
  * replace-or-insert vectors (a model revision re-embedding live
  * documents, plus newly admitted ones), and BOTH halves of the
  * serving state take it with replace semantics:
  *
  *  - the full-precision ROW STORE via [[CorpusSink.upsertShards]] —
  *    a plain `append` here would accumulate stale versions that
  *    every exact re-rank and every drift refit would read (the
  *    corpus-side twin of the tombstone-resurrection bug the refit
  *    valve folds away);
  *  - the stored index via [[AnnIndex.upsertIvfq]] —
  *    delete → physical purge → append under the frozen centroids.
  *
  * Exactly-once WITHOUT admission-level dedup: unlike append,
  * upsert is naturally idempotent — a replayed micro-batch replaces
  * rows with themselves and re-inserts ids that already exist,
  * landing the identical state (`StreamingAnnUpsertSpec` replays a
  * batch body and asserts both stores byte-stable). Use a
  * checkpointLocation anyway to avoid paying the replay.
  *
  * The corpus store must be `cbucket`-sharded (bootstrapped here on
  * first batch): replacement rows must land in the SAME shard as
  * the rows they replace, so the shard key is derived from the id,
  * never from arrival time. Drift/compaction valves stay a separate
  * concern — run [[StreamingAnnMaintain.maintain]] on the operator's
  * schedule; upserts bump the manifest's appended AND deleted counts,
  * so re-embedding churn counts toward the refit trigger like any
  * other drift. */
object StreamingAnnUpsert {

  /** One micro-batch of replace-or-insert — split out so a spec (or
    * a batch backfill) can run the exact sink body. */
  def upsertBatch(batch: DataFrame, indexDir: String, corpusDir: String,
                  nBuckets: Int = 16, filesPerShard: Int = 2): Unit = {
    val rows = batch.select(col("vec_id"), col("embedding"))
      .withColumn("cbucket", pmod(hash(col("vec_id")), lit(nBuckets)))
    CorpusSink.upsertShards(rows, corpusDir, shardCol = "cbucket",
      idCol = "vec_id", filesPerShard = filesPerShard)
    AnnIndex.upsertIvfq(batch.select(col("vec_id"), col("embedding")),
      indexDir, filesPerShard)
  }

  /** Attach the upsert sink to a streaming embeddings frame
    * (`vec_id`, `embedding`). `indexDir` must hold a built index;
    * `corpusDir` is the bucketed row store (bootstrapped on first
    * batch — seed it with the build corpus via
    * [[CorpusSink.upsertShards]] for refits to see the full
    * corpus). */
  def sink(vecs: DataFrame, indexDir: String, corpusDir: String,
           nBuckets: Int = 16, filesPerShard: Int = 2): DataStreamWriter[Row] =
    vecs.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      upsertBatch(batch, indexDir, corpusDir, nBuckets, filesPerShard)
    }

  /** Read the bucketed row store back as a plain (vec_id, embedding)
    * corpus — what serving and refits consume. */
  def corpus(spark: SparkSession, corpusDir: String): DataFrame =
    spark.read.parquet(corpusDir).select(col("vec_id"), col("embedding"))
}
