package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.Retrieval

/** Streaming maintenance of the FULL stored BM25 index — the
  * postings themselves, not just the scoring statistics
  * ([[StreamingIndexStats]] keeps those live): documents stream in,
  * and every micro-batch lands in the term-bucketed stored index via
  * [[Retrieval.appendIndex]] — new postings files under only the
  * buckets the batch's terms hash to, plus an additive 1-row stats
  * merge. The first micro-batch bootstraps an empty index directory,
  * so ingest needs no out-of-band build step.
  *
  * Parity contract (the twin invariant every `graft.streaming`
  * module carries): because serving derives each queried term's
  * global df from the postings it already reads
  * ([[Retrieval.bm25TopKFromIndex]]), the index after ANY arrival
  * pattern of the same documents serves BIT-identically to one
  * batch build over their union — `StreamingIndexAppendSpec` proves
  * it across micro-batch splits.
  *
  * Scale shape at 100 TB/day: per-batch work is O(batch postings)
  * with one term-keyed shuffle; nothing existing is re-listed or
  * rewritten; file counts grow per batch (bounded by
  * `filesPerShard · touched buckets`), with the usual periodic
  * compaction (a per-bucket rewrite) as the maintenance valve. */
object StreamingIndexAppend {

  /** Attach the index-append sink to a streaming documents frame
    * (`doc_id`, `text`). Each micro-batch appends exactly once per
    * epoch; use a checkpointLocation for exactly-once ingest. */
  def sink(docs: DataFrame, dir: String, nBuckets: Int = 16,
           filesPerShard: Int = 2): DataStreamWriter[Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      Retrieval.appendIndex(batch, dir, nBuckets, filesPerShard)
    }

  /** The append sink WITH the compaction valve in the loop — the
    * lexical twin of [[StreamingAnnMaintain.sink]]: after each
    * micro-batch lands, [[Retrieval.compactIndex]] polls the
    * per-bucket file counts (driver-side dir listing, free) and
    * folds any bucket past `maxFilesPerBucket` back to the layout
    * contract. Serving is bit-unchanged across a fold
    * (`IndexCompactionSpec`), so the stream never pauses for it;
    * there is no BM25 refit valve because the lexical index has no
    * fitted component to drift — df and stats are exact under any
    * append sequence by construction. */
  def maintainingSink(docs: DataFrame, dir: String, nBuckets: Int = 16,
                      filesPerShard: Int = 2,
                      maxFilesPerBucket: Int = 8): DataStreamWriter[Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      Retrieval.appendIndex(batch, dir, nBuckets, filesPerShard)
      Retrieval.compactIndex(batch.sparkSession, dir, filesPerShard,
        maxFilesPerBucket)
      ()
    }
}
