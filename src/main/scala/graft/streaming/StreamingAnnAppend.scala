package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.AnnIndex

/** Streaming maintenance of the stored IVF×int8 ANN index — the
  * vector counterpart of [[StreamingIndexAppend]]: admitted
  * embeddings stream in, and every micro-batch lands in the
  * cid-partitioned stored index via [[AnnIndex.appendIvfq]] —
  * quantize, assign against the FROZEN stored centroids, append new
  * files under only the cells the batch occupies. Nothing existing
  * is listed or rewritten; per-batch work is O(batch · nlist) for
  * the assignment plus the batch-sized write.
  *
  * Unlike the lexical index (whose first micro-batch can bootstrap
  * an empty directory — stats are plain additive counts), the IVF
  * index REQUIRES a prior [[AnnIndex.buildIvfqIndex]]: cell
  * assignment needs fitted centroids, and fitting is a corpus-level
  * offline step. That split — fit offline once, ingest online
  * forever against the frozen cells — is exactly the production
  * serving shape (FAISS/SCaNN deployments retrain centroids on a
  * schedule, not per arrival); drift is handled by a periodic
  * rebuild, file growth by [[AnnIndex.compactIvfq]].
  *
  * Parity contract: because build and append share one row function
  * (`AnnIndex.ivfqRows` — same quantization, same frozen-centroid
  * argmax), the stored rows after ANY micro-batch arrival pattern
  * are row-identical to one batch append of the union, hence to a
  * rebuild under the same centroids — so the served top-k is
  * bit-identical too (`StreamingAnnAppendSpec` proves both). */
object StreamingAnnAppend {

  /** Attach the IVF-append sink to a streaming embeddings frame
    * (`vec_id`, `embedding`). `dir` must hold a built index
    * (centroid sidecar + vectors). Each micro-batch appends exactly
    * once per epoch; use a checkpointLocation for exactly-once
    * ingest. */
  def sink(vecs: DataFrame, dir: String,
           filesPerShard: Int = 2): DataStreamWriter[Row] =
    vecs.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      AnnIndex.appendIvfq(batch, dir, filesPerShard)
    }
}
