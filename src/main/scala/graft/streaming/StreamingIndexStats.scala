package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.Retrieval

/** Streaming maintenance of the BM25 inverted-index statistics — the
  * live half of a retrieval deployment: documents stream in, and the
  * scoring-side tables (per-term document frequency, corpus doc
  * count, total token length) stay continuously current.
  *
  * There is deliberately NO new aggregation logic here: df and the
  * corpus scalars are PLAIN ADDITIVE aggregations (each document
  * arrives exactly once and contributes each distinct term once), so
  * the exact batch expressions from [[Retrieval.dfCounts]] /
  * [[Retrieval.corpusStats]] run unchanged over an unbounded frame in
  * update/complete mode — Spark's streaming state IS the index. That
  * identity is the parity contract: after any arrival pattern of the
  * same documents, the streamed tables are bit-equal to the batch
  * ones, hence BM25 scores computed from them are bit-equal too
  * (checked in StreamingIndexStatsSpec across micro-batch splits).
  *
  * Scale shape at 100 TB/day ingest: state is VOCABULARY-sized (one
  * long per term — the same boundedness any inverted index carries,
  * with the usual long-tail cap: fold rare terms below a df floor
  * into the stored index periodically); the per-batch work is the
  * batch plan's map-side partial aggregation, shuffling only
  * vocabulary-keyed partials.
  */
object StreamingIndexStats {

  /** Per-term df over a (possibly streaming) documents frame. */
  def dfCounts(docs: DataFrame): DataFrame = Retrieval.dfCounts(docs)

  /** Corpus (n_docs, sum_dl) over a (possibly streaming) frame. */
  def corpusStats(docs: DataFrame): DataFrame = Retrieval.corpusStats(docs)
}
