package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: the concat-and-chunk
  * placement — documents are laid end-to-end in a deterministic
  * order and cut into fixed-capacity token windows, so every
  * training sequence is exactly `seqLen` tokens with no padding
  * waste (the standard pretraining data layout, vs. first-fit
  * bin packing which is inherently sequential).
  *
  * Scale shape: packing is computed PER SHARD (`shardCol`), which is
  * how a 100 TB corpus is packed in practice — each shard's running
  * token offset is one partitioned analytic window (one hash
  * exchange on the shard key + one in-partition sort), not a global
  * single-partition cumulative sum. Within a shard the offsets are a
  * streaming ROWS frame; all arithmetic is integer, so the layout is
  * bit-reproducible across engines and re-runs.
  */
object Packing {

  /** Assign each document its token span in the concat-and-chunk
    * layout: global start offset within its shard, the chunk
    * (training sequence) its first token lands in, and how many
    * chunks it spans. `tokensCol` is the per-document token count
    * (any deterministic tokenizer estimate).
    */
  def packChunks(docs: DataFrame, tokensCol: Column, seqLen: Int,
                 shardCol: String = "source", idCol: String = "doc_id"): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(col(idCol), col(shardCol), tokensCol.cast("long").as("n_tok"))
      .withColumn("start_tok", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      // `div` is pure 64-bit integer division (bit-reproducible);
      // floor(col / int) would round-trip through double and lose
      // ulps above 2^53 total tokens per shard — a thin margin at
      // 100 TB (~2.5e13 tokens). An empty doc (n_tok = 0) occupies no
      // token span, so it spans 0 chunks explicitly (the arithmetic
      // alone would claim 1 whenever start_tok isn't chunk-aligned).
      .withColumn("chunk_id", expr(s"start_tok div $seqLen"))
      .withColumn("n_chunks",
        when(col("n_tok") === 0, lit(0L))
          .otherwise(expr(s"(start_tok + n_tok - 1) div $seqLen")
            - col("chunk_id") + lit(1L)))
  }

  /** Overlapping sliding-window chunking (the RAG/embedding-index
    * layout, vs. the disjoint concat-and-chunk training layout above):
    * each document is cut independently into windows of `window`
    * tokens starting every `stride` tokens, so consecutive windows
    * share `window - stride` tokens of context. Windows are emitted
    * while they still cover unseen tokens — a doc of `n` tokens gets
    * `1 + ceil((n - window) / stride)` windows (one if `n <= window`),
    * the last one truncated at `n`; empty docs emit none.
    *
    * Scale shape: no shuffle at all — one `explode(sequence(...))`
    * per row on the scan, all 64-bit integer arithmetic (`div`, not
    * double division), so the layout is bit-reproducible and the
    * operator is embarrassingly parallel at any corpus size.
    */
  def slidingWindows(docs: DataFrame, tokensCol: Column, window: Int,
                     stride: Int, idCol: String = "doc_id"): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    require(stride > 0 && stride <= window,
      s"stride must be in [1, window], got $stride (window $window)")
    docs.select(col(idCol), tokensCol.cast("long").as("n_tok"))
      .filter(col("n_tok") > 0)
      .withColumn("n_win",
        when(col("n_tok") <= window, lit(1L))
          .otherwise(expr(s"(n_tok - $window + $stride - 1) div $stride")
            + lit(1L)))
      .select(col(idCol), col("n_tok"),
        explode(sequence(lit(0L), col("n_win") - 1)).as("win_id"))
      .withColumn("win_start", col("win_id") * stride)
      .withColumn("win_len",
        least(lit(window.toLong), col("n_tok") - col("win_start")))
      .select(col(idCol), col("win_id"), col("win_start"), col("win_len"))
  }

  /** Materialize the chunk→segment rows a training loader actually
    * consumes: one row per (chunk_id, doc_id) with the doc-relative
    * token span `[tok_start, tok_start + tok_len)` that lands in that
    * chunk and its offset `chunk_off` within the chunk. Documents
    * spanning several chunks are split at every chunk boundary, so
    * per chunk the segments tile exactly `seqLen` tokens (except the
    * final partial chunk of each shard); empty docs emit no segments.
    *
    * Scale shape: [[packChunks]]'s per-shard window plus one
    * `explode(sequence(first_chunk, last_chunk))` per doc — the
    * generated row count is docs + boundary crossings, all arithmetic
    * 64-bit integer, no extra shuffle beyond the packing window.
    */
  def chunkSegments(docs: DataFrame, tokensCol: Column, seqLen: Int,
                    shardCol: String = "source", idCol: String = "doc_id"): DataFrame =
    packChunks(docs, tokensCol, seqLen, shardCol, idCol)
      .filter(col("n_tok") > 0)
      .select(col(shardCol), col(idCol), col("n_tok"), col("start_tok"),
        explode(sequence(col("chunk_id"),
          col("chunk_id") + col("n_chunks") - 1)).as("chunk_id"))
      .withColumn("seg_start",
        greatest(col("start_tok"), col("chunk_id") * seqLen))
      .withColumn("seg_end",
        least(col("start_tok") + col("n_tok"), (col("chunk_id") + 1) * seqLen))
      .select(col(shardCol), col("chunk_id"), col(idCol),
        (col("seg_start") - col("start_tok")).as("tok_start"),
        (col("seg_end") - col("seg_start")).as("tok_len"),
        (col("seg_start") - col("chunk_id") * seqLen).as("chunk_off"))
}
