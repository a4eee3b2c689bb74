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
      // floor division keeps everything in integer space; an empty
      // doc (n_tok = 0) spans 0 chunks by the same arithmetic
      .withColumn("chunk_id", floor(col("start_tok") / seqLen))
      .withColumn("n_chunks",
        floor((col("start_tok") + col("n_tok") - 1) / seqLen)
          - col("chunk_id") + lit(1L))
  }
}
