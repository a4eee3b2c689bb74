package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/eval contamination detection (decontamination): flag
  * training documents that share word-shingles with a held-out
  * evaluation set — the standard pre-training hygiene pass that keeps
  * benchmark text out of the training corpus.
  *
  * Mechanics: both sides are reduced to DISTINCT word-3-shingle rows
  * ([[Dedup.shingleRows]] — the same shingle definition the Jaccard
  * and MinHash dedup paths use, so one shingle pass can feed all
  * three). The eval side collapses to a distinct shingle SET; a left
  * join marks which train shingles are contaminated, and one
  * aggregate per train doc yields (total shingles, overlapping
  * shingles, overlap fraction, contaminated flag). All comparisons
  * are integer arithmetic, so the report is bit-reproducible across
  * engines.
  *
  * Scale shape: eval suites are tiny relative to a 100 TB corpus
  * (benchmarks are MBs, not TBs), so the eval shingle set broadcasts
  * and the train side is ONE scan + one doc_id-keyed aggregate — the
  * corpus is never shuffled on shingle. For an eval side too large to
  * broadcast, pass `broadcastEval = false` and the same plan degrades
  * to a shuffled hash join keyed on the shingle (still no cross
  * product, still one aggregate).
  *
  * Docs with fewer than 3 tokens have no shingles and are absent from
  * the report (nothing to match on — same convention as the Jaccard
  * path).
  */
object Contamination {

  /** Per-train-doc overlap report: (doc_id, n_shingles, n_overlap,
    * contam_e6, contaminated). `thresholdE6` is the overlap fraction
    * (×1e6) at or above which a doc is flagged; the flag compare is
    * pure integer (`n_overlap·1e6 ≥ threshold·n_shingles`), never a
    * float round-trip. */
  def overlapReport(train: DataFrame, eval: DataFrame,
                    thresholdE6: Long = 100000L,
                    broadcastEval: Boolean = true): DataFrame = {
    require(thresholdE6 >= 0 && thresholdE6 <= 1000000L,
      s"thresholdE6 must be in [0, 1e6], got $thresholdE6")
    val trainSh = Dedup.shingleRows(train)
    val evalSet = Dedup.shingleRows(eval).select(col("s")).distinct()
      .withColumn("hit", lit(1L))
    val evalSide = if (broadcastEval) broadcast(evalSet) else evalSet
    trainSh.join(evalSide, Seq("s"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        coalesce(sum(col("hit")), lit(0L)).as("n_overlap"))
      .select(col("doc_id"), col("n_shingles"), col("n_overlap"),
        expr("n_overlap * 1000000 div n_shingles").as("contam_e6"),
        (col("n_overlap") * lit(1000000L) >=
          lit(thresholdE6) * col("n_shingles")).as("contaminated"))
  }
}
