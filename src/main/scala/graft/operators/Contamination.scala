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

  /** Fuzzy (pairwise) decontamination: flag a training doc when its
    * word-3-gram Jaccard similarity to SOME single eval doc reaches
    * `minJaccardE6` — catches paraphrased/near-copy benchmark leaks
    * that [[overlapReport]]'s pooled-shingle fraction dilutes away
    * when the eval SET is large (a doc can overlap 5% with each of
    * twenty eval docs yet be a 90% copy of one of them, and vice
    * versa). Report: (doc_id, n_sh, best_jaccard_e6, best_eval_id,
    * contaminated); ties on the best score break to the smallest
    * eval id, fractions are integer `div` — bit-reproducible.
    *
    * Scale shape: the bipartite inverted index materializes ONLY
    * co-shingled (train, eval) pairs — never a cross product; any
    * pair with Jaccard ≥ ε shares a shingle, so candidate generation
    * is EXACT (no LSH recall caveat). Joins shuffle on shingle then
    * doc ids; per-doc shingle counts ride the same aggregates. Train
    * docs sharing nothing with eval appear with best = 0 via the
    * final left join.
    */
  def fuzzyReport(train: DataFrame, eval: DataFrame,
                  minJaccardE6: Long = 500000L): DataFrame = {
    require(minJaccardE6 >= 0 && minJaccardE6 <= 1000000L,
      s"minJaccardE6 must be in [0, 1e6], got $minJaccardE6")
    val trainSh = Dedup.shingleRows(train)
    val evalSh = Dedup.shingleRows(eval)
      .select(col("doc_id").as("eval_id"), col("s"))
    val trainN = trainSh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val evalN = evalSh.groupBy(col("eval_id")).agg(count(lit(1)).as("n_ev"))
    val pairJac = trainSh.join(evalSh, Seq("s"))
      .groupBy(col("doc_id"), col("eval_id"))
      .agg(count(lit(1)).as("inter"))
      .join(trainN, Seq("doc_id"))
      .join(evalN, Seq("eval_id"))
      .select(col("doc_id"), col("eval_id"),
        expr("inter * 1000000 div (n_sh + n_ev - inter)").as("jac_e6"))
    // best match per train doc: max score, ties to the smallest eval
    // id — max(struct) orders lexicographically, so negate the id
    val best = pairJac
      .groupBy(col("doc_id"))
      .agg(max(struct(col("jac_e6"), (-col("eval_id")).as("neg_eval")))
        .as("top"))
      .select(col("doc_id"), col("top.jac_e6").as("best_jaccard_e6"),
        (-col("top.neg_eval")).as("best_eval_id"))
    trainN.join(best, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_sh"),
        coalesce(col("best_jaccard_e6"), lit(0L)).as("best_jaccard_e6"),
        col("best_eval_id"),
        (coalesce(col("best_jaccard_e6"), lit(0L)) >= minJaccardE6)
          .as("contaminated"))
  }
}
