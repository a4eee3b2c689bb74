package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines over the
  * `documents` table (FIXTURES.md §A): tokenization, quality
  * scoring, language-ID heuristic, token counting, fingerprinting.
  * All pure `functions._` column expressions — whole-stage codegen,
  * no UDFs, embarrassingly parallel (no shuffle at 100 TB: these are
  * per-row maps over a parquet scan with column pruning).
  */
object TextOps {

  /** Whitespace tokens (single-space split, DuckDB-`string_split`
    * compatible: keeps empty tokens). */
  def tokens(text: Column): Column = split(text, " ")

  /** Alphanumeric regex tokens — the "BPE-ish" lexer class. */
  def regexTokens(text: Column): Column =
    regexp_extract_all(text, lit("[a-z0-9]+"), lit(0))

  private val StopWords = Seq("the", "a", "of", "and", "in")

  def stopwordCount(toks: Column): Column =
    size(filter(toks, t => t.isin(StopWords: _*)))

  /** Per-document stats: token count, chars/token, stopword ratio.
    * Ratios are emitted as tie-free floor(x*1e6) integers: the raw
    * doubles are bitwise identical across engines, but decimal
    * `round()` tie rules differ (Spark HALF_UP on shortest repr vs
    * DuckDB nearbyint on the scaled binary) — measured as a 1-ulp
    * FAIL on exact-decimal ties at sf0.01. */
  def textStats(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"), col("n_chars"),
      size(tokens(col("text"))).cast("long").as("n_tokens"),
      floor(col("n_chars").cast("double") / size(tokens(col("text"))) * 1e6)
        .cast("long").as("chars_per_token_e6"),
      floor(stopwordCount(tokens(col("text"))).cast("double")
        / size(tokens(col("text"))) * 1e6).cast("long").as("stopword_ratio_e6"))

  /** Token counting: regex tokens + a bytes/4 BPE-count estimate. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(regexTokens(col("text"))).cast("long").as("n_word_tokens"),
      ceil(col("n_chars").cast("double") / 4.0).cast("long").as("n_bpe_est"))

  /** N-gram-heuristic language ID: stopword density → `en`, else by
    * doc length parity of heuristic classes. Deterministic, oracle-
    * expressible; a real model would plug into the same column shape. */
  def langId(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val ratio = stopwordCount(toks).cast("double") / size(toks)
    docs.select(col("doc_id"), col("lang").as("lang_true"),
      when(ratio >= 0.05, lit("en")).otherwise(lit("unk")).as("lang_pred"),
      floor(ratio * 1e6).cast("long").as("en_score_e6"))
  }

  /** Composite quality score in [0,1]: length, stopword, token-shape
    * components (the usual pre-training heuristic filter family). */
  def qualityScore(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("double")
    val stopRatio = stopwordCount(toks).cast("double") / nTok
    val avgTokLen = col("n_chars").cast("double") / nTok
    docs.select(col("doc_id"),
      floor((least(nTok / 100.0, lit(1.0)) * 0.3
        + stopRatio * 0.4
        + least(avgTokLen / 8.0, lit(1.0)) * 0.3) * 1e6).cast("long").as("quality_e6"))
  }

  /** Canonical text normalization for dedup keys and model input:
    * lowercase → strip everything but [a-z0-9 ] → collapse runs of
    * spaces → trim. Kept to POSIX character classes so the same
    * regexes mean the same thing in Java regex and RE2-family
    * engines (portable normalization is what makes cross-system
    * dedup keys comparable). Pure codegen'd string expressions —
    * per-row map, no shuffle, scales with the scan. */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", ""), "  +", " "))

  /** doc_id + normalized text + its length (the normalized-key view
    * a dedup pipeline fingerprints). */
  def normalized(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), normalize(col("text")).as("norm_text"))
      .withColumn("n_norm_chars", length(col("norm_text")).cast("long"))

  /** Document fingerprints: full-text md5 + 64-bit prefix — identical
    * hex in Spark and DuckDB, so exact-dedup keys are portable. */
  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      md5(col("text")).as("fp_md5"),
      substring(md5(col("text")), 1, 16).as("fp64"))
}
