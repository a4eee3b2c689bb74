package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Deduplication operators for LLM training-data pipelines:
  * exact (hash group-by), MinHash+LSH banding, SimHash, n-gram
  * Jaccard, embedding-cosine near-dup.
  *
  * Design for scale: the near-dup operators are built on
  * explode → codegen'd hash aggregation, NOT nested higher-order
  * functions. Spark HOFs are `CodegenFallback` (interpreted) and
  * re-evaluate inner expressions per lambda element, which turns
  * nested token pipelines into O(n²) row work — measured as a hang
  * at sf0.001 before this design. The explode shape keeps every hot
  * expression inside whole-stage codegen, does map-side partial
  * aggregation, and shuffles only (doc_id)-keyed or
  * (band-bucket)-keyed rows — never a cross product.
  */
object Dedup {

  /** Exact dedup on the sha256 text digest: one row per distinct
    * content, keeping the smallest doc_id. Single hash-partitioned
    * groupBy on the digest; at 100 TB this is the canonical
    * shuffle-on-fingerprint dedup. */
  def exact(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), sha2(col("text"), 256).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Distinct word-3-shingles, one row per (doc_id, shingle).
    * posexplode + lead window: one shuffle by doc_id, all shingle
    * construction codegen'd. */
  def shingleRows(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    docs.select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w0")))
      .withColumn("w1", lead(col("w0"), 1).over(w))
      .withColumn("w2", lead(col("w0"), 2).over(w))
      .filter(col("w2").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("w0"), col("w1"), col("w2")).as("s"))
      .distinct()
  }

  private val MinhashPrime = 2147483647L // 2^31 - 1

  /** MinHash signatures via grouped min-aggregates: permutation k is
    * h_k(s) = (base·(2k+1) + k·c) mod p over base = murmur3(s)&maxint.
    * One groupBy(doc_id) with numHashes min() columns — map-side
    * combine, fully codegen'd. */
  def minhash(docs: DataFrame, numBands: Int = 8, rowsPerBand: Int = 4): DataFrame = {
    val numHashes = numBands * rowsPerBand
    val sh = shingleRows(docs)
      .withColumn("h", hash(col("s")).cast("long").bitwiseAND(lit(0x7fffffffL)))
    val sigCol = array((0 until numHashes).map(k =>
      min(pmod(col("h") * (2 * k + 1) + lit(k * 40503L), lit(MinhashPrime)))): _*)
    sh.groupBy(col("doc_id")).agg(sigCol.as("sig"))
      .withColumn("bands", lshBands(col("sig"), numBands, rowsPerBand))
  }

  /** LSH band keys: hash of each `rowsPerBand`-slice of the signature
    * (cheap HOF over an already-materialized attribute). */
  def lshBands(sig: Column, numBands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(numBands - 1)),
      b => hash(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand))))

  /** Candidate near-dup pairs = documents sharing ≥1 LSH band bucket.
    * Shuffle is on (band_idx, band_hash) — bucket-local self-join. */
  def minhashCandidates(withBands: DataFrame): DataFrame = {
    val b = withBands.select(col("doc_id"), posexplode(col("bands")).as(Seq("band", "bh")))
    val l = b.select(col("band"), col("bh"), col("doc_id").as("a"))
    val r = b.select(col("band"), col("bh"), col("doc_id").as("b"))
    l.join(r, Seq("band", "bh")).filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
  }

  /** Estimated Jaccard = fraction of agreeing signature positions. */
  def minhashEstimate(withSig: DataFrame, candidates: DataFrame): DataFrame = {
    val sa = withSig.select(col("doc_id").as("a"), col("sig").as("sig_a"))
    val sb = withSig.select(col("doc_id").as("b"), col("sig").as("sig_b"))
    candidates.join(sa, "a").join(sb, "b")
      .select(col("a"), col("b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) =>
          when(x === y, lit(1)).otherwise(lit(0))), v => v === 1)).cast("double")
          / size(col("sig_a"))).as("est_jaccard"))
  }

  /** 64-bit SimHash: explode tokens → xxhash64 → 64 bit-vote sums in
    * one grouped aggregate → reassemble bits; plus 4×16-bit band keys
    * for hamming-banded near-dup joins. */
  def simhash(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .select(col("doc_id"), xxhash64(col("t")).as("h"))
    val voteCols = (0 until 64).map(b =>
      sum(shiftright(col("h"), b).bitwiseAND(lit(1L)) * 2 - 1).as(s"v$b"))
    val votes = tok.groupBy(col("doc_id")).agg(voteCols.head, voteCols.tail: _*)
    val simhashCol = (0 until 64).map(b =>
      when(col(s"v$b") >= 0, lit(1L << b)).otherwise(lit(0L))).reduce(_ bitwiseOR _)
    votes.select(col("doc_id"), simhashCol.as("simhash"))
      .withColumn("bands", array((0 until 4).map(b =>
        shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xffffL))): _*))
  }

  /** N-gram (word 3-shingle) Jaccard via an inverted-index join:
    * shingle rows → join on shingle → pair intersection counts →
    * |A∩B| / (|A|+|B|−|A∩B|). Only pairs sharing ≥1 shingle are
    * materialized. */
  def ngramJaccardPairs(docs: DataFrame, minJaccard: Double): DataFrame = {
    val sh = shingleRows(docs)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = sh.select(col("s"), col("doc_id").as("a"))
      .join(sh.select(col("s"), col("doc_id").as("b")), "s")
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("a"), col("n").as("na")), "a")
      .join(sizes.select(col("doc_id").as("b"), col("n").as("nb")), "b")
      .select(col("a"), col("b"), col("inter"),
        round(col("inter").cast("double")
          / (col("na") + col("nb") - col("inter")), 6).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Embedding-cosine near-dup stats per probe vector: neighbor count
    * above threshold + max cosine. Norms are precomputed per side so
    * the per-pair work is just the dot product. */
  def embeddingNearDup(probes: DataFrame, candidates: DataFrame,
                       threshold: Double): DataFrame = {
    val p = broadcast(probes.select(col("vec_id").as("qid"),
        VectorOps.asDoubleArray(col("embedding")).as("qv"))
      .withColumn("qn", VectorOps.l2Norm(col("qv"))))
    val c = candidates.select(col("vec_id").as("cid"),
        VectorOps.asDoubleArray(col("embedding")).as("cv"))
      .withColumn("cn", VectorOps.l2Norm(col("cv")))
    p.join(c, col("qid") =!= col("cid"))
      .select(col("qid"),
        when(col("qn") * col("cn") > 0,
          VectorOps.dotArr(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
      .groupBy("qid")
      .agg(sum(when(col("cos") > threshold, 1L).otherwise(0L)).as("n_near"),
        round(max(col("cos")), 6).as("max_cos"))
  }
}
