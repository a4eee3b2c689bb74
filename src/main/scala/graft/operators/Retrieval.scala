package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse lexical retrieval over the `documents` table — the BM25
  * ranking primitive a RAG / eval-retrieval pipeline fronts its
  * corpus with (Robertson & Spärck Jones probabilistic relevance
  * framework; the Lucene `k1`/`b` parameterization).
  *
  * Scale shape at 100 TB:
  *  - the corpus is tokenized ONCE; `(doc, term)` tf partials are
  *    map-side combined before the single term-keyed shuffle — the
  *    inverted-index build;
  *  - the query-term table is tiny (`nQueryTerms` rows) and
  *    broadcast, so the postings join never shuffles the corpus a
  *    second time — only postings of the queried terms flow;
  *  - document length and the global `avgdl` scalar come from the
  *    same scan (map-side count + one 1-row broadcast crossJoin);
  *  - the final top-k is a `TakeOrdered` (per-partition heap + one
  *    k-row driver merge), never a global sort.
  *
  * Cross-engine determinism: the per-(doc, term) BM25 contribution
  * is floor-quantized to an e6 integer BEFORE the per-doc sum, so
  * aggregation is exact integer math (partition-order independent)
  * and the only float expressions (idf, length norm) are evaluated
  * in one fixed parenthesization shared verbatim with the oracle
  * SQL. Tie-break on the k boundary is total: (score desc, doc_id).
  */
object Retrieval {

  /** Per-term document frequency — the stats half of an inverted
    * index. One term-keyed shuffle of already-distinct map-side
    * partials. The SAME aggregation expression runs unchanged over a
    * streaming frame (see `streaming.StreamingIndexStats`): df is a
    * plain additive count because every document arrives exactly
    * once and contributes each distinct term once. */
  def dfCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode(array_distinct(TextOps.regexTokens(col("text")))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))

  /** Corpus-level (n_docs, sum_dl) — the scalar half of the index
    * stats; also streaming-compatible (one global additive agg). */
  def corpusStats(docs: DataFrame): DataFrame =
    docs.select(size(TextOps.regexTokens(col("text"))).cast("long").as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))

  // fixed float parenthesization — shared verbatim between the
  // inline and stored-index paths AND the oracle text. One accepted
  // cross-engine caveat, per the repo float rules: idf goes through
  // ln(), and a last-ulp difference between DuckDB's and Spark's ln
  // implementations could in principle flip the floor(x·1e6)
  // quantization of a per-(doc,term) contribution (the e6 floor
  // BEFORE the per-doc sum removes order dependence, not
  // transcendental drift; SqlParitySpec runs both texts in Spark so
  // it cannot catch it either). Both engines use correctly-rounded
  // or near-correctly-rounded libm ln and every compared value at
  // the gate SFs sits well off a quantization boundary, so the risk
  // is accepted and DOCUMENTED rather than padded away; if a future
  // fixture ever lands on a boundary, the remedy is the rows-only
  // fallback (drop the oracle hash for this key), not a guard band
  // that would change published scores.
  private def idfExpr: Column = log(lit(1.0)
    + (col("n_docs").cast("double") - col("df") + lit(0.5))
      / (col("df").cast("double") + lit(0.5)))

  private def normExpr(k1: Double, b: Double): Column = {
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    col("tf").cast("double") * (lit(k1) + 1.0) /
      (col("tf").cast("double")
        + lit(k1) * (lit(1.0) - lit(b) + lit(b) * (col("dl").cast("double") / avgdl)))
  }

  /** BM25 top-k with the query-term set derived from the corpus
    * itself (top-`nQueryTerms` non-stopword terms by document
    * frequency; df desc, term asc) so the query is fixture-agnostic.
    *
    * This gate query recomputes the index stats inline to stay
    * self-contained (4 column-pruned scans of the text column); the
    * production path builds the stored index ONCE ([[buildIndex]],
    * or maintains its stats live — `streaming.StreamingIndexStats`)
    * and serves every query from it ([[bm25TopKFromIndex]]).
    *
    * Output: (doc_id, n_hit, bm25_e6) — the k best documents.
    */
  def bm25TopK(docs: DataFrame, nQueryTerms: Int = 3, k: Int = 10,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val qterms = dfCounts(docs)
      .filter(!col("term").isin("the", "a", "of", "and", "in"))
      .orderBy(col("df").desc, col("term")).limit(nQueryTerms)
    bm25Scores(docs, qterms, k1, b)
      .orderBy(col("bm25_e6").desc, col("doc_id"))
      .limit(k)
  }

  /** Per-doc BM25 scores for an explicit query-term frame (`term`
    * [, `df`]) — the scoring core [[bm25TopK]] tops and
    * [[hybridTopK]]'s sparse side ranks. `qterms` is query-sized and
    * broadcast; df is recomputed from the corpus here so any caller's
    * term frame works. Output: (doc_id, n_hit, bm25_e6) for every doc
    * matching ≥1 term. */
  def bm25Scores(docs: DataFrame, qterms: DataFrame,
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val dt = docs.select(col("doc_id"),
      explode(TextOps.regexTokens(col("text"))).as("term"))
    val df = dfCounts(docs)
    val q = df.join(broadcast(qterms.select("term")), Seq("term"))
    val dl = docs.select(col("doc_id"),
      size(TextOps.regexTokens(col("text"))).cast("long").as("dl"))
    val stats = corpusStats(docs)
    val tf = dt.join(broadcast(q), Seq("term"))
      .groupBy(col("doc_id"), col("term"), col("df"))
      .agg(count(lit(1)).as("tf"))
    tf.join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        floor(idfExpr * normExpr(k1, b) * lit(1e6)).cast("long").as("score_e6"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hit"), sum(col("score_e6")).as("bm25_e6"))
  }

  /** Reciprocal-rank fusion (Cormack et al. SIGIR'09) — the standard
    * hybrid-retrieval merge of a sparse (lexical) and a dense
    * (vector) ranking. Takes the two rank frames AS INPUT — (id,
    * rank) with rank 1-based — so the fusion is ranking-source
    * agnostic: the gate key feeds exact cosine ranks (oracle-able),
    * a deployment feeds ANN ranks (`HybridRetrievalSpec` proves the
    * IVF composition); either side may be a top-N cut.
    *
    * Scores are EXACT integers: rrf_e9 = ⌊1e9/(kRrf+r_sparse)⌋ +
    * ⌊1e9/(kRrf+r_dense)⌋, a missing side contributing 0 — integer
    * division keeps the fusion bit-stable across engines, and ranks
    * (not raw scores) make it scale-free, which is the point of RRF.
    * Both inputs are top-N-bounded, so the full-outer join is
    * query-sized — never corpus-sized. */
  def rrfFuse(sparse: DataFrame, dense: DataFrame, k: Int = 10,
              kRrf: Int = 60): DataFrame = {
    val s = sparse.select(col("doc_id"), col("rank").as("r_sparse"))
    val d = dense.select(col("doc_id"), col("rank").as("r_dense"))
    s.join(d, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        (coalesce(expr(s"1000000000 DIV ($kRrf + r_sparse)"), lit(0L))
          + coalesce(expr(s"1000000000 DIV ($kRrf + r_dense)"), lit(0L)))
          .cast("long").as("rrf_e9"),
        coalesce(col("r_sparse"), lit(0L)).as("r_sparse"),
        coalesce(col("r_dense"), lit(0L)).as("r_dense"))
      .orderBy(col("rrf_e9").desc, col("doc_id"))
      .limit(k)
  }

  /** Materialized inverted-index build — the serving layout the
    * 100 TB deployment reads instead of re-deriving stats per query:
    *
    *  - `dir/postings`: one row per (term, doc) — (term, df, doc_id,
    *    dl, tf, term_bucket) — PARTITIONED BY `term_bucket =
    *    pmod(hash(term), nBuckets)` through
    *    [[graft.sources.CorpusSink.writeParquet]], in-file sorted by
    *    term, so a query prunes every non-queried bucket's files at
    *    the directory level and row-group min/max stats narrow the
    *    bucket's files to the queried terms. dl is DENORMALIZED onto
    *    the postings row (Lucene stores per-doc norms the same way),
    *    so serving needs zero corpus-sized side joins; df is stored
    *    too (query-term selection, diagnostics) but serving derives
    *    the exact value from the scan so appends can't stale it.
    *  - `dir/stats`: the 1-row (n_docs, sum_dl) scalar table.
    *  - `dir/emptydocs`: doc_ids of zero-token documents (usually
    *    empty — see [[emptyDocs]]; they have no postings but DO count
    *    in the stats, and [[deleteIndex]] needs their membership).
    *
    * The text column never enters the index, so no serving scan can
    * read it — `RetrievalLayoutSpec` proves both the file pruning
    * and the postings-only read schema. */
  def buildIndex(docs: DataFrame, dir: String, nBuckets: Int = 16,
                 filesPerShard: Int = 2): Unit = {
    val spark = docs.sparkSession
    graft.sources.CorpusSink.writeParquet(postings(docs, nBuckets),
      s"$dir/postings",
      shardCol = "term_bucket", sortCol = "term", filesPerShard = filesPerShard)
    val (nDocs, sumDl, nEmpty) = docStats(docs)
    import spark.implicits._
    Seq((nDocs, sumDl)).toDF("n_docs", "sum_dl")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/stats")
    // the empties scan runs only when the stats pass saw a zero-token
    // doc (rare by construction); an index without the sidecar means
    // "no empty docs" to every consumer ([[deleteIndex]] exists-checks)
    if (nEmpty > 0)
      emptyDocs(docs).write.mode("overwrite").parquet(s"$dir/emptydocs")
    else {
      val p = new org.apache.hadoop.fs.Path(s"$dir/emptydocs")
      p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    }
  }

  /** One light pass over `docs` for the sidecar scalars: (n_docs,
    * sum_dl, n_empty). The projection is just the token-count — the
    * build path used to run THREE tokenize scans (postings, stats,
    * empties); this fold plus the conditional empties scan make it
    * two, with the third only when an empty doc actually exists. */
  private def docStats(docs: DataFrame): (Long, Long, Long) = {
    val r = docs
      .select(size(TextOps.regexTokens(col("text"))).cast("long").as("dl"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("dl")), lit(0L)).as("sum_dl"),
        coalesce(sum(when(col("dl") === 0L, 1L).otherwise(0L)), lit(0L))
          .as("n_empty"))
      .head()
    (r.getAs[Long]("n_docs"), r.getAs[Long]("sum_dl"),
      r.getAs[Long]("n_empty"))
  }

  /** `dir/emptydocs`: doc_ids of ZERO-TOKEN documents. They are
    * counted in the stats (n_docs, dl = 0 → they move avgdl, so they
    * shift every served score) but own no postings row — without
    * this sidecar, [[deleteIndex]]'s postings-based dl recovery could
    * never see them, leaving n_docs one high versus a rebuild on the
    * survivors. Almost always empty (rows only for genuinely token-
    * free texts); the filter's survivors are repartition(1)-folded so
    * the corpus scan stays parallel. */
  private def emptyDocs(docs: DataFrame): DataFrame =
    docs.filter(size(TextOps.regexTokens(col("text"))) === 0)
      .select(col("doc_id")).repartition(1)

  /** The (term, df, doc_id, dl, tf, term_bucket) postings rows for one
    * document set — `df` is SEGMENT-LOCAL (the df among `docs` only).
    * For a one-shot [[buildIndex]] that equals global df; after an
    * [[appendIndex]] the stored column is advisory (query-term
    * selection, diagnostics) and serving derives the exact global df
    * from the scan itself — see [[bm25TopKFromIndex]]. */
  private def postings(docs: DataFrame, nBuckets: Int): DataFrame = {
    val dt = docs
      .withColumn("toks", TextOps.regexTokens(col("text")))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(col("toks")).as("term"))
    val tf = dt.groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
    val dfTab = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(dfTab, Seq("term"))
      .withColumn("term_bucket", pmod(hash(col("term")), lit(nBuckets)))
  }

  /** INCREMENTAL MAINTENANCE of the stored index — the lexical
    * counterpart of `AnnIndex.appendIvfq`: ingest a new document
    * batch without touching the rest of the corpus.
    *
    *  - the batch's postings rows are APPENDED into exactly the term
    *    buckets the batch's terms hash to (`CorpusSink.appendShards`
    *    writes new files under those partition directories only);
    *    every untouched bucket's files survive byte-identical — at
    *    100 TB a daily batch re-lists nothing and rewrites nothing;
    *  - the 1-row stats table is additively merged (n_docs and
    *    sum_dl are plain sums, the same invariant
    *    `streaming.StreamingIndexStats` maintains live) — a 2-row
    *    driver-side fold, no corpus scan;
    *  - NOTHING is recomputed for existing documents: appended rows
    *    carry batch-local df, and the serving path derives the exact
    *    global df per queried term from the postings it already
    *    reads ([[bm25TopKFromIndex]]), so served scores after any
    *    append sequence are BIT-IDENTICAL to a full rebuild's
    *    (`RetrievalAppendSpec` proves it, plus the byte-survival of
    *    untouched buckets).
    *
    * Batch doc_ids must be disjoint from the stored corpus (same
    * contract as the ANN append; dedup/admission runs upstream).
    * Appending into an EMPTY `dir` bootstraps the index (the first
    * micro-batch of a streaming ingest needs no special-case build
    * call — see `streaming.StreamingIndexAppend`). */
  def appendIndex(newDocs: DataFrame, dir: String, nBuckets: Int = 16,
                  filesPerShard: Int = 2): Unit = {
    val spark = newDocs.sparkSession
    graft.sources.CorpusSink.appendShards(postings(newDocs, nBuckets),
      s"$dir/postings",
      shardCol = "term_bucket", sortCol = "term", filesPerShard = filesPerShard)
    // additive stats merge: one light batch fold ([[docStats]]), the
    // old 1-row side collected, summed on the driver, overwrite —
    // never a read-and-overwrite of the same path in one plan
    val statsPath = new org.apache.hadoop.fs.Path(s"$dir/stats")
    val fs = statsPath.getFileSystem(spark.sessionState.newHadoopConf())
    val (bDocs, bSumDl, bEmpty) = docStats(newDocs)
    val (oDocs, oSumDl) =
      if (fs.exists(statsPath)) {
        val r = spark.read.parquet(s"$dir/stats").head()
        (r.getAs[Long]("n_docs"), r.getAs[Long]("sum_dl"))
      } else (0L, 0L)
    import spark.implicits._
    Seq((oDocs + bDocs, oSumDl + bSumDl)).toDF("n_docs", "sum_dl")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/stats")
    if (bEmpty > 0)
      emptyDocs(newDocs).write.mode("append").parquet(s"$dir/emptydocs")
  }

  /** TOMBSTONE DELETE for the stored index — the retrieval twin of
    * `AnnIndex.deleteVectors`: removing documents without rewriting a
    * single postings file. A (doc_id, dl)-pruned scan recovers each
    * deleted doc's length (any one of its postings carries it — the
    * only two columns read; zero-token docs come from the emptydocs
    * sidecar with dl = 0), the tombstones land as one small
    * appended file under `dir/deletes`, and the 1-row stats table is
    * decremented by the batch's (count, Σdl) — the additive inverse
    * of [[appendIndex]]'s merge. Serving then masks tombstoned
    * postings BEFORE the df window ([[bm25TopKFromIndex]]), so df,
    * norms, and stats all reflect the surviving corpus: served
    * scores are BIT-IDENTICAL to a full rebuild on corpus-minus-
    * deleted. The call is IDEMPOTENT: ids absent from the index and
    * ids already tombstoned are filtered out before the decrement
    * (the existing tombstone set is delete-traffic-sized and
    * broadcast), so a replayed micro-batch cannot double-count —
    * `StreamingIndexDelete.bm25Sink` relies on this.
    * [[purgeIndexDeletes]] later folds the tombstones into a
    * physical rewrite. */
  def deleteIndex(ids: DataFrame, dir: String): Unit = {
    val spark = ids.sparkSession
    val fresh = deletesPath(spark, dir) match {
      case Some(p) =>
        ids.select(col("doc_id")).distinct()
          .join(broadcast(spark.read.parquet(p).select(col("doc_id"))),
            Seq("doc_id"), "left_anti")
      case None => ids.select(col("doc_id")).distinct()
    }
    val dl = spark.read.parquet(s"$dir/postings")
      .select(col("doc_id"), col("dl"))
      .join(broadcast(fresh), Seq("doc_id"))
      .groupBy(col("doc_id")).agg(first(col("dl")).as("dl"))
    // zero-token documents own no postings row but are counted in the
    // stats (dl = 0 still moves avgdl via n_docs) — recover them from
    // the emptydocs sidecar so their delete decrements n_docs exactly
    // like the rebuild-on-survivors would
    val emptiesP = new org.apache.hadoop.fs.Path(s"$dir/emptydocs")
    val withEmpties =
      if (emptiesP.getFileSystem(spark.sessionState.newHadoopConf())
          .exists(emptiesP))
        dl.unionByName(spark.read.parquet(s"$dir/emptydocs")
          .join(broadcast(fresh), Seq("doc_id"))
          .distinct().withColumn("dl", lit(0L)))
      else dl
    val batch = withEmpties.collect() // delete-batch-sized
    if (batch.nonEmpty) {
      import spark.implicits._
      batch.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("dl"))).toSeq
        .toDF("doc_id", "dl")
        .coalesce(1).write.mode("append").parquet(s"$dir/deletes")
      val old = spark.read.parquet(s"$dir/stats").head()
      Seq((old.getAs[Long]("n_docs") - batch.length,
          old.getAs[Long]("sum_dl") - batch.map(_.getAs[Long]("dl")).sum))
        .toDF("n_docs", "sum_dl")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/stats")
    }
  }

  private def deletesPath(spark: SparkSession,
                          dir: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/deletes")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) Some(s"$dir/deletes") else None
  }

  /** Broadcast anti-join mask against [[deleteIndex]] tombstones
    * (no-op when no delete has ever run). */
  private def antiJoinDeletes(post: DataFrame, dir: String): DataFrame =
    deletesPath(post.sparkSession, dir) match {
      case Some(p) =>
        val dels = post.sparkSession.read.parquet(p)
          .select(col("doc_id")).distinct()
        post.join(broadcast(dels), Seq("doc_id"), "left_anti")
      case None => post
    }

  /** PHYSICAL PURGE of [[deleteIndex]] tombstones: a deleted doc's
    * postings are spread across every bucket its terms hash to, so
    * the purge rewrites exactly the buckets that still hold a
    * tombstoned row (found by a (doc_id, term_bucket)-pruned scan) —
    * dropping those rows and restoring the stored `df` column to the
    * post-delete exact value bucket-locally, the [[compactIndex]]
    * invariant. Stats were already adjusted at delete time and the
    * serving path already masked these rows, so served results
    * cannot change; the drained tombstone file is dropped last
    * (crash between the steps leaves a correct, still-masked index).
    * Returns the purged bucket ids. */
  def purgeIndexDeletes(spark: SparkSession, dir: String,
                        filesPerShard: Int = 2): Seq[Int] = {
    deletesPath(spark, dir) match {
      case None => Seq.empty
      case Some(p) =>
        val dels = spark.read.parquet(p).select(col("doc_id")).distinct()
        val stored = spark.read.parquet(s"$dir/postings")
        val touched = stored.join(broadcast(dels), Seq("doc_id"))
          .select(col("term_bucket").cast("int")).distinct()
          .collect().map(_.getInt(0)).toSeq.sorted
        if (touched.nonEmpty) {
          val kept = stored.filter(col("term_bucket").isin(touched: _*))
            .join(broadcast(dels), Seq("doc_id"), "left_anti")
            .drop("df")
            .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
            .select(col("term"), col("doc_id"), col("dl"), col("tf"),
              col("df"), col("term_bucket").cast("int").as("term_bucket"))
          graft.sources.CorpusSink.swapShards(kept, s"$dir/postings",
            touched.map(b => s"term_bucket=$b"), shardCol = "term_bucket",
            sortCol = "term", filesPerShard = filesPerShard,
            dropDrained = true) // a bucket whose every posting died is removed
        }
        // fold tombstoned ZERO-TOKEN docs out of the emptydocs sidecar
        // as well: after the tombstones drain, a replayed delete must
        // find no membership anywhere — postings are physically gone
        // for worded docs, and this keeps the same invariant for empty
        // ones (else the replay would re-decrement n_docs)
        val ep = s"$dir/emptydocs"
        val epPath = new org.apache.hadoop.fs.Path(ep)
        val fs = epPath.getFileSystem(spark.sessionState.newHadoopConf())
        if (fs.exists(epPath) &&
            spark.read.parquet(ep)
              .join(broadcast(dels), Seq("doc_id"), "left_semi")
              .limit(1).count() > 0) {
          spark.read.parquet(ep)
            .join(broadcast(dels), Seq("doc_id"), "left_anti")
            .repartition(1)
            .write.mode("overwrite").parquet(s"$ep._tmp")
          fs.delete(epPath, true)
          if (!fs.rename(new org.apache.hadoop.fs.Path(s"$ep._tmp"), epPath))
            throw new java.io.IOException("emptydocs sidecar swap failed")
        }
        val delP = new org.apache.hadoop.fs.Path(p)
        delP.getFileSystem(spark.sessionState.newHadoopConf())
          .delete(delP, true)
        touched
    }
  }

  /** COMPACTION — the maintenance valve for [[appendIndex]]'s file
    * growth (each append adds ≤`filesPerShard` files per touched
    * bucket, so a long ingest run accumulates small files). Rewrites
    * ONLY the buckets whose file count exceeds `maxFilesPerBucket` —
    * staged to a sibling temp dir and swapped per-directory
    * ([[graft.sources.CorpusSink.swapShards]]), so every
    * below-threshold bucket's files survive byte-identical and the
    * driver-side dir listing that picks the candidates reads no rows
    * at all.
    *
    * Compaction also RESTORES the stored `df` column to the exact
    * global value: a term's postings live entirely inside one bucket
    * (bucket = hash(term)), so the recount is bucket-local — the same
    * window count the serving path derives, now persisted. Serving is
    * unaffected either way (it always derives df from the scan), so a
    * compact can run any time without coordinating with readers of
    * consistent snapshots beyond parquet's usual file-listing caveat.
    *
    * Returns the compacted bucket ids (empty = nothing exceeded the
    * threshold). O(oversized buckets' rows) — never O(corpus). */
  def compactIndex(spark: SparkSession, dir: String,
                   filesPerShard: Int = 2,
                   maxFilesPerBucket: Int = 8): Seq[Int] = {
    val over = graft.sources.CorpusSink
      .oversizedShards(spark, s"$dir/postings", "term_bucket", maxFilesPerBucket)
      .map(_.toInt)
    if (over.nonEmpty) {
      val post = spark.read.parquet(s"$dir/postings")
        .filter(col("term_bucket").isin(over: _*))
        .drop("df")
        .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
        .select(col("term"), col("doc_id"), col("dl"), col("tf"), col("df"),
          col("term_bucket").cast("int").as("term_bucket"))
      // write compacted buckets to a sibling temp dir, then swap each
      // bucket's directory — never an overwrite of a path the plan is
      // also reading (Spark rejects that, and rightly so)
      graft.sources.CorpusSink.swapShards(post, s"$dir/postings",
        over.map(b => s"term_bucket=$b"), shardCol = "term_bucket",
        sortCol = "term", filesPerShard = filesPerShard)
    }
    over
  }

  /** The partition predicate a query pushes at the stored postings:
    * every queried term's bucket id is a FOLDABLE expression
    * (`pmod(hash(lit(term)), nBuckets)`), so Catalyst constant-folds
    * it to a literal and the comparison against the partition column
    * prunes directories STATICALLY — no job runs to discover which
    * buckets to read. */
  def termBucketPredicate(queryTerms: Seq[String], nBuckets: Int): Column =
    queryTerms.map(t =>
      col("term_bucket") === pmod(hash(lit(t)), lit(nBuckets))).reduce(_ || _)

  /** BM25 top-k served from the stored index ([[buildIndex]]): the
    * scan touches only the queried terms' buckets (static partition
    * pruning via [[termBucketPredicate]] + an `In(term, …)` pushed
    * filter inside them), every per-(doc,term) input rides on the
    * postings row, the 1-row stats table is broadcast, and the top-k
    * is a TakeOrdered — per-query work is O(queried postings), with
    * the corpus text never readable from this path at all. Scores
    * are bit-identical to [[bm25TopK]] on the same terms (same
    * shared score expressions, same e6 floor-before-sum).
    *
    * df is derived FROM THE SCAN, not read from the stored column:
    * the query already reads every posting of its terms, and the
    * exact global df of a term is precisely its posting-row count —
    * a window count over rows already in hand (the window shuffle
    * moves only the queried postings, never the corpus). That makes
    * the serving path append-tolerant by construction: stored df is
    * segment-local after an [[appendIndex]], and trusting it would
    * serve stale idf; deriving it keeps served scores equal to a
    * full rebuild's after ANY append sequence — and the read schema
    * narrows by the df column as a bonus. */
  def bm25TopKFromIndex(spark: SparkSession, dir: String,
                        queryTerms: Seq[String], k: Int = 10,
                        k1: Double = 1.2, b: Double = 0.75,
                        nBuckets: Int = 16): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val post = antiJoinDeletes(
        spark.read.parquet(s"$dir/postings").drop("df")
          .filter(termBucketPredicate(queryTerms, nBuckets)
            && col("term").isin(queryTerms: _*)),
        dir)
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
    val stats = spark.read.parquet(s"$dir/stats")
    post.crossJoin(broadcast(stats))
      .select(col("doc_id"),
        floor(idfExpr * normExpr(k1, b) * lit(1e6)).cast("long").as("score_e6"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hit"), sum(col("score_e6")).as("bm25_e6"))
      .orderBy(col("bm25_e6").desc, col("doc_id"))
      .limit(k)
  }
}
