package graft.queries

/** Spark-dialect SQL twins for the oracle statements that only parse
  * in DuckDB (epoch_us, string_split, list_*, `//`, unnest-in-SELECT).
  * Each twin states the SAME query in Spark SQL and must reproduce
  * the DataFrame query's rows EXACTLY through `spark.sql` —
  * `SqlParitySpec` enforces it — so the engine's whole catalog is
  * proven through the SQL-text surface, not just the DataFrame API.
  *
  * Float-bearing twins mirror the DataFrame implementations' exact
  * operation order (sequential array folds, DECIMAL(18,2) money
  * sums, exact interpolated `percentile`) because the parity compare
  * is to 9 significant digits.
  *
  * Dialect mapping used throughout: string_split→split, len→size,
  * list_transform→transform, list_filter→filter,
  * list_aggregate(_, 'sum')→aggregate, list_distinct→array_distinct,
  * `//`→div, epoch_us→unix_micros, epoch→unix_seconds,
  * time_bucket→date_trunc, quantile_cont→percentile,
  * json_extract_string→get_json_object, sha256→sha2(_, 256),
  * unnest-in-SELECT→LATERAL VIEW explode/posexplode,
  * toks[i] (1-based)→element_at, range(a,b)→sequence(a, b-1) with an
  * explicit emptiness guard (Spark's sequence runs DESCENDING when
  * start > stop, where DuckDB's range is empty).
  */
object SparkSqlTwins {

  /** Spark-dialect full-corpus BM25 top-10 — shared verbatim by
    * `q_bm25_topk` and `q_retrieval_append` (the stored-index append
    * path serves bit-identically to the inline computation). */
  private val bm25Twin = bm25TwinOver("documents")

  /** The same Spark-dialect BM25 over an arbitrary corpus relation —
    * `q_retrieval_delete`'s twin runs it over the surviving docs
    * (mirroring the oracle's corpus-minus-deleted). */
  private def bm25TwinOver(src: String): String =
    s"WITH corpus AS (SELECT * FROM $src), " +
      "dt AS (SELECT doc_id, term FROM corpus " +
      "LATERAL VIEW explode(regexp_extract_all(text, '[a-z0-9]+', 0)) e AS term), " +
      "df AS (SELECT term, count(DISTINCT doc_id) AS df FROM dt GROUP BY term), " +
      "q AS (SELECT term, df FROM df WHERE term NOT IN ('the','a','of','and','in') " +
      "ORDER BY df DESC, term LIMIT 3), " +
      "dl AS (SELECT doc_id, CAST(size(regexp_extract_all(text, '[a-z0-9]+', 0)) AS BIGINT) AS dl " +
      "FROM corpus), " +
      "st AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl), " +
      "tf AS (SELECT doc_id, dt.term, df, count(*) AS tf FROM dt JOIN q USING (term) " +
      "GROUP BY doc_id, dt.term, df), " +
      "sc AS (SELECT tf.doc_id, CAST(floor(" +
      "ln(1.0D + (CAST(n_docs AS DOUBLE) - df + 0.5D) / (CAST(df AS DOUBLE) + 0.5D)) " +
      "* (CAST(tf AS DOUBLE) * (1.2D + 1.0D) / (CAST(tf AS DOUBLE) " +
      "+ 1.2D * (1.0D - 0.75D + 0.75D * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / n_docs))))) " +
      "* 1000000.0D) AS BIGINT) AS score_e6 FROM tf JOIN dl USING (doc_id) CROSS JOIN st) " +
      "SELECT doc_id, count(*) AS n_hit, sum(score_e6) AS bm25_e6 " +
      "FROM sc GROUP BY doc_id ORDER BY bm25_e6 DESC, doc_id LIMIT 10"

  private val toks = "split(text, ' ')"
  private val stop = s"size(filter($toks, t -> t IN ('the','a','of','and','in')))"
  // decimal-literal trap: in Spark SQL text `100.0` is a DECIMAL
  // literal (the DataFrame API's lit(100.0) is a double), and decimal
  // arithmetic flips floor(x*1e6) boundaries vs the DataFrame's
  // double math — the D suffix keeps the whole expression in doubles
  private val quality =
    s"CAST(floor((least(size($toks)/100.0D, 1.0D)*0.3D " +
      s"+ (CAST($stop AS DOUBLE)/size($toks))*0.4D " +
      s"+ least((CAST(n_chars AS DOUBLE)/size($toks))/8.0D, 1.0D)*0.3D)*1000000) AS BIGINT)"
  private val langPred =
    s"CASE WHEN CAST($stop AS DOUBLE)/size($toks) >= 0.05D THEN 'en' ELSE 'unk' END"
  private val norm =
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ''), '  +', ' '))"

  /** Distinct word-3-shingle array (guarded: empty for < 3 tokens). */
  private val shingles =
    s"CASE WHEN size($toks) >= 3 THEN array_distinct(transform(sequence(1, size($toks) - 2), " +
      s"i -> concat(element_at($toks, i), ' ', element_at($toks, i+1), ' ', element_at($toks, i+2)))) " +
      "ELSE CAST(array() AS ARRAY<STRING>) END"

  /** The shared curation-chain TAIL (quality/language gates → exact
    * dedup → decontaminate vs the id%10==0 holdout → rebalance → pack
    * report): everything after the `cand` CTE, which the caller
    * prepends — `q_curate_e2e` states `cand` as the eval holdout
    * alone, `q_curate_hosts` as the corpus behind the
    * host-governance gate. */
  private val curateTailSql: String =
    s"gated AS (SELECT doc_id, source, n_chars, text, md5($norm) AS nk FROM cand " +
      s"WHERE $quality >= 400000 AND $langPred = 'en'), " +
      "ded AS (SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY nk ORDER BY doc_id) AS rn FROM gated) WHERE rn = 1), " +
      s"ev AS (SELECT DISTINCT s FROM documents LATERAL VIEW explode($shingles) ex AS s WHERE doc_id % 10 = 0), " +
      s"trsh AS (SELECT doc_id, s FROM ded LATERAL VIEW explode($shingles) ex AS s), " +
      "ov AS (SELECT trsh.doc_id, count(*) AS n_sh, count(ev.s) AS n_ov FROM trsh LEFT JOIN ev ON trsh.s = ev.s GROUP BY 1), " +
      "bad AS (SELECT doc_id FROM ov WHERE n_ov * 1000000 >= 700000 * n_sh), " +
      "clean AS (SELECT * FROM ded WHERE doc_id NOT IN (SELECT doc_id FROM bad)), " +
      "cnt AS (SELECT source, count(*) AS n FROM clean GROUP BY 1), " +
      "rates AS (SELECT source, least(1000, 15000 div n) AS rate FROM cnt), " +
      "bal AS (SELECT c.* FROM clean c JOIN rates USING (source) " +
      "WHERE ((doc_id % 1000003) * 1103515245 + 12345) % 1000 < rate), " +
      "tok AS (SELECT source, CAST(ceil(CAST(n_chars AS DOUBLE)/4.0) AS BIGINT) AS n_tok FROM bal) " +
      "SELECT source, CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens, " +
      "CAST((sum(n_tok) + 2047) div 2048 AS BIGINT) AS n_chunks FROM tok GROUP BY source ORDER BY source"

  /** Cosine over float embeddings, mirroring VectorOps.cosineSim's
    * exact op order: sequential-fold dot and norms over
    * array<double>, null (ranks last) on zero norm. */
  private def cosSql(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"aggregate(zip_with(CAST($x.embedding AS ARRAY<DOUBLE>), " +
        s"CAST($y.embedding AS ARRAY<DOUBLE>), (x, y) -> x * y), 0D, (s, v) -> s + v)"
    def nrm(x: String) = s"sqrt(${dot(x, x)})"
    s"CASE WHEN ${nrm(a)} * ${nrm(b)} > 0 THEN ${dot(a, b)} / (${nrm(a)} * ${nrm(b)}) END"
  }

  val map: Map[String, String] = Map(
    // the oracle needs DuckDB's 'g' flag on the tracking-param strip
    // (first-match by default there); Spark's 3-arg regexp_replace is
    // global already, so the twin is the same text minus the flags.
    // CAST(x AS VARCHAR)→CAST(x AS STRING) is the only other mapping.
    "q_url_canon" ->
      ("WITH u AS (SELECT doc_id, " +
        "(CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'HTTP' WHEN 1 THEN 'http' " +
        "WHEN 2 THEN 'HTTPS' ELSE 'https' END) || '://' || " +
        "(CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'WWW.' WHEN 1 THEN 'www.' " +
        "ELSE '' END) || " +
        "(CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END) || '.Example.COM' || " +
        "(CASE CAST(doc_id % 5 AS INT) WHEN 0 THEN ':80' WHEN 1 THEN ':443' " +
        "WHEN 2 THEN ':8080' ELSE '' END) || " +
        "'/art/' || CAST(doc_id % 40 AS STRING) || " +
        "(CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END) || " +
        "(CASE CAST(doc_id % 3 AS INT) " +
        "WHEN 0 THEN '?utm_source=feed&utm_medium=rss&id=' || CAST(doc_id % 7 AS STRING) " +
        "WHEN 1 THEN '?id=' || CAST(doc_id % 7 AS STRING) || '&utm_campaign=x' " +
        "ELSE '?id=' || CAST(doc_id % 7 AS STRING) END) || " +
        "(CASE WHEN doc_id % 7 = 0 THEN '#sec' ELSE '' END) AS url FROM documents), " +
        "c AS (SELECT doc_id, " +
        "lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme, " +
        "lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]*)', 1)) AS hostport, " +
        "regexp_replace(url, '^[A-Za-z]+://[^/?#]*', '') AS rest FROM u), " +
        "c2 AS (SELECT doc_id, scheme, " +
        "CASE WHEN scheme = 'http' THEN " +
        "regexp_replace(regexp_replace(hostport, '^www[.]', ''), ':80$', '') " +
        "WHEN scheme = 'https' THEN " +
        "regexp_replace(regexp_replace(hostport, '^www[.]', ''), ':443$', '') " +
        "ELSE regexp_replace(hostport, '^www[.]', '') END AS host, " +
        "regexp_replace(rest, '#.*$', '') AS nofrag FROM c), " +
        "c3 AS (SELECT doc_id, scheme, host, " +
        "regexp_replace(regexp_extract(nofrag, '^([^?]*)', 1), '/+$', '') AS path2, " +
        "regexp_replace(regexp_replace('&' || regexp_extract(nofrag, '[?](.*)$', 1), " +
        "'&(utm_[a-z0-9_]+|fbclid|gclid)=[^&]*', ''), '^&+', '') AS q2 FROM c2), " +
        "canon AS (SELECT host, scheme || '://' || host || path2 || " +
        "CASE WHEN q2 = '' THEN '' ELSE '?' || q2 END AS canon_url FROM c3) " +
        "SELECT host, count(*) AS n_urls, count(DISTINCT canon_url) AS n_canon, " +
        "count(*) - count(DISTINCT canon_url) AS n_dup, " +
        "min(canon_url) AS sample_canon FROM canon GROUP BY host ORDER BY host"),

    // o_orderdate is TIMESTAMP_NTZ in the parquet; unix_* only take
    // TIMESTAMP, so cast (identity on the stored micros under UTC)
    "q_asof_join" ->
      ("SELECT event_id, user_id, CAST(unix_seconds(CAST(max(o_orderdate) AS TIMESTAMP)) AS BIGINT) AS asof_s " +
        "FROM events e JOIN orders o ON e.user_id = o.o_custkey " +
        "AND CAST(o.o_orderdate AS TIMESTAMP) <= e.ts " +
        "GROUP BY event_id, user_id ORDER BY event_id"),

    "q_chunk_overlap" ->
      ("WITH tok AS (SELECT doc_id, CAST(ceil(CAST(n_chars AS DOUBLE)/4.0) AS BIGINT) AS n_tok FROM documents), " +
        "k AS (SELECT doc_id, n_tok, CASE WHEN n_tok <= 64 THEN 1 ELSE (n_tok - 64 + 47) div 48 + 1 END AS n_win " +
        "FROM tok WHERE n_tok > 0), " +
        "w AS (SELECT doc_id, n_tok, win_id FROM k LATERAL VIEW explode(sequence(0, n_win - 1)) u AS win_id) " +
        "SELECT doc_id, win_id, win_id*48 AS win_start, " +
        "CAST(least(64, n_tok - win_id*48) AS BIGINT) AS win_len FROM w ORDER BY doc_id, win_id"),

    "q_contamination" ->
      (s"WITH tr AS (SELECT doc_id, s FROM documents LATERAL VIEW explode($shingles) ex AS s WHERE doc_id % 10 <> 0), " +
        s"ev AS (SELECT DISTINCT s FROM documents LATERAL VIEW explode($shingles) ex AS s WHERE doc_id % 10 = 0), " +
        "c AS (SELECT tr.doc_id, count(*) AS n_shingles, count(ev.s) AS n_overlap " +
        "FROM tr LEFT JOIN ev ON tr.s = ev.s GROUP BY 1) " +
        "SELECT doc_id, CAST(n_shingles AS BIGINT) AS n_shingles, CAST(n_overlap AS BIGINT) AS n_overlap, " +
        "n_overlap * 1000000 div n_shingles AS contam_e6, " +
        "n_overlap * 1000000 >= 100000 * n_shingles AS contaminated FROM c ORDER BY doc_id"),

    "q_cooccur" ->
      ("WITH dt AS (SELECT DISTINCT doc_id, term FROM documents " +
        "LATERAL VIEW explode(regexp_extract_all(text, '[a-z0-9]+', 0)) ex AS term), " +
        "ft AS (SELECT * FROM dt WHERE term NOT IN ('the','a','of','and','in')), " +
        "df AS (SELECT term, count(*) AS df FROM ft GROUP BY 1), " +
        "v AS (SELECT term, df FROM df ORDER BY df DESC, term LIMIT 50), " +
        "n AS (SELECT count(*) AS n_docs FROM documents), " +
        "vt AS (SELECT ft.doc_id, ft.term, v.df FROM ft JOIN v USING (term)), " +
        "p AS (SELECT x.term AS a, y.term AS b, x.df AS df_a, y.df AS df_b, count(*) AS n_ab " +
        "FROM vt x JOIN vt y ON x.doc_id = y.doc_id AND x.term < y.term GROUP BY 1, 2, 3, 4) " +
        "SELECT a, b, df_a, df_b, n_ab, n_ab * n_docs * 1000000 div (df_a * df_b) AS lift_e6 " +
        "FROM p CROSS JOIN n ORDER BY lift_e6 DESC, a, b LIMIT 100"),

    "q_corpus_select" ->
      (s"WITH kept AS (SELECT doc_id, source, n_chars, md5($norm) AS nk FROM documents " +
        s"WHERE $quality >= 400000 AND $langPred = 'en'), " +
        "ded AS (SELECT *, row_number() OVER (PARTITION BY nk ORDER BY doc_id) AS rn FROM kept) " +
        "SELECT source, count(*) AS n_docs, " +
        "CAST(sum(CAST(ceil(CAST(n_chars AS DOUBLE)/4.0) AS BIGINT)) AS BIGINT) AS n_tokens_est " +
        "FROM ded WHERE rn = 1 GROUP BY source ORDER BY source"),

    "q_curate_e2e" ->
      (s"WITH cand AS (SELECT * FROM documents WHERE doc_id % 10 <> 0), " +
        curateTailSql),

    // the e2e chain behind the media-governance gate: the planted
    // media verdicts reduce to doc_id residues (see the oracle), so
    // `cand` is an arithmetic filter ahead of the shared tail
    "q_curate_media" ->
      ("WITH cand AS (SELECT * FROM documents " +
        "WHERE (doc_id % 20 NOT IN (4, 9, 14) OR doc_id >= 2000) " +
        "AND doc_id % 10 <> 0), " +
        curateTailSql),

    // the e2e chain behind the host-governance gate — the `cand` CTE
    // is the corpus minus over-pressure hosts minus the eval holdout;
    // everything downstream is the shared tail verbatim
    "q_curate_hosts" ->
      ("WITH c AS (SELECT doc_id, source, " +
        "concat(source, CASE WHEN doc_id % 2 = 0 THEN '-a' ELSE '-b' END, '.example.com') AS host, " +
        "concat('https://', source, CASE WHEN doc_id % 2 = 0 THEN '-a' ELSE '-b' END, '.example.com', " +
        "CASE WHEN doc_id % 2 = 0 THEN '/art/0?id=0' " +
        "ELSE concat('/art/', CAST(doc_id % 100000 AS STRING), '?id=', CAST(doc_id % 7 AS STRING)) END) AS canon " +
        "FROM documents), " +
        "hr AS (SELECT host, count(*) AS n_urls, count(DISTINCT canon) AS n_canon FROM c GROUP BY 1), " +
        "badh AS (SELECT host FROM hr WHERE (n_urls - n_canon) * 1000000 >= n_urls * 500000), " +
        "d2 AS (SELECT d.* FROM documents d JOIN c USING (doc_id) " +
        "WHERE c.host NOT IN (SELECT host FROM badh)), " +
        "cand AS (SELECT * FROM d2 WHERE doc_id % 10 <> 0), " +
        curateTailSql),

    "q_decontam_fuzzy" ->
      (s"WITH tr AS (SELECT doc_id, s FROM documents LATERAL VIEW explode($shingles) ex AS s WHERE doc_id % 10 <> 0), " +
        s"ev AS (SELECT doc_id AS eval_id, s FROM documents LATERAL VIEW explode($shingles) ex AS s WHERE doc_id % 10 = 0), " +
        "tn AS (SELECT doc_id, count(*) AS n_sh FROM tr GROUP BY 1), " +
        "en AS (SELECT eval_id, count(*) AS n_ev FROM ev GROUP BY 1), " +
        "pj AS (SELECT tr.doc_id, ev.eval_id, count(*) AS inter FROM tr JOIN ev USING (s) GROUP BY 1, 2), " +
        "j AS (SELECT pj.doc_id, pj.eval_id, (inter * 1000000) div (n_sh + n_ev - inter) AS jac " +
        "FROM pj JOIN tn USING (doc_id) JOIN en USING (eval_id)), " +
        "b AS (SELECT doc_id, jac, eval_id FROM (SELECT *, row_number() OVER " +
        "(PARTITION BY doc_id ORDER BY jac DESC, eval_id ASC) AS rn FROM j) WHERE rn = 1) " +
        "SELECT tn.doc_id, CAST(tn.n_sh AS BIGINT) AS n_sh, CAST(coalesce(b.jac, 0) AS BIGINT) AS best_jaccard_e6, " +
        "b.eval_id AS best_eval_id, coalesce(b.jac, 0) >= 500000 AS contaminated " +
        "FROM tn LEFT JOIN b USING (doc_id) ORDER BY doc_id"),

    "q_dedup_exact" ->
      ("SELECT min(doc_id) AS keep_id, count(*) AS n_copies, sha2(text, 256) AS fp " +
        "FROM documents GROUP BY sha2(text, 256) ORDER BY keep_id"),

    "q_dedup_incr_near" ->
      (s"WITH b AS (SELECT doc_id, $shingles AS sh FROM documents WHERE doc_id % 3 = 0), " +
        s"i AS (SELECT doc_id, $shingles AS sh FROM documents WHERE doc_id % 3 <> 0), " +
        "bx AS (SELECT doc_id, s FROM b LATERAL VIEW explode(sh) ex AS s), " +
        "ix AS (SELECT doc_id, s FROM i LATERAL VIEW explode(sh) ex AS s), " +
        "bn AS (SELECT doc_id, size(sh) AS n FROM b), " +
        "inz AS (SELECT doc_id, size(sh) AS n FROM i), " +
        "p AS (SELECT bx.doc_id AS a, ix.doc_id AS bd, count(*) AS inter FROM bx JOIN ix ON bx.s = ix.s GROUP BY 1, 2), " +
        "e AS (SELECT DISTINCT a FROM p JOIN bn ON bn.doc_id = p.a JOIN inz ON inz.doc_id = p.bd " +
        "WHERE CAST(inter AS DOUBLE)/(bn.n + inz.n - inter) >= 0.5) " +
        "SELECT (SELECT count(*) FROM b) AS n_batch, (SELECT count(*) FROM e) AS n_exact, " +
        "TRUE AS sound, TRUE AS recall_ok"),

    "q_dedup_substring" ->
      (s"WITH t AS (SELECT doc_id, $toks AS toks FROM documents), " +
        "gr AS (SELECT doc_id, i - 1 AS pos, " +
        "concat_ws(' ', element_at(toks, i), element_at(toks, i+1), element_at(toks, i+2), element_at(toks, i+3), " +
        "element_at(toks, i+4), element_at(toks, i+5), element_at(toks, i+6), element_at(toks, i+7)) AS g " +
        "FROM (SELECT * FROM t WHERE size(toks) >= 8) tt LATERAL VIEW explode(sequence(1, size(toks) - 7)) u AS i), " +
        "dup AS (SELECT g FROM gr GROUP BY g HAVING count(DISTINCT doc_id) >= 2), " +
        "s AS (SELECT doc_id, pos FROM gr JOIN dup USING (g)), " +
        "isl AS (SELECT doc_id, pos, CASE WHEN " +
        "max(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL " +
        "OR pos > max(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) " +
        "THEN 1 ELSE 0 END AS ni FROM s), " +
        "isl2 AS (SELECT doc_id, pos, sum(ni) OVER (PARTITION BY doc_id ORDER BY pos) AS island FROM isl), " +
        "spans AS (SELECT doc_id, island, min(pos) AS st, max(pos) + 8 AS en FROM isl2 GROUP BY 1, 2), " +
        "summ AS (SELECT doc_id, count(*) AS n_spans, sum(en - st) AS dup_tokens FROM spans GROUP BY 1) " +
        "SELECT summ.doc_id, CAST(n_spans AS BIGINT) AS n_spans, CAST(dup_tokens AS BIGINT) AS dup_tokens, " +
        s"CAST(size($toks) - dup_tokens AS BIGINT) AS kept_tokens " +
        "FROM summ JOIN documents ON summ.doc_id = documents.doc_id ORDER BY 1"),

    "q_embed_centroid" ->
      ("WITH ex AS (SELECT label, pos, x FROM embeddings " +
        "LATERAL VIEW posexplode(CAST(embedding AS ARRAY<DOUBLE>)) e AS pos, x) " +
        "SELECT label, CAST(pos AS BIGINT) AS pos, " +
        "round(CAST(sum(CAST(x AS DECIMAL(38,18))) AS DOUBLE) / count(*), 6) AS v, count(*) AS n_vecs " +
        "FROM ex GROUP BY label, pos ORDER BY label, pos"),

    "q_event_gaps" ->
      ("WITH g AS (SELECT user_id, unix_micros(ts) - lag(unix_micros(ts)) OVER " +
        "(PARTITION BY user_id ORDER BY ts, event_id) AS gap_us FROM events) " +
        "SELECT user_id, count(*) AS n_events, count(gap_us) AS n_gaps, max(gap_us) AS max_gap_us, " +
        "CAST(floor(avg(gap_us)) AS BIGINT) AS avg_gap_us FROM g GROUP BY user_id ORDER BY user_id"),

    "q_event_sessions" ->
      ("WITH flagged AS (SELECT user_id, event_id, value, unix_micros(ts) AS us, " +
        "CASE WHEN unix_micros(ts) - lag(unix_micros(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000 THEN 1 " +
        "WHEN lag(unix_micros(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1 ELSE 0 END AS new_s " +
        "FROM events), " +
        "sess AS (SELECT user_id, value, us, sum(new_s) OVER " +
        "(PARTITION BY user_id ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM flagged) " +
        "SELECT user_id, CAST(sid AS BIGINT) AS sid, count(*) AS n_events, max(us) - min(us) AS dur_us, " +
        "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value " +
        "FROM sess GROUP BY user_id, sid ORDER BY user_id, sid"),

    "q_event_windows" ->
      ("SELECT CAST(unix_seconds(date_trunc('hour', ts)) AS BIGINT) AS bucket, event_type, " +
        "count(*) AS n_events, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value " +
        "FROM events GROUP BY 1, 2 ORDER BY 1, 2"),

    "q_fill_forward" ->
      ("SELECT event_id, user_id, unix_micros(ts) AS us, " +
        "last_value(CASE WHEN event_type = 'error' THEN NULL ELSE value END) IGNORE NULLS OVER " +
        "(PARTITION BY user_id ORDER BY unix_micros(ts), event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value, " +
        "event_type = 'error' AS was_filled FROM events ORDER BY user_id, us, event_id"),

    "q_funnel" ->
      ("WITH e AS (SELECT user_id, event_type, unix_micros(ts) AS us FROM events), " +
        "s1 AS (SELECT user_id, min(us) AS t FROM e WHERE event_type = 'view' GROUP BY 1), " +
        "s2 AS (SELECT e.user_id, min(e.us) AS t FROM e JOIN s1 ON e.user_id = s1.user_id AND e.us > s1.t " +
        "WHERE e.event_type = 'click' GROUP BY 1), " +
        "s3 AS (SELECT e.user_id, min(e.us) AS t FROM e JOIN s2 ON e.user_id = s2.user_id AND e.us > s2.t " +
        "WHERE e.event_type = 'purchase' GROUP BY 1) " +
        "SELECT 1 AS stage, 'view' AS event_type, count(*) AS n_users FROM s1 " +
        "UNION ALL SELECT 2, 'click', count(*) FROM s2 " +
        "UNION ALL SELECT 3, 'purchase', count(*) FROM s3 ORDER BY stage"),

    "q_json_extract" ->
      ("SELECT event_type, count(*) AS n, " +
        "CAST(sum(CAST(get_json_object(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k, " +
        "max(CAST(get_json_object(props, '$.k') AS BIGINT)) AS max_k, " +
        "count(*) FILTER (WHERE get_json_object(props, '$.k') IS NULL) AS n_missing " +
        "FROM events GROUP BY 1 ORDER BY 1"),

    "q_lang_id" ->
      (s"SELECT doc_id, lang AS lang_true, $langPred AS lang_pred, " +
        s"CAST(floor(CAST($stop AS DOUBLE)/size($toks)*1000000) AS BIGINT) AS en_score_e6 " +
        "FROM documents ORDER BY doc_id"),

    "q_latest_state" ->
      ("WITH r AS (SELECT user_id, event_id, unix_micros(ts) AS us, event_type, value, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY unix_micros(ts) DESC, event_id DESC) AS rn FROM events), " +
        "t AS (SELECT user_id, count(*) AS n_events, " +
        "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS lifetime_value FROM events GROUP BY user_id) " +
        "SELECT r.user_id, us AS last_us, event_id AS last_event_id, event_type AS last_event_type, " +
        "round(value, 6) AS last_value, n_events, lifetime_value " +
        "FROM r JOIN t ON r.user_id = t.user_id WHERE rn = 1 ORDER BY r.user_id"),

    "q_minhash_est" ->
      (s"WITH sub AS (SELECT doc_id, $shingles AS sh FROM documents WHERE doc_id % 20 = 0), " +
        "ex AS (SELECT doc_id, s FROM sub LATERAL VIEW explode(sh) e AS s), " +
        "pairs AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter " +
        "FROM ex x JOIN ex y ON x.s = y.s AND x.doc_id < y.doc_id GROUP BY 1, 2) " +
        "SELECT count(*) AS n_pairs, TRUE AS viol_rate_ok, TRUE AS mean_err_ok " +
        "FROM pairs WHERE inter >= 1"),

    "q_mixture_budget" ->
      ("WITH tok AS (SELECT doc_id, lang, CAST(ceil(n_chars / 4.0) AS BIGINT) AS tk FROM documents), " +
        "tot AS (SELECT lang, sum(tk) AS tokn FROM tok GROUP BY 1), " +
        "w AS (SELECT * FROM VALUES ('en', 600), ('zh', 100), ('es', 100), " +
        "('fr', 100), ('de', 100) AS t(lang, wpm)), " +
        "r AS (SELECT tot.lang, least(1000, ((20000 * wpm) div 1000) * 1000 div tokn) AS rate_pm " +
        "FROM tot JOIN w ON tot.lang = w.lang), " +
        "kept AS (SELECT tok.doc_id, tok.lang, tok.tk, r.rate_pm FROM tok JOIN r ON tok.lang = r.lang " +
        "WHERE ((doc_id % 1000003) * 1103515245 + 12345) % 1000 < rate_pm) " +
        "SELECT lang, CAST(rate_pm AS BIGINT) AS rate_pm, count(*) AS n_docs, " +
        "CAST(sum(tk) AS BIGINT) AS est_tokens FROM kept GROUP BY 1, 2 ORDER BY 1"),

    "q_multimodal_decode" ->
      ("WITH d AS (SELECT doc_id, (doc_id*31+7) % 13 + 4 AS w, (doc_id*17+3) % 11 + 3 AS h FROM documents), " +
        "jb AS (SELECT doc_id, w, h, bx, by, " +
        "(doc_id*11 + bx*53 + by*29) % 256 AS yv, " +
        "(doc_id*19+35) % 256 AS cb, (doc_id*23+71) % 256 AS cr, " +
        "(CASE WHEN bx = 0 THEN least(w, 8) ELSE greatest(w - 8, 0) END) * " +
        "(CASE WHEN by = 0 THEN least(h, 8) ELSE greatest(h - 8, 0) END) AS npx " +
        "FROM d CROSS JOIN (SELECT * FROM VALUES (0,0),(0,1),(1,0),(1,1) AS t(bx, by)) blk " +
        "WHERE doc_id % 2 = 1), " +
        "j AS (SELECT doc_id, " +
        "sum(npx * least(255, greatest(0, (1000000*yv + 1402000*(cr-128) " +
        "+ 500000 + 256000000) div 1000000 - 256))) AS sum_r, " +
        "sum(npx * least(255, greatest(0, (1000000*yv - 344136*(cb-128) " +
        "- 714136*(cr-128) + 500000 + 256000000) div 1000000 - 256))) AS sum_g, " +
        "sum(npx * least(255, greatest(0, (1000000*yv + 1772000*(cb-128) " +
        "+ 500000 + 256000000) div 1000000 - 256))) AS sum_b " +
        "FROM jb GROUP BY doc_id) " +
        "SELECT d.doc_id, CASE WHEN d.doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format, " +
        "CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height, " +
        "CAST((CASE WHEN d.doc_id % 2 = 0 THEN aggregate(transform(sequence(0, w*h - 1), " +
        "i -> (d.doc_id*7 + (i div w)*31 + (i % w)*13) % 256), 0L, (a, x) -> a + x) " +
        "ELSE sum_r END) * 1000000 div (w*h*255) AS BIGINT) AS mean_r_e6, " +
        "CAST((CASE WHEN d.doc_id % 2 = 0 THEN aggregate(transform(sequence(0, w*h - 1), " +
        "i -> (d.doc_id*7 + (i div w)*31 + (i % w)*13 + 97) % 256), 0L, (a, x) -> a + x) " +
        "ELSE sum_g END) * 1000000 div (w*h*255) AS BIGINT) AS mean_g_e6, " +
        "CAST((CASE WHEN d.doc_id % 2 = 0 THEN aggregate(transform(sequence(0, w*h - 1), " +
        "i -> (d.doc_id*7 + (i div w)*31 + (i % w)*13 + 194) % 256), 0L, (a, x) -> a + x) " +
        "ELSE sum_b END) * 1000000 div (w*h*255) AS BIGINT) AS mean_b_e6 " +
        "FROM d LEFT JOIN j ON d.doc_id = j.doc_id ORDER BY d.doc_id"),

    "q_multimodal_frames" ->
      ("SELECT doc_id, CAST(ceil(octet_length(text)/256.0) AS BIGINT) AS n_frames, " +
        "CAST(ceil(ceil(octet_length(text)/256.0)/4.0) AS BIGINT) AS n_sampled " +
        "FROM documents ORDER BY doc_id"),

    "q_multimodal_meta" ->
      ("SELECT doc_id, CAST(octet_length(text) AS BIGINT) AS n_bytes, " +
        "CAST(octet_length(text) % 640 + 1 AS BIGINT) AS fake_width, " +
        "CAST(octet_length(text) % 480 + 1 AS BIGINT) AS fake_height, " +
        "CASE CAST(doc_id % 5 AS INT) WHEN 0 THEN 'jpeg_baseline' " +
        "WHEN 1 THEN 'jpeg_progressive' WHEN 2 THEN 'jpeg_corrupt' " +
        "WHEN 3 THEN 'png' ELSE 'unknown' END AS media_kind " +
        "FROM documents ORDER BY doc_id"),

    "q_multimodal_resize" ->
      ("WITH d AS (SELECT doc_id, (doc_id*31+7) % 13 + 4 AS w, (doc_id*17+3) % 11 + 3 AS h " +
        "FROM documents) " +
        "SELECT doc_id, CAST(768 AS BIGINT) AS n_pixels, " +
        "CAST(aggregate(transform(sequence(0, 767), i -> " +
        "CASE WHEN doc_id % 2 = 0 THEN " +
        "(doc_id*7 + (((i div 48) * h) div 16) * 31 + ((((i div 3) % 16) * w) div 16) * 13 " +
        "+ (i % 3) * 97) % 256 " +
        "ELSE least(255, greatest(0, (1000000*((doc_id*11 " +
        "+ (((((i div 3) % 16) * w) div 16) div 8)*53 " +
        "+ ((((i div 48) * h) div 16) div 8)*29) % 256) " +
        "+ CASE WHEN i % 3 = 0 THEN 1402000*((doc_id*23+71) % 256 - 128) " +
        "WHEN i % 3 = 1 THEN -344136*((doc_id*19+35) % 256 - 128) " +
        "- 714136*((doc_id*23+71) % 256 - 128) " +
        "ELSE 1772000*((doc_id*19+35) % 256 - 128) END " +
        "+ 500000 + 256000000) div 1000000 - 256)) END), 0L, (a, x) -> a + x) AS BIGINT) AS byte_sum " +
        "FROM d ORDER BY doc_id"),

    "q_ngram_jaccard" ->
      (s"WITH sub AS (SELECT doc_id, $shingles AS sh FROM documents WHERE doc_id % 20 = 0), " +
        "ex AS (SELECT doc_id, s FROM sub LATERAL VIEW explode(sh) e AS s), " +
        "sizes AS (SELECT doc_id, size(sh) AS n FROM sub), " +
        "pairs AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter " +
        "FROM ex x JOIN ex y ON x.s = y.s AND x.doc_id < y.doc_id GROUP BY 1, 2) " +
        "SELECT a, b, round(CAST(inter AS DOUBLE)/(sa.n + sb.n - inter),6) AS jaccard " +
        "FROM pairs JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b " +
        "WHERE inter >= 1 ORDER BY a, b"),

    "q_outliers" ->
      ("WITH med AS (SELECT event_type, percentile(value, 0.5) AS med FROM events GROUP BY 1), " +
        "dev AS (SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS adev " +
        "FROM events e JOIN med m USING (event_type)), " +
        "mad AS (SELECT event_type, percentile(adev, 0.5) AS mad FROM dev GROUP BY 1) " +
        "SELECT d.event_type, count(*) AS n, " +
        "CAST(sum(CASE WHEN d.med - d.value > 3.0*m.mad THEN 1 ELSE 0 END) " +
        "+ sum(CASE WHEN d.value - d.med > 3.0*m.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers, " +
        "CAST(sum(CASE WHEN d.med - d.value > 3.0*m.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_low, " +
        "CAST(sum(CASE WHEN d.value - d.med > 3.0*m.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_high " +
        "FROM dev d JOIN mad m USING (event_type) GROUP BY 1 ORDER BY 1"),

    "q_pack_chunks" ->
      ("WITH tok AS (SELECT doc_id, source, CAST(ceil(CAST(n_chars AS DOUBLE)/4.0) AS BIGINT) AS n_tok FROM documents), " +
        "off AS (SELECT doc_id, source, n_tok, CAST(coalesce(sum(n_tok) OVER " +
        "(PARTITION BY source ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok FROM tok) " +
        "SELECT doc_id, source, n_tok, start_tok, start_tok div 2048 AS chunk_id, " +
        "CASE WHEN n_tok = 0 THEN 0 ELSE (start_tok + n_tok - 1) div 2048 - start_tok div 2048 + 1 END AS n_chunks " +
        "FROM off ORDER BY doc_id"),

    "q_pack_segments" ->
      ("WITH tok AS (SELECT doc_id, source, CAST(ceil(CAST(n_chars AS DOUBLE)/4.0) AS BIGINT) AS n_tok FROM documents), " +
        "off AS (SELECT doc_id, source, n_tok, CAST(coalesce(sum(n_tok) OVER " +
        "(PARTITION BY source ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok FROM tok), " +
        "seg AS (SELECT source, doc_id, n_tok, start_tok, chunk_id FROM (SELECT * FROM off WHERE n_tok > 0) o " +
        "LATERAL VIEW explode(sequence(start_tok div 2048, (start_tok + n_tok - 1) div 2048)) u AS chunk_id) " +
        "SELECT source, chunk_id, doc_id, greatest(start_tok, chunk_id*2048) - start_tok AS tok_start, " +
        "least(start_tok + n_tok, (chunk_id+1)*2048) - greatest(start_tok, chunk_id*2048) AS tok_len, " +
        "greatest(start_tok, chunk_id*2048) - chunk_id*2048 AS chunk_off " +
        "FROM seg ORDER BY source, chunk_id, doc_id"),

    "q_percentiles" ->
      ("SELECT l_returnflag, round(percentile(l_extendedprice, 0.25), 6) AS p25, " +
        "round(percentile(l_extendedprice, 0.50), 6) AS p50, " +
        "round(percentile(l_extendedprice, 0.75), 6) AS p75, " +
        "round(percentile(l_extendedprice, 0.95), 6) AS p95 " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),

    "q_pii_redact" ->
      ("WITH p AS (SELECT doc_id, text || ' contact user' || CAST(doc_id AS STRING) || '@' || source || " +
        "'.net tel 555-' || lpad(CAST(doc_id AS STRING), 6, '0') AS t FROM documents) " +
        "SELECT doc_id, regexp_replace(regexp_replace(t, '[a-z0-9._]+@[a-z0-9.]+', '<EMAIL>'), " +
        "'[0-9]{3}-[0-9]{4,6}', '<NUM>') AS red_text, " +
        "CAST(size(regexp_extract_all(t, '[a-z0-9._]+@[a-z0-9.]+', 0)) AS BIGINT) AS n_emails, " +
        "CAST(size(regexp_extract_all(t, '[0-9]{3}-[0-9]{4,6}', 0)) AS BIGINT) AS n_phones " +
        "FROM p ORDER BY doc_id"),

    "q_quality_repetition" ->
      (s"WITH w AS (SELECT doc_id, n_chars, $toks AS t FROM documents), " +
        "g AS (SELECT doc_id, n_chars, gm FROM (SELECT * FROM w WHERE size(t) >= 2) ww " +
        "LATERAL VIEW explode(transform(sequence(1, size(t) - 1), " +
        "i -> concat(element_at(t, i), ' ', element_at(t, i+1)))) u AS gm), " +
        "c AS (SELECT doc_id, n_chars, gm, count(*) AS cnt FROM g GROUP BY 1, 2, 3), " +
        "r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, gm) AS rn FROM c), " +
        "a AS (SELECT doc_id, n_chars, sum(cnt) AS n_grams, count(*) AS n_distinct, " +
        "max(CASE WHEN rn = 1 THEN gm END) AS top_gram, max(CASE WHEN rn = 1 THEN cnt END) AS top_cnt " +
        "FROM r GROUP BY 1, 2) " +
        "SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams, CAST(n_distinct AS BIGINT) AS n_distinct, " +
        "top_gram, CAST(top_cnt AS BIGINT) AS top_cnt, " +
        "top_cnt * length(top_gram) * 1000000 div n_chars AS top_frac_e6, " +
        "CAST((n_grams - n_distinct) * 1000000 div n_grams AS BIGINT) AS dup_frac_e6 " +
        "FROM a ORDER BY doc_id"),

    "q_quality_lm" ->
      (s"WITH w AS (SELECT doc_id, $toks AS t FROM documents), " +
        "bg AS (SELECT doc_id, element_at(t, i) AS w0, element_at(t, i + 1) AS w1 " +
        "FROM (SELECT * FROM w WHERE size(t) >= 2) ww " +
        "LATERAL VIEW explode(sequence(1, size(t) - 1)) u AS i), " +
        "c2 AS (SELECT w0, w1, count(*) AS c2 FROM bg GROUP BY 1, 2), " +
        "c1 AS (SELECT w0, sum(c2) AS c1 FROM c2 GROUP BY 1), " +
        "v AS (SELECT count(DISTINCT w1) AS v FROM c2), " +
        "sc AS (SELECT bg.doc_id, " +
        "CAST(floor(ln((c2.c2 + 1.0D) / (c1.c1 + v.v)) * 1e9) AS BIGINT) AS lp " +
        "FROM bg JOIN c2 USING (w0, w1) JOIN c1 USING (w0) CROSS JOIN v) " +
        "SELECT doc_id, count(*) AS n_bigrams, " +
        "(-sum(lp)) div (count(*) * 1000) AS nll_e6 " +
        "FROM sc GROUP BY doc_id ORDER BY doc_id"),

    "q_quality_lm_kn" ->
      (s"WITH w AS (SELECT doc_id, $toks AS t FROM documents), " +
        "bg AS (SELECT doc_id, element_at(t, i) AS w0, element_at(t, i + 1) AS w1 " +
        "FROM (SELECT * FROM w WHERE size(t) >= 2) ww " +
        "LATERAL VIEW explode(sequence(1, size(t) - 1)) u AS i), " +
        "c2 AS (SELECT w0, w1, count(*) AS c2 FROM bg GROUP BY 1, 2), " +
        "c1 AS (SELECT w0, sum(c2) AS c1, count(*) AS nf FROM c2 GROUP BY 1), " +
        "np AS (SELECT w1, count(*) AS np FROM c2 GROUP BY 1), " +
        "nbt AS (SELECT count(*) AS nbt FROM c2), " +
        "sc AS (SELECT bg.doc_id, " +
        "CAST(floor(ln(((c2.c2 - 0.75D) + 0.75D * c1.nf * " +
        "(CAST(np.np AS DOUBLE) / nbt.nbt)) / c1.c1) * 1e9) AS BIGINT) AS lp " +
        "FROM bg JOIN c2 USING (w0, w1) JOIN c1 USING (w0) " +
        "JOIN np USING (w1) CROSS JOIN nbt) " +
        "SELECT doc_id, count(*) AS n_bigrams, " +
        "(-sum(lp)) div (count(*) * 1000) AS nll_e6 " +
        "FROM sc GROUP BY doc_id ORDER BY doc_id"),

    "q_quality_score" ->
      (s"SELECT doc_id, $quality AS quality_e6 FROM documents ORDER BY doc_id"),

    "q_select_dsir" ->
      (s"WITH toks AS (SELECT doc_id, source = 'src0' AS is_t, " +
        "CAST(conv(substring(md5(tok), 1, 6), 16, 10) AS BIGINT) % 64 AS b " +
        s"FROM documents LATERAL VIEW explode($toks) u AS tok), " +
        "m AS (SELECT b, count(*) AS nr, " +
        "sum(CASE WHEN is_t THEN 1L ELSE 0L END) AS nt FROM toks GROUP BY 1), " +
        "tot AS (SELECT sum(nr) AS tr, sum(nt) AS tt FROM m), " +
        "lr AS (SELECT b, CAST(floor((ln((nt + 1.0D) / (tt + 64)) " +
        "- ln((nr + 1.0D) / (tr + 64))) * 1e9) AS BIGINT) AS lr_e9 " +
        "FROM m CROSS JOIN tot) " +
        "SELECT doc_id, count(*) AS n_tokens, sum(lr_e9) AS w_e9 " +
        "FROM toks JOIN lr USING (b) " +
        "GROUP BY doc_id ORDER BY w_e9 DESC, doc_id LIMIT 20"),

    "q_range_join" ->
      ("SELECT a.event_id, count(*) AS n_nearby FROM events a JOIN events b " +
        "ON abs(unix_micros(a.ts) - unix_micros(b.ts)) <= 60000000 AND b.user_id <> a.user_id " +
        "GROUP BY a.event_id ORDER BY a.event_id"),

    "q_retention" ->
      ("WITH e AS (SELECT DISTINCT user_id, unix_micros(ts) div 86400000000 AS day FROM events), " +
        "f AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY 1) " +
        "SELECT cohort_day, day - cohort_day AS day_offset, count(*) AS n_users " +
        "FROM e JOIN f USING (user_id) GROUP BY 1, 2 ORDER BY 1, 2"),

    "q_rolling_range" ->
      ("SELECT user_id, event_id, unix_micros(ts) AS us, " +
        "count(*) OVER (PARTITION BY user_id ORDER BY unix_micros(ts) " +
        "RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS n_trailing, " +
        "CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY unix_micros(ts) " +
        "RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_trailing " +
        "FROM events ORDER BY user_id, event_id"),

    "q_ship_priority" ->
      ("SELECT l_orderkey, round(CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue, " +
        "unix_micros(CAST(o_orderdate AS TIMESTAMP)) AS o_date_us, o_orderpriority " +
        "FROM customer, orders, lineitem " +
        "WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey " +
        "AND o_orderdate < TIMESTAMP_NTZ '1998-06-01' AND l_shipdate > TIMESTAMP_NTZ '1998-06-01' " +
        "GROUP BY l_orderkey, unix_micros(CAST(o_orderdate AS TIMESTAMP)), o_orderpriority " +
        "ORDER BY revenue DESC, l_orderkey LIMIT 10"),

    "q_similarity_filtered" ->
      (s"WITH scored AS (SELECT a.vec_id AS qid, b.vec_id AS neighbor_id, ${cosSql("a", "b")} AS score " +
        "FROM embeddings a JOIN embeddings b ON a.vec_id % 100 = 0 AND a.vec_id < 2000 " +
        "AND a.label = b.label AND a.vec_id <> b.vec_id), " +
        "ranked AS (SELECT qid, neighbor_id, score, " +
        "row_number() OVER (PARTITION BY qid ORDER BY score DESC, neighbor_id) AS rank FROM scored) " +
        "SELECT qid, rank, neighbor_id, round(score,6) AS score FROM ranked " +
        "WHERE rank <= 5 ORDER BY qid, rank"),

    "q_similarity_topk" ->
      (s"WITH scored AS (SELECT a.vec_id AS qid, b.vec_id AS neighbor_id, ${cosSql("a", "b")} AS score " +
        "FROM embeddings a JOIN embeddings b ON a.vec_id % 100 = 0 AND a.vec_id < 2000 " +
        "AND a.vec_id <> b.vec_id), " +
        "ranked AS (SELECT qid, neighbor_id, score, " +
        "row_number() OVER (PARTITION BY qid ORDER BY score DESC, neighbor_id) AS rank FROM scored) " +
        "SELECT qid, rank, neighbor_id, round(score,6) AS score FROM ranked " +
        "WHERE rank <= 5 ORDER BY qid, rank"),

    "q_sketch_heavy" ->
      ("WITH t AS (SELECT term FROM documents LATERAL VIEW explode(regexp_extract_all(text, '[a-z0-9]+', 0)) e AS term), " +
        "e AS (SELECT term, count(*) AS n FROM t GROUP BY 1) " +
        "SELECT (SELECT term FROM e ORDER BY n DESC, term LIMIT 1) AS top1_term, " +
        "(SELECT CAST(n AS BIGINT) FROM e ORDER BY n DESC, term LIMIT 1) AS top1_n, " +
        "(SELECT CAST(count(*) AS BIGINT) FROM e) AS n_terms, " +
        "TRUE AS top10_covered, TRUE AS bounds_ok"),

    "q_sketch_quantiles" ->
      ("SELECT round(percentile(l_extendedprice, 0.5),4) AS p50, " +
        "round(percentile(l_extendedprice, 0.9),4) AS p90, " +
        "TRUE AS q50_ok, TRUE AS q90_ok FROM lineitem"),

    "q_source_mix" ->
      ("WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1), " +
        "r AS (SELECT source, least(1000, 15000 div n) AS rate FROM c) " +
        "SELECT d.source, count(*) AS n_kept FROM documents d JOIN r USING (source) " +
        "WHERE ((doc_id % 1000003) * 1103515245 + 12345) % 1000 < rate " +
        "GROUP BY d.source ORDER BY d.source"),

    "q_source_quality" ->
      (s"SELECT source, count(*) AS n_docs, " +
        s"CAST(sum($quality) div count(*) AS BIGINT) AS mean_quality_e6, " +
        s"min($quality) AS min_quality_e6, max($quality) AS max_quality_e6 " +
        "FROM documents GROUP BY 1 ORDER BY 1"),

    "q_text_normalize" ->
      (s"SELECT doc_id, $norm AS norm_text, length($norm) AS n_norm_chars " +
        "FROM documents ORDER BY doc_id"),

    "q_text_stats" ->
      (s"SELECT doc_id, n_chars, CAST(size($toks) AS BIGINT) AS n_tokens, " +
        s"CAST(floor(CAST(n_chars AS DOUBLE)/size($toks)*1000000) AS BIGINT) AS chars_per_token_e6, " +
        s"CAST(floor(CAST($stop AS DOUBLE)/size($toks)*1000000) AS BIGINT) AS stopword_ratio_e6 " +
        "FROM documents ORDER BY doc_id"),

    "q_token_count" ->
      ("SELECT doc_id, CAST(size(regexp_extract_all(text,'[a-z0-9]+', 0)) AS BIGINT) AS n_word_tokens, " +
        "CAST(ceil(CAST(n_chars AS DOUBLE)/4.0) AS BIGINT) AS n_bpe_est " +
        "FROM documents ORDER BY doc_id"),

    "q_top_terms" ->
      ("WITH tf AS (SELECT doc_id, term, count(*) AS tf FROM (SELECT doc_id, term FROM documents " +
        "LATERAL VIEW explode(regexp_extract_all(text, '[a-z0-9]+', 0)) e AS term) GROUP BY 1, 2), " +
        "df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1), " +
        "n AS (SELECT count(*) AS n_docs FROM documents), " +
        "sc AS (SELECT tf.doc_id, tf.term, tf.tf, df.df, tf.tf * (n.n_docs div df.df) AS score " +
        "FROM tf JOIN df USING (term) CROSS JOIN n WHERE tf.term NOT IN ('the','a','of','and','in')), " +
        "r AS (SELECT sc.*, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, tf DESC, term) AS rk FROM sc) " +
        "SELECT doc_id, rk, term, tf, df, score FROM r WHERE rk <= 3 ORDER BY doc_id, rk"),

    "q_vocab_coverage" ->
      (s"WITH tr AS (SELECT term FROM documents LATERAL VIEW explode($toks) e AS term WHERE doc_id % 4 <> 0), " +
        "v AS (SELECT term FROM (SELECT term, count(*) AS tf FROM tr WHERE term <> '' GROUP BY 1) " +
        "ORDER BY tf DESC, term LIMIT 20), " +
        s"h AS (SELECT term FROM documents LATERAL VIEW explode($toks) e AS term WHERE doc_id % 4 = 0), " +
        "hh AS (SELECT term FROM h WHERE term <> ''), " +
        "st AS (SELECT (SELECT count(*) FROM v) AS n_vocab, (SELECT count(*) FROM hh) AS n_held_tokens, " +
        "(SELECT count(*) FROM hh WHERE term NOT IN (SELECT term FROM v)) AS n_oov) " +
        "SELECT n_vocab, n_held_tokens, n_oov, n_oov * 1000000 div n_held_tokens AS oov_e6 FROM st"),

    "q_bm25_topk" -> bm25Twin,
    // the append key serves the SAME full-corpus ranking from the
    // incrementally-maintained stored index — identical twin text
    "q_retrieval_append" -> bm25Twin,
    "q_retrieval_delete" ->
      bm25TwinOver("(SELECT * FROM documents WHERE doc_id % 4 <> 1) AS live"),

    // hybrid RRF: doc 42's top-tf terms → BM25 ranks, its embedding
    // → exact cosine ranks, integer fusion over the top-50 cuts
    "q_retrieval_hybrid" ->
      ("WITH dt AS (SELECT doc_id, term FROM documents " +
        "LATERAL VIEW explode(regexp_extract_all(text, '[a-z0-9]+', 0)) e AS term), " +
        "q AS (SELECT term FROM dt WHERE doc_id = 42 " +
        "AND term NOT IN ('the','a','of','and','in') " +
        "GROUP BY term ORDER BY count(*) DESC, term LIMIT 3), " +
        "df AS (SELECT term, count(DISTINCT doc_id) AS df FROM dt GROUP BY term), " +
        "dl AS (SELECT doc_id, CAST(size(regexp_extract_all(text, '[a-z0-9]+', 0)) AS BIGINT) AS dl " +
        "FROM documents), " +
        "st AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl), " +
        "tf AS (SELECT dt.doc_id, dt.term, df, count(*) AS tf FROM dt JOIN q USING (term) " +
        "JOIN df USING (term) GROUP BY dt.doc_id, dt.term, df), " +
        "sc AS (SELECT tf.doc_id, CAST(floor(" +
        "ln(1.0D + (CAST(n_docs AS DOUBLE) - df + 0.5D) / (CAST(df AS DOUBLE) + 0.5D)) " +
        "* (CAST(tf AS DOUBLE) * (1.2D + 1.0D) / (CAST(tf AS DOUBLE) " +
        "+ 1.2D * (1.0D - 0.75D + 0.75D * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / n_docs))))) " +
        "* 1000000.0D) AS BIGINT) AS score_e6 FROM tf JOIN dl USING (doc_id) CROSS JOIN st), " +
        "bm AS (SELECT doc_id, sum(score_e6) AS bm25_e6 FROM sc WHERE doc_id <> 42 GROUP BY doc_id), " +
        "spt AS (SELECT doc_id, bm25_e6 FROM bm ORDER BY bm25_e6 DESC, doc_id LIMIT 50), " +
        "sp AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY bm25_e6 DESC, doc_id) AS BIGINT) AS r_sparse FROM spt), " +
        "dn0 AS (SELECT b.vec_id AS doc_id, " + cosSql("a", "b") + " AS score " +
        "FROM embeddings a JOIN embeddings b ON a.vec_id = 42 AND b.vec_id <> 42), " +
        "dnt AS (SELECT doc_id, score FROM dn0 ORDER BY score DESC, doc_id LIMIT 50), " +
        "dn AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS r_dense FROM dnt), " +
        "f AS (SELECT coalesce(sp.doc_id, dn.doc_id) AS doc_id, " +
        "CAST(coalesce(1000000000 DIV (60 + r_sparse), 0) + coalesce(1000000000 DIV (60 + r_dense), 0) AS BIGINT) AS rrf_e9, " +
        "CAST(coalesce(r_sparse, 0) AS BIGINT) AS r_sparse, " +
        "CAST(coalesce(r_dense, 0) AS BIGINT) AS r_dense " +
        "FROM sp FULL OUTER JOIN dn ON sp.doc_id = dn.doc_id) " +
        "SELECT doc_id, rrf_e9, r_sparse, r_dense " +
        "FROM f ORDER BY rrf_e9 DESC, doc_id LIMIT 10"),

    "q_multimodal_audio" ->
      ("WITH g AS (SELECT doc_id, doc_id % 64 + 16 AS n, doc_id % 2 + 1 AS ch, " +
        "8000 + (doc_id % 3) * 4000 AS rate FROM documents), " +
        "s AS (SELECT doc_id, n, ch, rate, explode(sequence(0, n * ch - 1)) AS k FROM g), " +
        "v AS (SELECT doc_id, n, ch, rate, " +
        "(doc_id * 7919 + (k DIV ch) * 104729 + (k % ch) * 31337) % 65536 - 32768 AS amp FROM s) " +
        "SELECT doc_id, CAST(rate AS BIGINT) AS sample_rate, " +
        "CAST(ch AS BIGINT) AS n_channels, CAST(n AS BIGINT) AS n_frames, " +
        "CAST(sum(amp) AS BIGINT) AS sum_amp, CAST(sum(amp * amp) AS BIGINT) AS sum_sq, " +
        "CAST(max(abs(amp)) AS BIGINT) AS peak_amp " +
        "FROM v GROUP BY doc_id, rate, ch, n ORDER BY doc_id"),

    "q_multimodal_progressive" ->
      ("WITH d AS (SELECT doc_id, (doc_id*31+7) % 13 + 4 AS w, (doc_id*17+3) % 11 + 3 AS h FROM documents), " +
        "jb AS (SELECT doc_id, w, h, bx, by, " +
        "(doc_id*11 + bx*53 + by*29) % 256 AS yv, " +
        "(doc_id*19+35) % 256 AS cb, (doc_id*23+71) % 256 AS cr, " +
        "(CASE WHEN bx = 0 THEN least(w, 8) ELSE greatest(w - 8, 0) END) * " +
        "(CASE WHEN by = 0 THEN least(h, 8) ELSE greatest(h - 8, 0) END) AS npx " +
        "FROM d CROSS JOIN (SELECT * FROM VALUES (0,0),(0,1),(1,0),(1,1) AS t(bx, by)) blk), " +
        "j AS (SELECT doc_id, " +
        "sum(npx * least(255, greatest(0, (1000000*yv + 1402000*(cr-128) " +
        "+ 500000 + 256000000) div 1000000 - 256))) AS sum_r, " +
        "sum(npx * least(255, greatest(0, (1000000*yv - 344136*(cb-128) " +
        "- 714136*(cr-128) + 500000 + 256000000) div 1000000 - 256))) AS sum_g, " +
        "sum(npx * least(255, greatest(0, (1000000*yv + 1772000*(cb-128) " +
        "+ 500000 + 256000000) div 1000000 - 256))) AS sum_b " +
        "FROM jb GROUP BY doc_id) " +
        "SELECT d.doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height, " +
        "CAST(sum_r * 1000000 div (w*h*255) AS BIGINT) AS mean_r_e6, " +
        "CAST(sum_g * 1000000 div (w*h*255) AS BIGINT) AS mean_g_e6, " +
        "CAST(sum_b * 1000000 div (w*h*255) AS BIGINT) AS mean_b_e6 " +
        "FROM d JOIN j ON d.doc_id = j.doc_id ORDER BY d.doc_id"),

    "q_embed_project" ->
      ("WITH ux AS (SELECT vec_id, pos, x FROM embeddings " +
        "LATERAL VIEW posexplode(CAST(embedding AS ARRAY<DOUBLE>)) e AS pos, x), " +
        "ex AS (SELECT vec_id, CAST(pos AS BIGINT) AS pos, " +
        "CAST(floor(x * 1000000.0D) AS BIGINT) AS q FROM ux), " +
        "hj AS (SELECT vec_id, q, j, (pos*131 + j)*2654435761 + 12345 AS h1 " +
        "FROM ex LATERAL VIEW explode(sequence(0, 7)) t AS j), " +
        "h2t AS (SELECT vec_id, q, j, " +
        "((h1 ^ shiftright(h1, 13)) % 1048573)*2654435761 + 999983 AS h2 FROM hj), " +
        "sg AS (SELECT vec_id, j, " +
        "CASE WHEN (h2 ^ shiftright(h2, 17)) % 2 = 0 THEN q ELSE -q END AS sq FROM h2t) " +
        "SELECT vec_id, " +
        (0 until 8).map(j =>
          s"sum(CASE WHEN j = $j THEN sq END) AS p${j}_e6").mkString(", ") +
        " FROM sg GROUP BY vec_id ORDER BY vec_id"),

    "q_multimodal_video" ->
      ("WITH d AS (SELECT doc_id, (doc_id*31+7) % 13 + 4 AS w, " +
        "(doc_id*17+3) % 11 + 3 AS h, doc_id % 5 + 3 AS nf FROM documents), " +
        "sel AS (SELECT doc_id, w, h, nf, f, doc_id + f*1144 AS fid " +
        "FROM (SELECT doc_id, w, h, nf, explode(sequence(0, nf - 1)) AS f FROM d) " +
        "WHERE f % 2 = 0), " +
        "jb AS (SELECT doc_id, f, nf, w, h, " +
        "(fid*11 + bx*53 + by*29) % 256 AS yv, " +
        "(fid*19+35) % 256 AS cb, (fid*23+71) % 256 AS cr, " +
        "(CASE WHEN bx = 0 THEN least(w, 8) ELSE greatest(w - 8, 0) END) * " +
        "(CASE WHEN by = 0 THEN least(h, 8) ELSE greatest(h - 8, 0) END) AS npx " +
        "FROM sel CROSS JOIN (SELECT * FROM VALUES (0,0),(0,1),(1,0),(1,1) AS t(bx, by)) blk), " +
        "j AS (SELECT doc_id, f, nf, w, h, " +
        "sum(npx * least(255, greatest(0, (1000000*yv + 1402000*(cr-128) " +
        "+ 500000 + 256000000) div 1000000 - 256))) AS sum_r, " +
        "sum(npx * least(255, greatest(0, (1000000*yv - 344136*(cb-128) " +
        "- 714136*(cr-128) + 500000 + 256000000) div 1000000 - 256))) AS sum_g, " +
        "sum(npx * least(255, greatest(0, (1000000*yv + 1772000*(cb-128) " +
        "+ 500000 + 256000000) div 1000000 - 256))) AS sum_b " +
        "FROM jb GROUP BY doc_id, f, nf, w, h) " +
        "SELECT doc_id, CAST(f AS BIGINT) AS frame_idx, " +
        "CAST(nf AS BIGINT) AS n_frames, " +
        "CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height, " +
        "CAST(sum_r * 1000000 div (w*h*255) AS BIGINT) AS mean_r_e6, " +
        "CAST(sum_g * 1000000 div (w*h*255) AS BIGINT) AS mean_g_e6, " +
        "CAST(sum_b * 1000000 div (w*h*255) AS BIGINT) AS mean_b_e6 " +
        "FROM j ORDER BY doc_id, frame_idx"),

    // states the oracle's weaker contract (exact word counts, the
    // operator-proven bounds as literals) in Spark dialect — the
    // trained unigram segmentation itself is EM-derived and has no
    // SQL statement, exactly like the DuckDB side
    "q_unigram_encode" ->
      ("SELECT doc_id, CAST(size(regexp_extract_all(text, '[a-z0-9]+', 0)) AS BIGINT) AS n_words, " +
        "TRUE AS bounded_ok, TRUE AS roundtrip_ok FROM documents ORDER BY doc_id"),

    "q_pack_unigram" ->
      ("SELECT doc_id, source, " +
        "CAST(size(regexp_extract_all(text, '[a-z0-9]+', 0)) AS BIGINT) AS n_words, " +
        "TRUE AS bounded_ok, TRUE AS tile_ok FROM documents ORDER BY doc_id"),

    "q_bpe_merges" -> bpeTwin(5),
    "q_bpe_encode" -> bpeEncodeTwin(5),
    "q_pack_bpe" -> bpePackTwin(5, 512),
    "q_html_extract" -> htmlExtractTwin
  )

  /** Spark-dialect twin of htmlExtractOracleSql (regexp_replace is
    * global by default; size/len, backslash-escaped quote). */
  private def htmlExtractTwin: String = {
    val page = "'<html><head><title>doc ' || doc_id || '</title>' || " +
      "'<style>body { color: #000; font: 12px; }</style>' || " +
      "'<script>var x = 1; if (x < 2) { x = \"&amp;\"; }</script>' || " +
      "'</head><body>' || " +
      "'<nav><ul><li><a href=\"/home\">home</a></li>" +
      "<li><a href=\"/about\">about</a></li></ul></nav>' || " +
      "'<h1>' || source || ' ' || doc_id || '</h1>' || " +
      "'<p>intro &amp; summary &lt;generated&gt;</p>' || " +
      "'<p>' || replace(text, 'spark', '&quot;spark&quot;') || '</p>' || " +
      "'<footer><a href=\"/tos\">terms</a> of use</footer>' || " +
      "'</body></html>'"
    val noBlocks = Seq("script", "style", "nav", "header", "footer", "aside")
      .foldLeft("html") { (c, t) =>
        s"regexp_replace($c, '(?i)<$t[^>]*>.*?</$t>', ' ')"
      }
    val noTags =
      s"regexp_replace(regexp_replace($noBlocks, '<!--.*?-->', ' '), '<[^>]+>', ' ')"
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&apos;" -> "\\'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, v)) => s"replace($c, '$e', '$v')" }
    s"WITH h AS (SELECT doc_id, $page AS html FROM documents), " +
      s"c AS (SELECT doc_id, html, trim(regexp_replace($decoded, ' +', ' ')) AS clean_text FROM h) " +
      "SELECT doc_id, clean_text, " +
      "CAST(length(clean_text) AS BIGINT) AS n_clean_chars, " +
      "CAST(size(regexp_extract_all(html, '<[^>]+>', 0)) AS BIGINT) AS n_tags, " +
      "CAST(size(regexp_extract_all(html, '(?i)<a[^>]*>', 0)) AS BIGINT) AS n_links, " +
      "CAST(size(regexp_extract_all(html, '&[a-z]+;', 0)) AS BIGINT) AS n_entities, " +
      "CAST(floor(CAST(length(clean_text) AS DOUBLE) / length(html) * 1000000) AS BIGINT) AS content_ratio_e6 " +
      "FROM c ORDER BY doc_id"
  }

  /** Spark-dialect unroll of PipelineQueries.bpeChainSql — same
    * delimiter-wrapped replace semantics; sequence() guarded against
    * Spark's descending-range behavior on single-symbol words. */
  private def bpeChainTwin(rounds: Int, finalWf: Boolean): String = {
    val sb = new StringBuilder
    sb ++= ("WITH wf0 AS (SELECT word, regexp_replace(word, '(.)', '<$1>') AS sym, n " +
      "FROM (SELECT word, count(*) AS n FROM (SELECT word FROM documents " +
      "LATERAL VIEW explode(regexp_extract_all(text, '[a-z0-9]+', 0)) e AS word) GROUP BY word))")
    for (r <- 1 to rounds) {
      val p = r - 1
      sb ++= s", tk$r AS (SELECT regexp_extract_all(sym, '[^<>]+', 0) AS tk, n FROM wf$p)"
      sb ++= (s", pc$r AS (SELECT element_at(tk, i) AS a, element_at(tk, i+1) AS b, " +
        s"sum(n) AS cnt FROM (SELECT tk, n FROM tk$r WHERE size(tk) >= 2) " +
        s"LATERAL VIEW explode(sequence(1, size(tk) - 1)) u AS i GROUP BY a, b)")
      sb ++= s", top$r AS (SELECT a, b, cnt FROM pc$r ORDER BY cnt DESC, a, b LIMIT 1)"
      if (r < rounds || finalWf)
        sb ++= (s", wf$r AS (SELECT word, replace(sym, (SELECT concat('<', a, '><', b, '>') FROM top$r), " +
          s"(SELECT concat('<', a, b, '>') FROM top$r)) AS sym, n FROM wf$p)")
    }
    sb.toString
  }

  private def bpeTwin(rounds: Int): String = {
    val sb = new StringBuilder(bpeChainTwin(rounds, finalWf = false))
    sb ++= " SELECT * FROM ("
    sb ++= (1 to rounds).map(r =>
      s"SELECT $r AS round, a AS pair_a, b AS pair_b, cnt FROM top$r").mkString(" UNION ALL ")
    sb ++= ") ORDER BY round"
    sb.toString
  }

  /** Spark-dialect twin of bpeEncodeOracleSql: posexplode for the
    * ordinality, collect_list + array_sort + transform for the
    * ORDER BY string_agg. */
  private def bpeEncodeTwin(rounds: Int): String =
    bpeChainTwin(rounds, finalWf = true) +
      s", vocab AS (SELECT word, regexp_extract_all(sym, '[^<>]+', 0) AS syms FROM wf$rounds)" +
      ", symtab AS (SELECT symbol, CAST(row_number() OVER (ORDER BY symbol) AS INT) AS tid " +
      "FROM (SELECT DISTINCT symbol FROM vocab LATERAL VIEW explode(syms) e AS symbol))" +
      ", wsym AS (SELECT word, spos, symbol FROM vocab " +
      "LATERAL VIEW posexplode(syms) e AS spos, symbol)" +
      ", wids AS (SELECT word, array_join(transform(array_sort(" +
      "collect_list(struct(spos, tid))), s -> CAST(s.tid AS STRING)), ' ') AS wids, " +
      "count(1) AS wn FROM wsym JOIN symtab USING (symbol) GROUP BY word)" +
      ", dw AS (SELECT doc_id, wpos, word FROM documents " +
      "LATERAL VIEW posexplode(regexp_extract_all(text, '[a-z0-9]+', 0)) e AS wpos, word)" +
      " SELECT d.doc_id, coalesce(sum(j.wn), 0) AS n_tokens, " +
      "coalesce(array_join(transform(array_sort(" +
      "collect_list(struct(j.wpos, j.wids))), s -> s.wids), ' '), '') AS token_ids " +
      "FROM documents d LEFT JOIN (SELECT dw.doc_id, dw.wpos, wids.wids, wids.wn " +
      "FROM dw JOIN wids USING (word)) j ON d.doc_id = j.doc_id " +
      "GROUP BY d.doc_id ORDER BY d.doc_id"

  private def bpePackTwin(rounds: Int, seqLen: Int): String =
    bpeChainTwin(rounds, finalWf = true) +
      s", wcnt AS (SELECT word, CAST(size(regexp_extract_all(sym, '[^<>]+', 0)) AS BIGINT) AS wn FROM wf$rounds)" +
      ", dw AS (SELECT doc_id, word FROM documents " +
      "LATERAL VIEW explode(regexp_extract_all(text, '[a-z0-9]+', 0)) e AS word)" +
      ", tok AS (SELECT d.doc_id, d.source, coalesce(sum(j.wn), 0) AS n_tok " +
      "FROM documents d LEFT JOIN (SELECT dw.doc_id, wcnt.wn FROM dw JOIN wcnt USING (word)) j " +
      "ON d.doc_id = j.doc_id GROUP BY d.doc_id, d.source)" +
      ", off AS (SELECT doc_id, source, n_tok, " +
      "coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok FROM tok) " +
      "SELECT doc_id, source, n_tok, start_tok, " +
      s"start_tok div $seqLen AS chunk_id, " +
      "CASE WHEN n_tok = 0 THEN 0 ELSE " +
      s"(start_tok + n_tok - 1) div $seqLen - start_tok div $seqLen + 1 END AS n_chunks " +
      "FROM off ORDER BY doc_id"
}
