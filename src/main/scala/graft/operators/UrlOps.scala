package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + host-level governance — the first grouping
  * key every crawl-curation report uses (dup rates, quality stats,
  * robots/licence decisions are all made PER HOST, not per page).
  *
  * Canonicalization is a fixed, engine-portable rule sequence (every
  * regex avoids backslash escapes and backreferences so the SAME
  * pattern text runs in Spark, Spark SQL, and the oracle dialect):
  *
  *   1. scheme and host:port lowercase (RFC 3986 §6.2.2.1 — they are
  *      case-insensitive; the path is NOT touched);
  *   2. a leading `www.` label is dropped from the host;
  *   3. the scheme's default port is stripped (`:80` for http,
  *      `:443` for https — RFC 3986 §6.2.3); non-default ports stay;
  *   4. the fragment is dropped (never sent to the server);
  *   5. tracking parameters (`utm_*`, `fbclid`, `gclid`) are removed
  *      from the query — ALL occurrences — and the query is re-seamed
  *      (a surviving first param gets `?`, an emptied query drops it);
  *   6. trailing slashes are stripped from the path.
  *
  * Scale shape: canonicalization is a per-row codegen'd projection
  * (regexp over the url column — no shuffle, no UDF); the host
  * report is ONE hash aggregation keyed by host with map-side
  * partial counts. At 100 TB the report shuffles |hosts| rows per
  * partition, never URLs.
  */
object UrlOps {

  /** Lowercased scheme (`http`, `https`, …) of a raw URL column. */
  def scheme(url: Column): Column =
    lower(regexp_extract(url, "^([A-Za-z]+)://", 1))

  /** Canonical host: lowercase, `www.` dropped, default port for the
    * URL's scheme stripped (non-default ports are identity-bearing
    * and stay). */
  def canonicalHost(url: Column): Column = {
    val hostport = lower(regexp_extract(url, "^[A-Za-z]+://([^/?#]*)", 1))
    val h1 = regexp_replace(hostport, "^www[.]", "")
    val s = scheme(url)
    when(s === "http", regexp_replace(h1, ":80$", ""))
      .when(s === "https", regexp_replace(h1, ":443$", ""))
      .otherwise(h1)
  }

  /** The full canonical URL under the rules above. Query re-seaming
    * is the prepend-`&`/strip-`&` trick: with every param uniformly
    * `&`-prefixed, one global regex removes ALL tracking params
    * regardless of position, then the leading separator is restored
    * (`?` if any param survived, nothing otherwise) — no
    * backreferences, no per-param loop. */
  def canonicalUrl(url: Column): Column = {
    val rest = regexp_replace(url, "^[A-Za-z]+://[^/?#]*", "")
    val noFrag = regexp_replace(rest, "#.*$", "")
    val path = regexp_replace(regexp_extract(noFrag, "^([^?]*)", 1), "/+$", "")
    val q = regexp_replace(
      regexp_replace(concat(lit("&"), regexp_extract(noFrag, "[?](.*)$", 1)),
        "&(utm_[a-z0-9_]+|fbclid|gclid)=[^&]*", ""),
      "^&+", "")
    concat(scheme(url), lit("://"), canonicalHost(url), path,
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }

  /** `host` + `canon_url` columns appended to any frame with a raw
    * URL column. */
  def withCanonical(df: DataFrame, urlCol: String = "url"): DataFrame =
    df.withColumn("host", canonicalHost(col(urlCol)))
      .withColumn("canon_url", canonicalUrl(col(urlCol)))

  /** Host-level governance report: per canonical host, the raw URL
    * count, the distinct-canonical count, the duplicate surplus
    * (raw − canonical — URL-alias pressure, the crawl-frontier
    * dedup signal), and the lexicographically-first canonical URL as
    * a stable sample. One hash aggregation keyed by host. */
  def hostReport(withCanon: DataFrame): DataFrame =
    withCanon.groupBy(col("host"))
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("canon_url")).as("n_canon"),
        (count(lit(1)) - countDistinct(col("canon_url"))).as("n_dup"),
        min(col("canon_url")).as("sample_canon"))
      .orderBy(col("host"))
}
