package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML/markup ingestion — the front door every real crawl corpus
  * walks through before ANY text-pipeline operator runs (the
  * reference consumes LibSVM, but an LLM training-data pipeline's
  * raw input is markup): strip script/style payloads, drop
  * structural boilerplate blocks (nav/header/footer/aside — the
  * trafilatura/jusText rule reduced to its structural core), strip
  * the remaining tags, decode the named entities, and collapse
  * whitespace — plus the per-document markup statistics a curation
  * stage filters on (tag density, link count, content ratio).
  *
  * Everything is a chain of `regexp_replace` / `regexp_extract_all`
  * column expressions — whole-stage codegen, no UDF, embarrassingly
  * parallel (a per-row map over the scan; zero shuffle at 100 TB).
  * The patterns avoid lookaround and dotall so the SAME text runs
  * under Java regex (Spark) and RE2 (DuckDB oracle): documents are
  * single-line, lazy quantifiers and inline `(?i)` are common to
  * both engines.
  *
  * Entity normalization: `&nbsp;` decodes to a PLAIN space (U+0020,
  * not U+00A0) — the collapse step would fold it anyway and the
  * pipeline's downstream tokenizers treat every whitespace equally;
  * `&amp;` decodes LAST so `&amp;lt;` correctly yields the literal
  * text "&lt;" rather than double-decoding to "<".
  */
object Html {

  /** Blocks whose CONTENT is dropped wholesale: script/style carry
    * code, nav/header/footer/aside carry structural boilerplate
    * (link farms, chrome) — the zero-text-density blocks of the
    * jusText rule. */
  private val droppedBlocks = Seq("script", "style", "nav", "header",
    "footer", "aside")

  /** The extracted-text column: drop blocks, drop comments, strip
    * tags, decode entities, collapse whitespace. */
  def extractText(html: Column): Column = {
    val noBlocks = droppedBlocks.foldLeft(html) { (c, t) =>
      regexp_replace(c, s"(?i)<$t[^>]*>.*?</$t>", " ")
    }
    val noComments = regexp_replace(noBlocks, "<!--.*?-->", " ")
    val noTags = regexp_replace(noComments, "<[^>]+>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&apos;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, v)) => replace(c, lit(e), lit(v)) }
    trim(regexp_replace(decoded, " +", " "))
  }

  /** Per-document extraction + markup stats over an `htmlCol`:
    * (idCol, clean_text, n_clean_chars, n_tags, n_links,
    * n_entities, content_ratio_e6). The ratio is floor(x*1e6) like
    * every cross-engine ratio in this repo (decimal round tie rules
    * differ between engines). */
  def extract(docs: DataFrame, htmlCol: Column,
              idCol: String = "doc_id"): DataFrame = {
    val clean = extractText(htmlCol)
    docs.select(
      col(idCol),
      clean.as("clean_text"),
      length(clean).cast("long").as("n_clean_chars"),
      size(regexp_extract_all(htmlCol, lit("<[^>]+>"), lit(0)))
        .cast("long").as("n_tags"),
      // \b after the tag name: '<a[^>]*>' also matches <aside>,
      // <abbr>, <article>, <address>... (word-boundary is portable —
      // Java regex and RE2 both support \b, so the oracle twin uses
      // the identical pattern)
      size(regexp_extract_all(htmlCol, lit("(?i)<a\\b[^>]*>"), lit(0)))
        .cast("long").as("n_links"),
      size(regexp_extract_all(htmlCol, lit("&[a-z]+;"), lit(0)))
        .cast("long").as("n_entities"),
      floor(length(clean).cast("double") / length(htmlCol) * 1e6)
        .cast("long").as("content_ratio_e6"))
  }

  /** Planted crawl-page fixture over the `documents` table: wrap each
    * doc's text in a deterministic single-line page — head with
    * title/style/script payloads, nav boilerplate, an h1, an
    * entity-bearing intro paragraph, the body text (with the word
    * "spark" entity-quoted wherever it occurs, so entity decoding is
    * exercised INSIDE corpus text, not just in constants), and a
    * footer. Single-line by construction so no dotall flag is needed
    * in either regex engine. The same concatenation is re-stated in
    * the DuckDB oracle, which then extracts with ITS OWN regex
    * engine — the planted-media pattern of the multimodal keys. */
  def plantedPage(docs: DataFrame): DataFrame =
    docs.withColumn("html", concat(
      lit("<html><head><title>doc "), col("doc_id"), lit("</title>"),
      lit("<style>body { color: #000; font: 12px; }</style>"),
      lit("<script>var x = 1; if (x < 2) { x = \"&amp;\"; }</script>"),
      lit("</head><body>"),
      lit("<nav><ul><li><a href=\"/home\">home</a></li>" +
        "<li><a href=\"/about\">about</a></li></ul></nav>"),
      lit("<h1>"), col("source"), lit(" "), col("doc_id"), lit("</h1>"),
      lit("<p>intro &amp; summary &lt;generated&gt;</p>"),
      lit("<p>"),
      replace(col("text"), lit("spark"), lit("&quot;spark&quot;")),
      lit("</p>"),
      lit("<footer><a href=\"/tos\">terms</a> of use</footer>"),
      lit("</body></html>")))
}
