package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** HTML extraction ([[Html]]): block drops, comment/tag strip,
  * entity decode order, whitespace collapse, and the markup stats —
  * on hand-crafted pages that exercise the branches the planted
  * fixture (q_html_extract) doesn't: header/aside blocks, comments,
  * double-encoded entities, attribute-bearing block tags. */
class HtmlSpec extends SparkTestBase {

  private def extract(html: String): (String, Long, Long, Long, Long) = {
    import spark.implicits._
    val r = Html.extract(Seq((0L, html)).toDF("doc_id", "html"), col("html"))
      .head()
    (r.getString(1), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(2))
  }

  test("drops script/style/nav/header/footer/aside content wholesale") {
    val (txt, _, _, _, _) = extract(
      "<header class=\"top\">site chrome</header>" +
        "<nav><a href=\"/x\">x</a></nav><p>keep me</p>" +
        "<aside>related links</aside><footer>legal</footer>" +
        "<script type=\"text/javascript\">var kept = false;</script>" +
        "<style>p { display: none; }</style>")
    assert(txt == "keep me", s"got '$txt'")
  }

  test("strips comments and tags, decodes entities with &amp; last") {
    val (txt, _, _, _, _) = extract(
      "<p>a &lt;b&gt; c</p><!-- hidden comment --><p>x &amp;lt; y</p>")
    // &amp;lt; must yield the literal text "&lt;", never "<"
    assert(txt == "a <b> c x &lt; y", s"got '$txt'")
  }

  test("collapses whitespace and counts tags/links/entities") {
    val (txt, nTags, nLinks, nEntities, nChars) = extract(
      "<div>  one   two </div><a href=\"/l1\">go</a> &nbsp; <A HREF=\"/l2\">up</A>")
    assert(txt == "one two go up", s"got '$txt'")
    assert(nTags == 6, s"n_tags $nTags")     // div,/div,a,/a,A,/A
    assert(nLinks == 2, s"n_links $nLinks")  // case-insensitive
    assert(nEntities == 1, s"n_entities $nEntities")
    assert(nChars == txt.length.toLong)
  }

  test("n_links counts anchors only, not other a-prefixed tags") {
    val (_, _, nLinks, _, _) = extract(
      "<article><aside>x</aside><abbr>y</abbr><address>z</address>" +
        "<a href=\"/only\">real</a><a>bare</a></article>")
    assert(nLinks == 2, s"n_links $nLinks") // <a ...> and <a>, nothing else
  }

  test("planted page round-trips the corpus text through markup") {
    import spark.implicits._
    val docs = Seq((7L, "alpha spark beta", "src3")).toDF("doc_id", "text", "source")
    val out = Html.extract(Html.plantedPage(docs), col("html")).head()
    assert(out.getString(1) ==
      "doc 7 src3 7 intro & summary <generated> alpha \"spark\" beta",
      s"got '${out.getString(1)}'")
    assert(out.getLong(4) == 3) // 2 nav links + 1 footer link
  }
}
