package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** URL canonicalization rules one by one, plus the host report's
  * dup accounting. */
class UrlOpsSpec extends SparkTestBase {

  private def canon(url: String): String = {
    import spark.implicits._
    UrlOps.withCanonical(Seq((1L, url)).toDF("doc_id", "url"))
      .select(col("canon_url")).head().getString(0)
  }

  private def host(url: String): String = {
    import spark.implicits._
    UrlOps.withCanonical(Seq((1L, url)).toDF("doc_id", "url"))
      .select(col("host")).head().getString(0)
  }

  test("scheme and host lowercase; path case preserved") {
    assert(canon("HTTPS://ExAmPle.COM/Path/Item") ===
      "https://example.com/Path/Item")
  }

  test("www. label dropped") {
    assert(host("http://www.example.com/a") === "example.com")
    // only a LEADING www. label — a host that IS www-less keeps its
    // first label even when it starts with www-ish text
    assert(host("http://wwwx.example.com/a") === "wwwx.example.com")
  }

  test("default port stripped per scheme; non-default ports kept") {
    assert(canon("http://example.com:80/a") === "http://example.com/a")
    assert(canon("https://example.com:443/a") === "https://example.com/a")
    assert(canon("https://example.com:80/a") === "https://example.com:80/a")
    assert(canon("http://example.com:8080/a") === "http://example.com:8080/a")
  }

  test("fragment dropped") {
    assert(canon("http://example.com/a#sec2") === "http://example.com/a")
    assert(canon("http://example.com/a?id=1#sec2") ===
      "http://example.com/a?id=1")
  }

  test("tracking params removed wherever they sit; query re-seamed") {
    assert(canon("http://example.com/a?utm_source=x&id=1") ===
      "http://example.com/a?id=1")
    assert(canon("http://example.com/a?id=1&utm_campaign=y") ===
      "http://example.com/a?id=1")
    // multiple tracking params in one query — the global-strip case
    assert(canon("http://example.com/a?utm_source=x&utm_medium=y&id=1") ===
      "http://example.com/a?id=1")
    assert(canon("http://example.com/a?fbclid=z&gclid=w") ===
      "http://example.com/a")
  }

  test("trailing slashes stripped, also ahead of a query") {
    assert(canon("http://example.com/a/") === "http://example.com/a")
    assert(canon("http://example.com/a//") === "http://example.com/a")
    assert(canon("http://example.com/a/?id=1") === "http://example.com/a?id=1")
    assert(canon("http://example.com/") === "http://example.com")
  }

  test("host report counts raw vs canonical and the dup surplus") {
    import spark.implicits._
    val urls = Seq(
      (1L, "http://www.Example.com/a?utm_source=x&id=1"),
      (2L, "HTTP://example.com:80/a?id=1"), // same canon as 1
      (3L, "http://example.com/b"),
      (4L, "https://other.org/c/")).toDF("doc_id", "url")
    val rep = UrlOps.hostReport(UrlOps.withCanonical(urls)).collect()
    assert(rep.map(_.getString(0)).toSeq === Seq("example.com", "other.org"))
    val ex = rep(0)
    assert(ex.getLong(1) === 3L) // n_urls
    assert(ex.getLong(2) === 2L) // n_canon
    assert(ex.getLong(3) === 1L) // n_dup
    assert(ex.getString(4) === "http://example.com/a?id=1")
  }
}
