package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the URL canonicalization spec: case, conditional default-port
  * strip, empty-path normalization, fragment drop, tracking-param
  * filter + query sort, bare params. */
class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url")
      .select(Urls.canonicalUrl(col("url"))).as[String].collect().toSeq

  test("scheme/host lowercase, conditional port strip, empty path") {
    assert(canon(
      "HTTP://WWW.Ex.COM",           // case + empty path
      "http://ex.com:80/a",          // default port for http
      "https://ex.com:443/a",        // default port for https
      "https://ex.com:80/a",         // :80 under https is NOT default
      "http://ex.com:8080/a"         // non-default port kept
    ) == Seq(
      "http://www.ex.com/",
      "http://ex.com/a",
      "https://ex.com/a",
      "https://ex.com:80/a",
      "http://ex.com:8080/a"))
  }

  test("query sort, tracking filter, fragment drop, bare params") {
    assert(canon(
      "http://e.com/p?b=2&a=1#frag",
      "http://e.com/p?utm_source=x&a=1&gclid=g",
      "http://e.com/p?utm_only=1",       // all dropped → no '?'
      "http://e.com/p?flag&a=1",         // bare param kept and sorted
      "http://e.com/p?"                  // empty query → no '?'
    ) == Seq(
      "http://e.com/p?a=1&b=2",
      "http://e.com/p?a=1",
      "http://e.com/p",
      "http://e.com/p?a=1&flag",
      "http://e.com/p"))
  }

  test("dedupByUrl collapses aliases to the smallest id") {
    val docs = Seq(
      (1L, "http://e.com/p?b=2&a=1"),
      (2L, "HTTP://E.COM/p?a=1&b=2&utm_source=x"),
      (3L, "http://e.com:80/p?a=1&b=2#frag"),
      (4L, "http://e.com/q")).toDF("doc_id", "url")
    val out = Urls.dedupByUrl(docs, "url", "doc_id")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out == Map(
      "http://e.com/p?a=1&b=2" -> ((1L, 3L)),
      "http://e.com/q" -> ((4L, 1L))))
  }
}
