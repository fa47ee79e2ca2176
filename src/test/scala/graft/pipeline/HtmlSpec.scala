package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the HTML→text extraction contract: script/style contents
  * dropped, comments stripped, block tags → newlines, entity decode
  * AFTER tag strip with `&amp;` last, whitespace normalization, title
  * capture. */
class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String): (String, String) = {
    val r = Html.extract(Seq(html).toDF("html"), "html")
      .select("title", "clean_text").head
    (if (r.isNullAt(0)) null else r.getString(0), r.getString(1))
  }

  test("script/style contents drop, comments strip, blocks become " +
      "paragraph breaks, tags vanish") {
    val (title, text) = extract(
      "<html><head><title> T &amp; U </title><style>p{x}</style></head>" +
        "<body><!-- no --><h1>A</h1><p>one <b>two</b></p>" +
        "<script>if (1 < 2) alert('x')</script><div>three</div></body>")
    assert(title == "T & U")
    assert(text == "A\n\none two\n\nthree") // paragraph breaks survive
  }

  test("entity decode is post-strip and &amp; decodes last: &lt;b&gt; " +
      "stays text and &amp;lt; cannot resurrect an entity") {
    val (_, text) = extract("<p>&lt;b&gt;bold&lt;/b&gt; &amp;lt; &#39;q&#39;&nbsp;end</p>")
    assert(text == "<b>bold</b> &lt; 'q' end")
  }

  test("missing title is null; whitespace collapses") {
    val (title, text) = extract("<body><p>a   b\t\tc</p><p></p><p></p><p>d</p></body>")
    assert(title == null)
    assert(text == "a b c\n\nd")
  }

  test("the native kernel is byte-identical to the Column regex chain") {
    val htmls = Seq(
      "<html><head><title>T</title><style>x{}</style></head><body>" +
        "<h1>A &amp; B</h1><p>p1</p><script>s</script><div>d</div></body>",
      "<p>&lt;x&gt; &amp;lt; &#39;&quot;&nbsp;</p>",
      "plain text, no tags at all",
      "<ul><li>one</li><li>two</li></ul><!-- c --><br>three",
      "")
    val df = htmls.toDF("html")
    val rows = df.select(Html.text(col("html")).as("k"),
        Html.textColumnChain(col("html")).as("c"))
      .collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1),
      s"kernel='${r.getString(0)}' chain='${r.getString(1)}'"))
  }
}
