package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → text extraction — the WET-style first step of a web-corpus
  * pipeline (crawl HTML in, visible text out), the stage that feeds
  * everything in [[TextAnalysis]]/[[Dedup]]. No HTML parser library:
  * the whole chain is anchored regex rewrites over a string column —
  * whole-stage codegen, engine-portable (the DuckDB oracle runs the
  * SAME patterns; both engines' regex dialects — java.util.regex and
  * RE2 — agree on everything used here, including lazy quantifiers and
  * inline `(?is)` flags).
  *
  * Extraction contract (the classic text-extraction recipe):
  *  1. `<script>`/`<style>` blocks are dropped WITH their contents
  *     (code is not text), HTML comments likewise;
  *  2. `<title>` is captured separately before the body strip;
  *  3. block-level tags (p, div, br, li, h1-6, tr, table, ul, ol)
  *     become newlines — paragraph structure survives for the
  *     line/paragraph dedup tiers downstream;
  *  4. every remaining tag is dropped;
  *  5. the five XML entities plus `&nbsp;` decode AFTER the tag strip
  *     (decoding first would let `&lt;script&gt;` smuggle a tag in);
  *  6. whitespace normalizes: runs of spaces/tabs collapse to one,
  *     3+ newlines to a blank line, edges trimmed.
  *
  * A regex extractor is deliberately NOT a conformant HTML5 parser
  * (malformed nesting, CDATA, conditional comments are best-effort) —
  * the same trade CCNet/WET makes for scan-speed text extraction. */
object Html {

  private val BlockTags = "p|div|br|li|h[1-6]|tr|table|ul|ol"

  /** The page title (first `<title>` content, entity-decoded, trimmed);
    * null when absent. */
  def title(html: Column): Column = {
    val raw = regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1)
    when(raw === "", lit(null)).otherwise(trim(decodeEntities(raw)))
  }

  /** Visible text per the object contract — the native
    * [[graft.plans.HtmlTextExtract]] kernel (the Column chain below
    * generates a single ~8.6 kB method, past the JIT inlining ceiling;
    * the kernel is one codegen'd call over per-JVM precompiled
    * Patterns, differential-spec'd against the chain). */
  def text(html: Column): Column = graft.plans.HtmlTextExtract.of(html)

  /** The reference Column-chain formulation of [[text]] — kept as the
    * kernel's differential oracle (HtmlSpec asserts byte parity). */
  private[pipeline] def textColumnChain(html: Column): Column = {
    // the whole <head> (and any stray <title> outside one) drops WITH
    // its contents — title/meta are metadata, not visible text; the
    // title is captured separately by [[title]]
    val noHead = regexp_replace(
      regexp_replace(html, "(?is)<head[^>]*>.*?</head>", ""),
      "(?is)<title[^>]*>.*?</title>", "")
    // two passes, not a backreference — RE2 (the oracle engine) has none
    val noScript = regexp_replace(
      regexp_replace(noHead, "(?is)<script[^>]*>.*?</script>", ""),
      "(?is)<style[^>]*>.*?</style>", "")
    val noComment = regexp_replace(noScript, "(?s)<!--.*?-->", "")
    val blocks = regexp_replace(noComment,
      s"(?i)</?($BlockTags)[^>]*>", "\n")
    val noTags = regexp_replace(blocks, "(?s)<[^>]+>", "")
    val decoded = decodeEntities(noTags)
    val spaces = regexp_replace(decoded, "[ \\t]+", " ")
    val lines = regexp_replace(spaces, " ?\\n ?", "\n")
    // trim() strips SPACES only — edge newlines need the regex form
    regexp_replace(regexp_replace(lines, "\\n{3,}", "\n\n"),
      "^\\s+|\\s+$", "")
  }

  /** The five XML entities + nbsp. `&amp;` decodes LAST so it cannot
    * resurrect another entity (`&amp;lt;` → `&lt;` text, not `<`). */
  def decodeEntities(s: Column): Column = {
    val steps = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    steps.foldLeft(s) { case (c, (from, to)) =>
      regexp_replace(c, java.util.regex.Pattern.quote(from), to)
    }
  }

  /** Extract title + text for a corpus frame; adds `title` and
    * `clean_text` (+ its length) — one codegen'd projection. */
  def extract(df: DataFrame, htmlCol: String): DataFrame =
    df.withColumn("title", title(col(htmlCol)))
      .withColumn("clean_text", text(col(htmlCol)))
      .withColumn("clean_chars", length(col("clean_text")))
}
