package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + URL-level dedup — the standard first pass of
  * a web-corpus training pipeline (CCNet/RefinedWeb-style): before any
  * content hashing, collapse the URL aliases that make one page look
  * like many (scheme/host case, default ports, tracking params, query
  * order, fragments). At 100 TB of crawl this is the cheapest dedup
  * tier — a pure codegen'd projection feeding one hash aggregation,
  * run BEFORE the text ever needs to be compared.
  *
  * Canonical form produced:
  *  - scheme and host lowercased;
  *  - default port stripped — `:80` for http, `:443` for https, ONLY
  *    for the matching scheme (https://h:80 keeps its odd port);
  *  - empty path becomes `/` (http://h and http://h/ are one page);
  *  - fragment dropped (never sent to the server);
  *  - query parameters: tracking params dropped (`utm_*` prefixes and
  *    the click-id keys), the rest SORTED and re-joined, an
  *    empty-after-filtering query drops its `?`.
  *
  * All of it is `regexp_extract`/array-HOF Column code — whole-stage
  * codegen, no UDF, engine-portable semantics (the oracle re-derives
  * the same spec in DuckDB's list functions). */
object Urls {

  /** Click-id query keys dropped in full (exact-match). */
  val ClickIdKeys = Seq("fbclid", "gclid", "msclkid")

  /** Canonicalize one URL column per the object contract. */
  def canonicalUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url,
      "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = lower(regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    val host = when(scheme === "http",
        regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val path0 = regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    val path = when(path0 === "", "/").otherwise(path0)
    val q = regexp_extract(url, "\\?([^#]*)", 1)
    val kept = array_sort(filter(split(q, "&"), p =>
      !(p.startsWith("utm_") ||
        split(p, "=").getItem(0).isin(ClickIdKeys.map(lit(_)): _*) ||
        p === "")))
    val qc = array_join(kept, "&")
    concat(scheme, lit("://"), host, path,
      when(qc === "", "").otherwise(concat(lit("?"), qc)))
  }

  /** URL-level dedup over a corpus: group by canonical URL, keep the
    * smallest id (deterministic winner), count the collapsed aliases.
    * One hash aggregation over the canonical projection. */
  def dedupByUrl(docs: DataFrame, urlCol: String, idCol: String)
      : DataFrame =
    docs.select(canonicalUrl(col(urlCol)).as("canonical_url"),
        col(idCol).as("_id"))
      .groupBy("canonical_url")
      .agg(min(col("_id")).as("kept_id"),
        count(lit(1)).as("n_aliases"))
}
