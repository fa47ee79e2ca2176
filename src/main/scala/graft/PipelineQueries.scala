package graft

import graft.cdc.ChangeFeed
import graft.pipeline.{Bpe, Classifier, Curation, Dedup, Incremental, Multimodal, Retrieval, Similarity, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Queries.Q

/** Training-data-pipeline queries (dedup / similarity / text / multimodal)
  * with DuckDB oracles. All hashing is md5-hex based so both engines
  * reproduce signatures bit-for-bit; float-valued similarity scores are
  * never output — only pair membership, with thresholds verified to sit
  * ≥1e-5 away from any actual pair score (summation-order noise is ~1e-15).
  */
object PipelineQueries {

  private def docs(s: SparkSession, d: String): DataFrame =
    ChangeFeed.table(s, d, "documents")
  private def emb(s: SparkSession, d: String): DataFrame =
    ChangeFeed.table(s, d, "embeddings")

  /** Conditional pre-battery spread — same rationale as
    * [[Queries.spread]] (r16 optimization, guide §2): per-row regex /
    * codec batteries that sit BELOW a query's first exchange otherwise
    * run at scan parallelism, one task for a one-split table. No-op when
    * the scan already has ≥ session-parallelism splits (corpus scale). */
  private def spread(df: DataFrame, by: String): DataFrame =
    graft.pipeline.Spread(df, col(by))

  /** Synthetic (doc_id, url) frame for the URL-canonicalization pair —
    * the mod mix crosses schemes × ports × paths × queries × fragments
    * so every canonical rule has live positive AND negative rows. The
    * oracle twin is [[urlCte]]. */
  private def urlFrame(df: DataFrame): DataFrame = {
    val m = col("doc_id")
    val url = concat(
      when(m % 3 === 0, "HTTP").when(m % 3 === 1, "https")
        .otherwise("http"),
      lit("://"),
      when(m % 4 === 0, "WWW.Example.COM")
        .when(m % 4 === 1, "www.example.com:80")
        .when(m % 4 === 2, "www.example.com:443")
        .otherwise("cdn.example.com"),
      element_at(array(lit(""), lit("/"), lit("/a/b"), lit("/a/b/"),
        lit("/x")), (pmod(m, lit(5)) + 1).cast("int")),
      when(m % 6 === 0, "").when(m % 6 === 1, "?b=2&a=1")
        .when(m % 6 === 2, "?a=1&b=2&utm_source=x")
        .when(m % 6 === 3, "?utm_campaign=c")
        .when(m % 6 === 4, "?fbclid=z&a=1")
        .otherwise("?a=1"),
      when(m % 7 === 0, "#sec").otherwise(""))
    df.select(col("doc_id"), url.as("url"))
  }

  /** DuckDB twin of [[urlFrame]] + [[graft.pipeline.Urls.canonicalUrl]]:
    * constructs the same urls, re-derives the canonical spec with list
    * functions — expects a `documents` table in scope, exposes `c2`
    * with (doc_id, url, scheme, host, path, qc). */
  private val urlCte =
    """WITH u AS (
      |  SELECT doc_id,
      |    CASE doc_id%3 WHEN 0 THEN 'HTTP' WHEN 1 THEN 'https'
      |         ELSE 'http' END || '://' ||
      |    CASE doc_id%4 WHEN 0 THEN 'WWW.Example.COM'
      |         WHEN 1 THEN 'www.example.com:80'
      |         WHEN 2 THEN 'www.example.com:443'
      |         ELSE 'cdn.example.com' END ||
      |    list_extract(['', '/', '/a/b', '/a/b/', '/x'],
      |                 CAST(doc_id%5 + 1 AS INT)) ||
      |    CASE doc_id%6 WHEN 0 THEN '' WHEN 1 THEN '?b=2&a=1'
      |         WHEN 2 THEN '?a=1&b=2&utm_source=x'
      |         WHEN 3 THEN '?utm_campaign=c'
      |         WHEN 4 THEN '?fbclid=z&a=1' ELSE '?a=1' END ||
      |    CASE WHEN doc_id%7 = 0 THEN '#sec' ELSE '' END AS url
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, url,
      |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
      |      AS scheme,
      |    lower(regexp_extract(url,
      |      '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)) AS hostport,
      |    regexp_extract(url,
      |      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1) AS path0,
      |    regexp_extract(url, '\?([^#]*)', 1) AS q
      |  FROM u),
      |c2 AS (
      |  SELECT doc_id, url, scheme,
      |    CASE WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$', '')
      |         WHEN scheme = 'https'
      |           THEN regexp_replace(hostport, ':443$', '')
      |         ELSE hostport END AS host,
      |    CASE WHEN path0 = '' THEN '/' ELSE path0 END AS path,
      |    coalesce(array_to_string(list_sort(list_filter(
      |      string_split(q, '&'),
      |      x -> NOT (starts_with(x, 'utm_')
      |                OR string_split(x, '=')[1]
      |                   IN ('fbclid', 'gclid', 'msclkid')
      |                OR x = ''))), '&'), '') AS qc
      |  FROM c)""".stripMargin

  /** Shared oracle CTE: the √n-scaled deterministic centroid pick —
    * the DuckDB twin of [[Similarity.sqrtCentroids]] + `centroids`:
    * the k rows with the smallest `(md5(id), id)` (round 15 — the
    * content-independent spread pick; identical lowercase-hex md5 of
    * the decimal id string in both engines, rank-based so it never
    * assumes dense ids; expects an `e` CTE with (vec_id, v) in
    * scope). */
  private val sqrtCentroidsSql =
    """c AS (SELECT vec_id AS centroid_id, v AS centv FROM (
      |    SELECT vec_id, v, row_number() OVER (
      |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS crn FROM e)
      |  WHERE crn <= (SELECT greatest(4, CAST(ceil(sqrt(count(*))) AS BIGINT))
      |                FROM e))""".stripMargin

  /** DuckDB oracle for [[Bpe]].train + tokenize, GENERATED by unrolling
    * the `nMerges` training steps as CTE chains (the loop is bounded and
    * small, so per-step CTEs beat a recursive CTE that cannot aggregate
    * over its own frontier). Encoding trick that makes the sequential
    * `mergePass` SQL-expressible: a symbol sequence is a string with
    * every symbol wrapped as `chr(31) sym chr(30)`, so one SQL
    * `replace()` of the wrapped pair IS the exhaustive left-to-right
    * non-overlapping merge pass — adjacent matches share no characters,
    * and replace() continues after the replacement, exactly the BPE
    * apply step. Tie-break (count DESC, a ASC, b ASC) and the top-types
    * cap mirror the Scala trainer; all values are ints/strings, so the
    * hash match is exact by construction. Delimiters chr(31)/chr(30) are
    * guaranteed absent from the corpus (pure printable ASCII — verified
    * max codepoint 121); an exhausted pair table (fewer real merges than
    * `nMerges`) degrades to chr(1) no-op patterns, which tokenize
    * identically to the Scala trainer's early stop. */
  private def bpeOracleSql(nMerges: Int): String = {
    val SEP = "chr(30)||chr(31)"
    def wrap(col: String) =
      s"chr(31) || array_to_string(string_split($col, ''), $SEP) || chr(30)"
    def syms(col: String) =
      s"string_split(substr($col, 2, length($col)-2), $SEP)"
    def mergeStep(prev: String, k: Int, out: String) = {
      val a = s"coalesce((SELECT a FROM b$k), chr(1))"
      val b = s"coalesce((SELECT b FROM b$k), chr(1))"
      s"""$out AS MATERIALIZED (SELECT replace(s,
         |    chr(31)||$a||chr(30)||chr(31)||$b||chr(30),
         |    chr(31)||$a||$b||chr(30)) AS s${if (out.startsWith("w")) ", freq" else ", w"}
         |  FROM $prev)""".stripMargin
    }
    val trainSteps = (1 to nMerges).map { k =>
      s"""p$k AS MATERIALIZED (SELECT a, b, sum(freq) AS c FROM (
         |    SELECT unnest([struct_pack(a := sy[i], b := sy[i+1])
         |                   for i in generate_series(1, len(sy)-1)], recursive := true), freq
         |    FROM (SELECT ${syms("s")} AS sy, freq FROM w${k - 1}))
         |  GROUP BY 1, 2),
         |b$k AS MATERIALIZED (SELECT a, b FROM p$k ORDER BY c DESC, a ASC, b ASC LIMIT 1),
         |${mergeStep(s"w${k - 1}", k, s"w$k")}""".stripMargin
    }.mkString(",\n")
    val tokSteps = (1 to nMerges).map { k =>
      mergeStep(s"tok${k - 1}", k, s"tok$k")
    }.mkString(",\n")
    s"""WITH t AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
       |    SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w FROM documents)
       |  WHERE w != '' GROUP BY 1),
       |ty AS (SELECT w, freq FROM (SELECT w, freq,
       |    row_number() OVER (ORDER BY freq DESC, w ASC) AS rn FROM t)
       |  WHERE rn <= 100000),
       |w0 AS MATERIALIZED (SELECT ${wrap("w")} AS s, freq FROM ty),
       |$trainSteps,
       |tok0 AS MATERIALIZED (SELECT ${wrap("w")} AS s, w FROM (SELECT DISTINCT w FROM t)),
       |$tokSteps,
       |tp AS (SELECT w, ${syms("s")} AS pieces FROM tok$nMerges),
       |dw AS (SELECT doc_id, unnest(iw, recursive := true) FROM (
       |    SELECT doc_id, [struct_pack(i := i, w := ws[i])
       |                    for i in generate_series(1, len(ws))] AS iw
       |    FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
       |          FROM documents))),
       |agg AS (SELECT dw.doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |    CAST(sum(len(tp.pieces)) AS BIGINT) AS n_pieces,
       |    array_to_string(flatten(list(tp.pieces ORDER BY dw.i))[1:8], ' ')
       |      AS pieces_sample
       |  FROM dw JOIN tp ON dw.w = tp.w WHERE dw.w != '' GROUP BY 1)
       |SELECT d.doc_id, coalesce(a.n_words, 0) AS n_words,
       |  coalesce(a.n_pieces, 0) AS n_pieces,
       |  coalesce(a.pieces_sample, '') AS pieces_sample
       |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin
  }

  /** Shared oracle CTEs: words → distinct 3-gram shingles. */
  private val shinglesCte =
    """WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
      |           FROM documents),
      |sh AS (SELECT doc_id, list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
      |        for i in generate_series(1, len(ws)-2)]) AS sh FROM w)""".stripMargin

  private val dedupQueries: Seq[Q] = Seq(
    Q("dedup_exact",
      (s, d) => Dedup.exactSurvivors(docs(s, d), "text", "doc_id"),
      Some("""SELECT md5(text) AS digest, min(doc_id) AS doc_id,
        |       count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin)),
    Q("dedup_exact_pairs",
      (s, d) => Dedup.exactPairs(docs(s, d), "text", "doc_id"),
      Some("""WITH dg AS (SELECT doc_id, md5(text) AS digest FROM documents),
        |kept AS (SELECT digest, min(doc_id) AS id_kept FROM dg GROUP BY 1)
        |SELECT id_kept, doc_id AS id_dropped FROM dg JOIN kept USING (digest)
        |WHERE doc_id != id_kept""".stripMargin)),
    // HTML -> text extraction (WET-style): the html is constructed
    // identically on both sides; Spark extracts with Html.extract, the
    // oracle replays the SAME regex chain (RE2-compatible — no
    // backreferences; DuckDB needs the explicit 'g' flag where Spark
    // replaces globally by default).
    Q("text_html_extract",
      (s, d) => {
        val frag = substring(col("text"), 1, 50)
        val html = concat(
          lit("<html><head><title>Doc &amp; "),
          col("doc_id").cast("string"),
          lit("</title><style a=b>p {}</style></head><body>"),
          lit("<!-- hidden --><h1>Head</h1><p>"), frag,
          lit(" &lt;tag&gt; &amp;lt;</p><script>var x = 1 < 2;</script>"),
          lit("<div>"), col("source"), lit("&nbsp;tail</div></body></html>"))
        graft.pipeline.Html.extract(
            docs(s, d).select(col("doc_id"), html.as("html")), "html")
          .select("doc_id", "title", "clean_text", "clean_chars")
      },
      Some("""WITH h AS (
        |  SELECT doc_id,
        |    '<html><head><title>Doc &amp; ' || CAST(doc_id AS VARCHAR) ||
        |    '</title><style a=b>p {}</style></head><body>' ||
        |    '<!-- hidden --><h1>Head</h1><p>' || substring(text, 1, 50) ||
        |    ' &lt;tag&gt; &amp;lt;</p><script>var x = 1 < 2;</script>' ||
        |    '<div>' || source || '&nbsp;tail</div></body></html>' AS html
        |  FROM documents),
        |t0 AS (
        |  SELECT doc_id, html,
        |    regexp_replace(regexp_replace(html,
        |      '(?is)<head[^>]*>.*?</head>', '', 'g'),
        |      '(?is)<title[^>]*>.*?</title>', '', 'g') AS a
        |  FROM h),
        |t1 AS (
        |  SELECT doc_id, html,
        |    regexp_replace(regexp_replace(a,
        |      '(?is)<script[^>]*>.*?</script>', '', 'g'),
        |      '(?is)<style[^>]*>.*?</style>', '', 'g') AS a
        |  FROM t0),
        |t2 AS (SELECT doc_id, html,
        |    regexp_replace(a, '(?s)<!--.*?-->', '', 'g') AS a FROM t1),
        |t3 AS (SELECT doc_id, html, regexp_replace(a,
        |    '(?i)</?(p|div|br|li|h[1-6]|tr|table|ul|ol)[^>]*>',
        |    e'\n', 'g') AS a FROM t2),
        |t4 AS (SELECT doc_id, html,
        |    regexp_replace(a, '(?s)<[^>]+>', '', 'g') AS a FROM t3),
        |t5 AS (SELECT doc_id, html,
        |    replace(replace(replace(replace(replace(replace(a,
        |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |      '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&') AS a
        |  FROM t4),
        |t6 AS (SELECT doc_id, html,
        |    regexp_replace(regexp_replace(regexp_replace(a,
        |      e'[ \t]+', ' ', 'g'), e' ?\n ?', e'\n', 'g'),
        |      e'\n{3,}', e'\n\n', 'g') AS a
        |  FROM t5),
        |ti AS (SELECT doc_id, html,
        |    regexp_extract(html, '(?is)<title[^>]*>(.*?)</title>', 1)
        |      AS traw FROM h)
        |SELECT t6.doc_id,
        |  CASE WHEN ti.traw = '' THEN NULL
        |       ELSE trim(replace(replace(replace(replace(replace(replace(
        |         ti.traw, '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |         '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&'))
        |  END AS title,
        |  regexp_replace(t6.a, '^\s+|\s+$', '', 'g') AS clean_text,
        |  CAST(length(regexp_replace(t6.a, '^\s+|\s+$', '', 'g')) AS INT)
        |    AS clean_chars
        |FROM t6 JOIN ti ON ti.doc_id = t6.doc_id""".stripMargin)),
    // URL canonicalization (CCNet/RefinedWeb-style alias collapse): the
    // URLs are constructed identically on both sides; the Spark side
    // canonicalizes with Urls.canonicalUrl, the oracle re-derives the
    // same spec in DuckDB list functions. The :80/:443 strip is
    // scheme-CONDITIONAL (https://h:80 keeps its odd port) — the mod
    // mix crosses schemes and ports to pin that.
    Q("text_url_canonical",
      (s, d) => urlFrame(docs(s, d))
        .withColumn("canonical_url",
          graft.pipeline.Urls.canonicalUrl(col("url"))),
      Some(s"""$urlCte
        |SELECT doc_id, url, scheme || '://' || host || path ||
        |  CASE WHEN qc = '' THEN '' ELSE '?' || qc END AS canonical_url
        |FROM c2""".stripMargin)),
    Q("dedup_url",
      (s, d) => graft.pipeline.Urls.dedupByUrl(
        urlFrame(docs(s, d)), "url", "doc_id"),
      Some(s"""$urlCte
        |SELECT scheme || '://' || host || path ||
        |  CASE WHEN qc = '' THEN '' ELSE '?' || qc END AS canonical_url,
        |  min(doc_id) AS kept_id, count(*) AS n_aliases
        |FROM c2 GROUP BY 1""".stripMargin)),
    // Cross-batch incremental dedup: Bloom prefilter (distributed
    // build, broadcast literal-array test, zero UDFs) routes
    // definite-new docs around the confirm anti-join — result is exact,
    // so the oracle is the plain NOT IN. History = doc_id%3==0 "prior
    // crawl"; batch = the rest.
    Q("dedup_incremental",
      (s, d) => {
        val dd = docs(s, d)
        Incremental.newDocs(
          dd.where(pmod(col("doc_id"), lit(3)) =!= 0),
          dd.where(pmod(col("doc_id"), lit(3)) === 0),
          "text", "doc_id", mBits = 1 << 17, k = 5)
      },
      Some("""WITH h AS (SELECT md5(coalesce(text, '')) AS digest
        |            FROM documents WHERE doc_id % 3 = 0)
        |SELECT doc_id, md5(coalesce(text, '')) AS digest
        |FROM documents
        |WHERE doc_id % 3 != 0
        |  AND md5(coalesce(text, '')) NOT IN (SELECT digest FROM h)""".stripMargin)),
    Q("dedup_ngram_jaccard",
      (s, d) => Dedup.ngramJaccardPairs(docs(s, d), "text", "doc_id",
        shingleN = 3, threshold = 0.3, lenBucket = 50),
      Some("""WITH w AS (SELECT doc_id, length(text) AS n,
        |             regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
        |sh AS (SELECT doc_id, n // 50 AS blk,
        |       list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
        |        for i in generate_series(1, len(ws)-2)]) AS sh FROM w)
        |SELECT x.doc_id AS id_a, y.doc_id AS id_b,
        |       round(len(list_intersect(x.sh, y.sh))::DOUBLE /
        |             len(list_distinct(list_concat(x.sh, y.sh))), 6) AS jaccard
        |FROM sh x JOIN sh y ON x.blk = y.blk AND x.doc_id < y.doc_id
        |WHERE round(len(list_intersect(x.sh, y.sh))::DOUBLE /
        |            len(list_distinct(list_concat(x.sh, y.sh))), 6) >= 0.3""".stripMargin)),
    Q("dedup_minhash_lsh",
      (s, d) => Dedup.minhashNearDups(docs(s, d), "text", "doc_id",
        shingleN = 3, k = 12, bands = 4, threshold = 0.5),
      Some(s"""$shinglesCte,
        |sig AS (SELECT doc_id, sh,
        |        [list_min([md5(k::VARCHAR || ':' || s) for s in sh])
        |         for k in generate_series(0,11)] AS sig FROM sh),
        |banded AS (SELECT doc_id, j,
        |           md5(array_to_string(sig[(j*3+1):(j*3+3)], ',')) AS key
        |           FROM sig, generate_series(0,3) t(j)),
        |cands AS (SELECT DISTINCT x.doc_id a, y.doc_id b FROM banded x
        |          JOIN banded y ON x.j = y.j AND x.key = y.key
        |                        AND x.doc_id < y.doc_id)
        |SELECT a AS id_a, b AS id_b,
        |       round(len(list_intersect(sa.sh, sb.sh))::DOUBLE /
        |             len(list_distinct(list_concat(sa.sh, sb.sh))), 6) AS jaccard
        |FROM cands JOIN sig sa ON cands.a = sa.doc_id
        |           JOIN sig sb ON cands.b = sb.doc_id
        |WHERE round(len(list_intersect(sa.sh, sb.sh))::DOUBLE /
        |            len(list_distinct(list_concat(sa.sh, sb.sh))), 6) >= 0.5""".stripMargin)),
    // Near-dup clustering: connected components over the ngram-jaccard
    // pair list (label propagation in Spark; recursive-CTE transitive
    // closure in DuckDB — feasible because test clusters are tiny, while
    // the Spark side stays linear in edges per round).
    Q("dedup_clusters",
      (s, d) => {
        val dd = docs(s, d)
        val pairs = Dedup.ngramJaccardPairs(dd, "text", "doc_id",
          shingleN = 3, threshold = 0.3, lenBucket = 50)
        Dedup.nearDupClusters(dd, "doc_id", pairs)
      },
      Some("""WITH RECURSIVE w AS (SELECT doc_id, length(text) AS n,
        |             regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
        |sh AS (SELECT doc_id, n // 50 AS blk,
        |       list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
        |        for i in generate_series(1, len(ws)-2)]) AS sh FROM w),
        |p AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b
        |      FROM sh x JOIN sh y ON x.blk = y.blk AND x.doc_id < y.doc_id
        |      WHERE round(len(list_intersect(x.sh, y.sh))::DOUBLE /
        |                  len(list_distinct(list_concat(x.sh, y.sh))), 6) >= 0.3),
        |e AS (SELECT id_a AS a, id_b AS b FROM p
        |      UNION SELECT id_b, id_a FROM p),
        |reach AS (SELECT a, b FROM e
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a),
        |lab AS (SELECT d.doc_id,
        |        least(d.doc_id, COALESCE(min(r.b), d.doc_id)) AS cluster_id
        |        FROM documents d LEFT JOIN reach r ON d.doc_id = r.a
        |        GROUP BY d.doc_id)
        |SELECT doc_id, cluster_id,
        |  count(*) OVER (PARTITION BY cluster_id) AS n_cluster,
        |  doc_id = cluster_id AS is_survivor
        |FROM lab""".stripMargin)),
    Q("dedup_simhash",
      (s, d) => Dedup.simhashDF(docs(s, d), "text", "doc_id")
        .withColumnRenamed("id", "doc_id"),
      Some("""WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
        |           FROM documents),
        |wh AS (SELECT doc_id,
        |       CAST(list_sum([(strpos('0123456789abcdef', md5(wrd)[j+1:j+1]) - 1)::BIGINT
        |                      << (4*(14-j)) for j in generate_series(0,14)]) AS BIGINT) AS h
        |       FROM (SELECT doc_id, unnest(ws) AS wrd FROM w)),
        |bits AS (SELECT doc_id, b, sum((h >> b) & 1) AS cnt
        |         FROM wh, generate_series(0,59) t(b) GROUP BY doc_id, b),
        |nw AS (SELECT doc_id, len(ws) AS n FROM w)
        |SELECT bits.doc_id,
        |       CAST(sum(CASE WHEN cnt*2 > n THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT)
        |         AS simhash
        |FROM bits JOIN nw ON bits.doc_id = nw.doc_id
        |GROUP BY bits.doc_id""".stripMargin)),
    Q("dedup_simhash_pairs",
      (s, d) => Dedup.simhashNearDups(docs(s, d), "text", "doc_id",
        maxHamming = 12, prefixBits = 8),
      Some("""WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
        |           FROM documents),
        |wh AS (SELECT doc_id,
        |       CAST(list_sum([(strpos('0123456789abcdef', md5(wrd)[j+1:j+1]) - 1)::BIGINT
        |                      << (4*(14-j)) for j in generate_series(0,14)]) AS BIGINT) AS h
        |       FROM (SELECT doc_id, unnest(ws) AS wrd FROM w)),
        |bits AS (SELECT doc_id, b, sum((h >> b) & 1) AS cnt
        |         FROM wh, generate_series(0,59) t(b) GROUP BY doc_id, b),
        |nw AS (SELECT doc_id, len(ws) AS n FROM w),
        |sg AS (SELECT bits.doc_id,
        |       CAST(sum(CASE WHEN cnt*2 > n THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS sh
        |       FROM bits JOIN nw ON bits.doc_id = nw.doc_id GROUP BY bits.doc_id)
        |SELECT x.doc_id AS id_a, y.doc_id AS id_b,
        |       bit_count(xor(x.sh, y.sh)) AS hamming
        |FROM sg x JOIN sg y
        |ON (x.sh >> 52) = (y.sh >> 52) AND x.doc_id < y.doc_id
        |WHERE bit_count(xor(x.sh, y.sh)) <= 12""".stripMargin)),
    Q("dedup_embedding",
      (s, d) => Dedup.embeddingNearDups(emb(s, d), "embedding", "vec_id", 0.4, dim = 64),
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        |SELECT x.vec_id AS id_a, y.vec_id AS id_b
        |FROM e x JOIN e y ON x.vec_id < y.vec_id
        |WHERE list_dot_product(x.v, y.v) /
        |      sqrt(list_dot_product(x.v, x.v)) /
        |      sqrt(list_dot_product(y.v, y.v)) >= 0.4""".stripMargin)),
    // SemDeDup-style semantic dedup: deterministic centroids → bucket
    // assignment → within-bucket pair scan (k × (n/k)² instead of n²).
    // Same 0.4 threshold/margin regime as dedup_embedding.
    Q("dedup_semantic",
      (s, d) => Dedup.semanticNearDups(emb(s, d), "embedding", "vec_id",
        threshold = 0.4, nCentroids = Similarity.sqrtCentroids(emb(s, d)),
        dim = 64),
      Some(s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |$sqrtCentroidsSql,
        |asg AS (SELECT vec_id, v, centroid_id AS bucket FROM (
        |  SELECT e.vec_id, e.v, c.centroid_id,
        |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |           list_dot_product(e.v, c.centv)/sqrt(list_dot_product(e.v, e.v))
        |             /sqrt(list_dot_product(c.centv, c.centv)) DESC,
        |           c.centroid_id ASC) AS rn
        |  FROM e, c) WHERE rn = 1)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |       CAST(a.bucket AS BIGINT) AS bucket
        |FROM asg a JOIN asg b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        |WHERE list_dot_product(a.v, b.v) /
        |      sqrt(list_dot_product(a.v, a.v)) /
        |      sqrt(list_dot_product(b.v, b.v)) >= 0.4""".stripMargin)),
    // Line-level (C4-style) dedup. The corpus is single-line word salad,
    // so multi-line docs are synthesized deterministically in BOTH
    // engines: 8-word lines plus one shared boilerplate header on every
    // doc — the header's corpus-wide document frequency exceeds maxDocs=2
    // and must vanish from every clean_text, while per-doc lines survive.
    Q("dedup_lines",
      (s, d) => {
        val ws = split(trim(col("text")), "\\s+")
        val nLines = ceil(size(ws) / lit(8.0)).cast("int")
        val lined = concat(lit("the corpus shared header line\n"),
          array_join(
            transform(sequence(lit(0), nLines - 1),
              i => array_join(slice(ws, i * 8 + 1, lit(8)), " ")),
            "\n"))
        Dedup.dedupLines(
          docs(s, d).select(col("doc_id"), lined.as("text")),
          "text", "doc_id", maxDocs = 2)
      },
      Some("""WITH w AS (SELECT doc_id,
        |        regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
        |l AS (SELECT doc_id, 'the corpus shared header line' || chr(10) ||
        |        array_to_string([array_to_string(ws[i*8+1 : i*8+8], ' ')
        |          for i in generate_series(0, CAST(ceil(len(ws)/8.0) AS INT) - 1)],
        |          chr(10)) AS text FROM w),
        |e AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line,
        |        generate_subscripts(string_split(text, chr(10)), 1) AS pos FROM l),
        |f AS (SELECT line, count(DISTINCT doc_id) AS df FROM e GROUP BY 1)
        |SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CASE WHEN f.df > 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
        |  COALESCE(string_agg(CASE WHEN f.df <= 2 THEN e.line END, chr(10)
        |    ORDER BY e.pos), '') AS clean_text
        |FROM e JOIN f USING (line) GROUP BY e.doc_id""".stripMargin))
  )

  private val annQueries: Seq[Q] = Seq(
    Q("sim_ann_bruteforce",
      (s, d) => {
        val e = emb(s, d)
        Similarity.bruteForceTopK(e.where(col("vec_id") < 10), e,
            "embedding", "vec_id", k = 5, dim = 64)
          .select("query_id", "neighbor_id")
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |      list_dot_product(q.v, c.v)/sqrt(list_dot_product(q.v, q.v))
        |        /sqrt(list_dot_product(c.v, c.v)) AS cos
        |      FROM e q JOIN e c ON q.vec_id < 10 AND c.vec_id != q.vec_id)
        |SELECT query_id, neighbor_id FROM (
        |  SELECT query_id, neighbor_id,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY cos DESC, neighbor_id ASC) AS rn
        |  FROM s) WHERE rn <= 5""".stripMargin)),
    Q("sim_ann_ivf",
      (s, d) => {
        val e = emb(s, d)
        Similarity.ivfTopK(e.where(col("vec_id") < 10), e,
            "embedding", "vec_id", k = 5,
            nCentroids = Similarity.sqrtCentroids(e), probe = 1, dim = 64)
          .select("query_id", "neighbor_id")
      },
      Some(s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |$sqrtCentroidsSql,
        |asg AS (SELECT vec_id, v, centroid_id AS bucket FROM (
        |  SELECT e.vec_id, e.v, c.centroid_id,
        |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |           list_dot_product(e.v, c.centv)/sqrt(list_dot_product(e.v, e.v))
        |             /sqrt(list_dot_product(c.centv, c.centv)) DESC,
        |           c.centroid_id ASC) AS rn
        |  FROM e, c) WHERE rn = 1),
        |qb AS (SELECT query_id, qv, bucket FROM (
        |  SELECT e.vec_id AS query_id, e.v AS qv, c.centroid_id AS bucket,
        |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |           list_dot_product(e.v, c.centv)/sqrt(list_dot_product(e.v, e.v))
        |             /sqrt(list_dot_product(c.centv, c.centv)) DESC,
        |           c.centroid_id ASC) AS rn
        |  FROM e, c WHERE e.vec_id < 10) WHERE rn <= 1),
        |scored AS (SELECT qb.query_id, asg.vec_id AS neighbor_id,
        |           list_dot_product(qb.qv, asg.v)/sqrt(list_dot_product(qb.qv, qb.qv))
        |             /sqrt(list_dot_product(asg.v, asg.v)) AS cos
        |           FROM asg JOIN qb USING (bucket)
        |           WHERE qb.query_id != asg.vec_id)
        |SELECT query_id, neighbor_id FROM (
        |  SELECT query_id, neighbor_id,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY cos DESC, neighbor_id ASC) AS rn
        |  FROM scored) WHERE rn <= 5""".stripMargin)),
    Q("sim_ann_pq",
      (s, d) => {
        val e = emb(s, d)
        Similarity.pqTopK(e.where(col("vec_id") < 10), e,
          "embedding", "vec_id", k = 5, m = 4, codebookSize = 16, dim = 64)
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |cb AS (SELECT g.m, s.k, s.v[g.m*16+1 : g.m*16+16] AS cv
        |       FROM (SELECT * FROM (
        |         SELECT v, row_number() OVER (
        |           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS k
        |         FROM e) WHERE k < 16) s, generate_series(0, 3) g(m)),
        |enc AS (SELECT vec_id, m, k FROM (
        |  SELECT e.vec_id, cb.m, cb.k,
        |         row_number() OVER (PARTITION BY e.vec_id, cb.m ORDER BY
        |           list_dot_product(
        |             [e.v[cb.m*16+i] - cb.cv[i] for i in generate_series(1,16)],
        |             [e.v[cb.m*16+i] - cb.cv[i] for i in generate_series(1,16)])
        |             ASC, cb.k ASC) AS rn
        |  FROM e, cb) WHERE rn = 1),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
        |contrib AS (SELECT q.query_id, enc.vec_id AS neighbor_id, enc.m,
        |        list_dot_product(
        |          [q.qv[enc.m*16+i] - cb.cv[i] for i in generate_series(1,16)],
        |          [q.qv[enc.m*16+i] - cb.cv[i] for i in generate_series(1,16)]) AS d
        |        FROM q, enc JOIN cb ON cb.m = enc.m AND cb.k = enc.k
        |        WHERE enc.vec_id != q.query_id),
        |adc AS (SELECT query_id, neighbor_id,
        |        ds[1] + ds[2] + ds[3] + ds[4] AS adist
        |        FROM (SELECT query_id, neighbor_id, list(d ORDER BY m) AS ds
        |              FROM contrib GROUP BY 1, 2))
        |SELECT query_id, neighbor_id, CAST(rn AS INT) AS rn FROM (
        |  SELECT query_id, neighbor_id,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY adist ASC, neighbor_id ASC) AS rn
        |  FROM adc) WHERE rn <= 5""".stripMargin)),
    Q("sim_quantize_int8",
      (s, d) => Similarity.quantizeInt8(emb(s, d), "embedding", "vec_id"),
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |s AS (SELECT vec_id, v,
        |      list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale FROM e),
        |q AS (SELECT vec_id, v, scale,
        |      CASE WHEN scale = 0 THEN list_transform(v, x -> 0)
        |           ELSE list_transform(v, x -> CAST(round(x / scale) AS INT))
        |      END AS qv FROM s)
        |SELECT vec_id, round(scale, 6) AS scale_r,
        |  array_to_string(qv, ',') AS q_csv,
        |  CASE WHEN scale = 0 THEN 0.0
        |       ELSE round(list_max([abs(v[i] - qv[i] * scale)
        |                   for i in generate_series(1, len(v))]), 6)
        |  END AS max_abs_err
        |FROM q""".stripMargin)),
    // Johnson–Lindenstrauss sign projection 64→16: exact BIGINT sums of
    // 1e-6-integerized components with ±1 signs both engines derive
    // from md5 parity — bit-identical across engines by construction.
    Q("sim_random_projection",
      (s, d) => Similarity.randomProject(emb(s, d), "embedding", "vec_id",
        dIn = 64, dOut = 16),
      Some {
        val comps = Similarity.randomProjectSql("vi", 64, 16)
        s"""WITH e AS (SELECT vec_id,
           |  list_transform(embedding::DOUBLE[],
           |    x -> CAST(round(x * 1e6) AS BIGINT)) AS vi
           |  FROM embeddings)
           |SELECT vec_id, array_to_string($comps, ',') AS p_csv
           |FROM e""".stripMargin
      }),
    // IVF with a TRAINED centroid set — one exact Lloyd step
    // (trainCentroidsExact: fixed-point integer member sums, so the
    // update is order-free and the whole pipeline — init pick, sample
    // assignment, quantized mean, probe sets, final top-k — replays
    // bit-for-bit in DuckDB; round-13, closing the rows-only gap).
    // Convergence past iteration 1 stays spec-asserted on clustered
    // data (SimilaritySpec): further iterations change VALUES, not the
    // associativity story, so one pinned step covers the oracle's job.
    Q("sim_ann_ivf_trained",
      (s, d) => {
        val e = emb(s, d)
        val cents = Similarity.trainCentroidsExact(e, "embedding",
          "vec_id", k = Similarity.sqrtCentroids(e), dim = 64, iters = 1)
        val bucketed = Similarity.assignBuckets(
          Similarity.normalized(e, "embedding", "v")
            .select(col("vec_id"), col("v")),
          cents, "vec_id", dim = 64)
        Similarity.ivfTopKFromIndex(bucketed, cents,
            e.where(col("vec_id") < 10), "embedding", "vec_id",
            k = 5, probe = 2, dim = 64)
          .select("query_id", "neighbor_id")
      },
      Some(s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |$sqrtCentroidsSql,
        |asg0 AS (SELECT vec_id, v, centroid_id AS bucket FROM (
        |  SELECT e.vec_id, e.v, c.centroid_id,
        |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |           list_dot_product(e.v, c.centv)/sqrt(list_dot_product(e.v, e.v))
        |             /sqrt(list_dot_product(c.centv, c.centv)) DESC,
        |           c.centroid_id ASC) AS rn
        |  FROM e, c) WHERE rn = 1),
        |q0 AS (SELECT bucket,
        |       unnest([{d: i, q: CAST(round(v[i] * 1000000.0) AS BIGINT)}
        |               for i in generate_series(1, 64)],
        |              recursive := true)
        |       FROM asg0),
        |s0 AS (SELECT bucket, d, sum(q) AS sq, count(*) AS n
        |       FROM q0 GROUP BY 1, 2),
        |t AS (SELECT bucket AS centroid_id,
        |        list(sq::DOUBLE / (n::DOUBLE * 1000000.0) ORDER BY d) AS centv
        |      FROM s0 GROUP BY bucket),
        |asg AS (SELECT vec_id, v, centroid_id AS bucket FROM (
        |  SELECT e.vec_id, e.v, t.centroid_id,
        |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |           list_dot_product(e.v, t.centv)/sqrt(list_dot_product(e.v, e.v))
        |             /sqrt(list_dot_product(t.centv, t.centv)) DESC,
        |           t.centroid_id ASC) AS rn
        |  FROM e, t) WHERE rn = 1),
        |qb AS (SELECT query_id, qv, bucket FROM (
        |  SELECT e.vec_id AS query_id, e.v AS qv, t.centroid_id AS bucket,
        |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |           list_dot_product(e.v, t.centv)/sqrt(list_dot_product(e.v, e.v))
        |             /sqrt(list_dot_product(t.centv, t.centv)) DESC,
        |           t.centroid_id ASC) AS rn
        |  FROM e, t WHERE e.vec_id < 10) WHERE rn <= 2),
        |scored AS (SELECT qb.query_id, asg.vec_id AS neighbor_id,
        |           list_dot_product(qb.qv, asg.v)/sqrt(list_dot_product(qb.qv, qb.qv))
        |             /sqrt(list_dot_product(asg.v, asg.v)) AS cos
        |           FROM asg JOIN qb USING (bucket)
        |           WHERE qb.query_id != asg.vec_id)
        |SELECT query_id, neighbor_id FROM (
        |  SELECT query_id, neighbor_id,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY cos DESC, neighbor_id ASC) AS rn
        |  FROM scored) WHERE rn <= 5""".stripMargin)),
    // The IVF speed/quality tradeoff as a first-class report: recall@k
    // of ivfTopK vs brute force over a (k, nProbe) grid — the number an
    // index deployment watches when tuning probe count. Fully oracle'd
    // (round-12): with the deterministic lowest-id centroid pick the
    // whole grid — assignment, probe sets, per-cell top-k, the recall
    // ratios themselves — is exactly re-expressible in DuckDB; the
    // recall VALUES are pinned, not just 6 rows. Exactness properties
    // (probe=all ⇒ recall 1, monotone in probe) remain spec-asserted in
    // SimilaritySpec.
    Q("sim_ann_recall",
      (s, d) => {
        val e = emb(s, d)
        Similarity.recallReport(e.where(col("vec_id") < 10), e,
          "embedding", "vec_id", ks = Seq(5, 10), probes = Seq(1, 2, 4),
          nCentroids = Similarity.sqrtCentroids(e), dim = 64)
      },
      Some(s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |$sqrtCentroidsSql,
        |asg AS (SELECT vec_id, v, centroid_id AS bucket FROM (
        |  SELECT e.vec_id, e.v, c.centroid_id,
        |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |           list_dot_product(e.v, c.centv)/sqrt(list_dot_product(e.v, e.v))
        |             /sqrt(list_dot_product(c.centv, c.centv)) DESC,
        |           c.centroid_id ASC) AS rn
        |  FROM e, c) WHERE rn = 1),
        |qb AS (SELECT query_id, qv, bucket, rn FROM (
        |  SELECT e.vec_id AS query_id, e.v AS qv, c.centroid_id AS bucket,
        |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |           list_dot_product(e.v, c.centv)/sqrt(list_dot_product(e.v, e.v))
        |             /sqrt(list_dot_product(c.centv, c.centv)) DESC,
        |           c.centroid_id ASC) AS rn
        |  FROM e, c WHERE e.vec_id < 10) WHERE rn <= 4),
        |probes AS (SELECT unnest([1, 2, 4]) AS n_probe),
        |ks AS (SELECT unnest([5, 10]) AS k),
        |ivfr AS (SELECT n_probe, query_id, neighbor_id,
        |  row_number() OVER (PARTITION BY n_probe, query_id
        |                     ORDER BY cos DESC, neighbor_id ASC) AS rnk
        |  FROM (SELECT p.n_probe, q.query_id, a.vec_id AS neighbor_id,
        |          list_dot_product(q.qv, a.v)/sqrt(list_dot_product(q.qv, q.qv))
        |            /sqrt(list_dot_product(a.v, a.v)) AS cos
        |        FROM probes p JOIN qb q ON q.rn <= p.n_probe
        |        JOIN asg a USING (bucket) WHERE q.query_id != a.vec_id)),
        |bruter AS (SELECT query_id, neighbor_id,
        |  row_number() OVER (PARTITION BY query_id
        |                     ORDER BY cos DESC, neighbor_id ASC) AS rnk
        |  FROM (SELECT q.query_id, e2.vec_id AS neighbor_id,
        |          list_dot_product(q.qv, e2.v)/sqrt(list_dot_product(q.qv, q.qv))
        |            /sqrt(list_dot_product(e2.v, e2.v)) AS cos
        |        FROM e e2, (SELECT vec_id AS query_id, v AS qv FROM e
        |                    WHERE vec_id < 10) q
        |        WHERE q.query_id != e2.vec_id)),
        |b2 AS (SELECT g.k, g.n_probe, b.query_id, b.neighbor_id
        |  FROM (SELECT k, n_probe FROM ks, probes) g
        |  JOIN bruter b ON b.rnk <= g.k)
        |SELECT b2.k, b2.n_probe,
        |  round(sum(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
        |    / count(*), 6) AS recall
        |FROM b2 LEFT JOIN ivfr i
        |  ON i.n_probe = b2.n_probe AND i.query_id = b2.query_id
        |  AND i.neighbor_id = b2.neighbor_id AND i.rnk <= b2.k
        |GROUP BY 1, 2""".stripMargin))
  )

  private val enSw = TextAnalysis.stopwords("en").map(w => s"'$w'").mkString(", ")
  private val deSw = TextAnalysis.stopwords("de").map(w => s"'$w'").mkString(", ")
  private val frSw = TextAnalysis.stopwords("fr").map(w => s"'$w'").mkString(", ")

  private val textQueries: Seq[Q] = Seq(
    Q("text_tokens",
      (s, d) => docs(s, d).select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        TextAnalysis.subwordCount(col("text")).as("n_subwords")),
      Some("""SELECT doc_id,
        |  len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
        |  len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS n_subwords
        |FROM documents""".stripMargin)),
    Q("text_quality",
      (s, d) => TextAnalysis.qualityFeatures(
          spread(docs(s, d).select("doc_id", "text"), "doc_id"), "text")
        .select("doc_id", "n_chars_q", "n_tokens", "mean_word_len",
          "punct_ratio", "stopword_ratio_en", "alpha_ratio"),
      Some(s"""WITH q AS (SELECT doc_id, text,
        |  regexp_split_to_array(trim(text), '\\s+') AS ws FROM documents)
        |SELECT doc_id,
        |  length(text) AS n_chars_q,
        |  len(ws) AS n_tokens,
        |  round(length(regexp_replace(text, '\\s+', '', 'g'))::DOUBLE / len(ws), 6)
        |    AS mean_word_len,
        |  round(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]'))::DOUBLE
        |    / length(text), 6) AS punct_ratio,
        |  round(len([x for x in ws if x IN ($enSw)])::DOUBLE / len(ws), 6)
        |    AS stopword_ratio_en,
        |  round(len(regexp_extract_all(text, '[a-zA-Z]'))::DOUBLE / length(text), 6)
        |    AS alpha_ratio
        |FROM q""".stripMargin)),
    Q("text_langid",
      (s, d) => spread(docs(s, d).select("doc_id", "text"), "doc_id")
        .select(col("doc_id"),
          TextAnalysis.langId(col("text")).as("lang_pred")),
      Some(s"""WITH q AS (SELECT doc_id,
        |  regexp_split_to_array(trim(text), '\\s+') AS ws FROM documents),
        |h AS (SELECT doc_id,
        |  [{'hits': len([x for x in ws if x IN ($deSw)]), 'lang': 'de'},
        |   {'hits': len([x for x in ws if x IN ($enSw)]), 'lang': 'en'},
        |   {'hits': len([x for x in ws if x IN ($frSw)]), 'lang': 'fr'}] AS scored
        |  FROM q)
        |SELECT doc_id,
        |  CASE WHEN list_sort(scored)[3].hits > 0 THEN list_sort(scored)[3].lang
        |       ELSE 'und' END AS lang_pred
        |FROM h""".stripMargin)),
    Q("text_repetition",
      (s, d) => TextAnalysis.repetitionFeatures(docs(s, d), "text", "doc_id"),
      Some("""WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
        |           FROM documents),
        |t AS (SELECT doc_id, unnest(ws) AS w FROM w),
        |wc AS (SELECT doc_id, w, count(*) AS c FROM t GROUP BY 1, 2),
        |wa AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
        |       count(*) AS nd, max(c) AS mx FROM wc GROUP BY 1),
        |bt AS (SELECT doc_id, unnest(CASE WHEN len(ws) >= 2 THEN
        |         [ws[i] || ' ' || ws[i+1] for i in generate_series(1, len(ws)-1)]
        |       ELSE [] END) AS b FROM w),
        |bc AS (SELECT doc_id, b, count(*) AS c FROM bt GROUP BY 1, 2),
        |ba AS (SELECT doc_id, sum(c) AS nb, max(c) AS mxb FROM bc GROUP BY 1)
        |SELECT wa.doc_id, n_words,
        |  round(nd::DOUBLE / n_words, 6) AS distinct_word_ratio,
        |  round(mx::DOUBLE / n_words, 6) AS max_word_ratio,
        |  COALESCE(round(mxb::DOUBLE / nb, 6), 0.0) AS top_bigram_ratio
        |FROM wa LEFT JOIN ba ON wa.doc_id = ba.doc_id""".stripMargin)),
    Q("text_gopher_filter",
      (s, d) => TextAnalysis.gopherFilter(docs(s, d), "text", "doc_id"),
      Some("""WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
        |           FROM documents),
        |t AS (SELECT doc_id, unnest(ws) AS w FROM w),
        |wc AS (SELECT doc_id, w, count(*) AS c FROM t GROUP BY 1, 2),
        |wa AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
        |       count(*) AS nd, max(c) AS mx FROM wc GROUP BY 1),
        |bt AS (SELECT doc_id, unnest(CASE WHEN len(ws) >= 2 THEN
        |         [ws[i] || ' ' || ws[i+1] for i in generate_series(1, len(ws)-1)]
        |       ELSE [] END) AS b FROM w),
        |bc AS (SELECT doc_id, b, count(*) AS c FROM bt GROUP BY 1, 2),
        |ba AS (SELECT doc_id, sum(c) AS nb, max(c) AS mxb FROM bc GROUP BY 1),
        |f AS (SELECT wa.doc_id, n_words,
        |      round(nd::DOUBLE / n_words, 6) AS distinct_word_ratio,
        |      round(mx::DOUBLE / n_words, 6) AS max_word_ratio,
        |      COALESCE(round(mxb::DOUBLE / nb, 6), 0.0) AS top_bigram_ratio
        |      FROM wa LEFT JOIN ba ON wa.doc_id = ba.doc_id)
        |SELECT doc_id, n_words, distinct_word_ratio, max_word_ratio,
        |  top_bigram_ratio,
        |  n_words < 50 AS flag_too_short,
        |  n_words > 100000 AS flag_too_long,
        |  distinct_word_ratio < 0.3 AS flag_low_diversity,
        |  max_word_ratio > 0.2 AS flag_repetitive_word,
        |  top_bigram_ratio > 0.18 AS flag_repetitive_bigram,
        |  NOT (n_words < 50) AND NOT (n_words > 100000)
        |    AND NOT (distinct_word_ratio < 0.3)
        |    AND NOT (max_word_ratio > 0.2)
        |    AND NOT (top_bigram_ratio > 0.18) AS keep
        |FROM f""".stripMargin)),
    // OOV rate against the corpus's own top-500 vocabulary (built by
    // topKTokens, joined broadcast): the tokenizer-coverage signal per
    // document. Zero-token docs score 0.0, never NULL.
    Q("text_oov_rate",
      (s, d) => {
        val dd = docs(s, d)
        val vocab = Curation.topKTokens(dd, "text", k = 500).select("token")
        TextAnalysis.oovRate(dd, "text", "doc_id", vocab)
      },
      Some("""WITH tok AS (SELECT doc_id,
        |        unnest(regexp_split_to_array(trim(text), '\s+')) AS t
        |        FROM documents),
        |tk AS (SELECT doc_id, t FROM tok WHERE length(t) > 0),
        |v AS (SELECT t AS vt FROM (SELECT t, count(*) AS n FROM tk
        |       GROUP BY 1 ORDER BY n DESC, t ASC LIMIT 500)),
        |agg AS (SELECT d.doc_id,
        |  CAST(count(k.t) AS BIGINT) AS n_tokens,
        |  CAST(count(CASE WHEN k.t IS NOT NULL
        |             AND k.t NOT IN (SELECT vt FROM v) THEN 1 END) AS BIGINT)
        |    AS n_oov
        |  FROM documents d LEFT JOIN tk k USING (doc_id) GROUP BY d.doc_id)
        |SELECT doc_id, n_tokens, n_oov,
        |  CASE WHEN n_tokens = 0 THEN 0.0
        |       ELSE n_oov::DOUBLE / n_tokens END AS oov_rate
        |FROM agg""".stripMargin)),
    Q("text_tfidf",
      (s, d) => TextAnalysis.tfidfKeywords(docs(s, d), "text", "doc_id", k = 5),
      Some("""WITH t AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        |           FROM documents),
        |tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM t
        |       WHERE length(w) > 0 GROUP BY 1, 2),
        |dfq AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
        |s AS (SELECT doc_id, w AS token, tf, df,
        |      round((tf * (n_docs + 1))::DOUBLE / (df + 1), 6) AS score
        |      FROM tf JOIN dfq USING (w), n)
        |SELECT doc_id, token, tf, df, score, rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |            ORDER BY score DESC, token ASC) AS rank FROM s)
        |WHERE rank <= 5""".stripMargin)),
    Q("text_chunks",
      (s, d) => TextAnalysis.chunkByTokens(docs(s, d), "text", "doc_id",
        chunkTokens = 40, overlap = 8),
      Some("""WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
        |           FROM documents),
        |c AS (SELECT doc_id, ws, len(ws) AS n,
        |      unnest(generate_series(0, len(ws) - 1, 32)) AS start FROM w)
        |SELECT doc_id, start // 32 AS chunk_idx, start,
        |  least(40, n - start) AS n_chunk_tokens,
        |  array_to_string(ws[start + 1 : start + 40], ' ') AS chunk_text
        |FROM c""".stripMargin)),
    Q("text_fingerprint",
      (s, d) => docs(s, d).select(col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp")),
      Some("""SELECT doc_id,
        |  md5(array_to_string(list_sort(list_distinct(
        |    regexp_split_to_array(trim(lower(text)), '\s+'))), ' ')) AS fp
        |FROM documents""".stripMargin)),
    // PII scrub. The corpus has no organic PII, so deterministic PII is
    // appended per doc_id in BOTH engines (email iff id%2=0, IP iff
    // id%3=0, phone iff id%5=0 — counts vary, has_pii is sometimes
    // false), then counted and redacted. Patterns are java.regex/RE2
    // portable; redaction order email→ip→phone is part of the contract.
    Q("text_pii",
      (s, d) => {
        val id = col("doc_id")
        val withPii = concat(col("text"),
          when(pmod(id, lit(2)) === 0,
            format_string(" contact u%d@example.com", id)).otherwise(lit("")),
          when(pmod(id, lit(3)) === 0,
            format_string(" from 10.%d.0.%d",
              pmod(id, lit(200)), pmod(id, lit(250)))).otherwise(lit("")),
          when(pmod(id, lit(5)) === 0,
            format_string(" call 555-%03d-%04d",
              pmod(id, lit(1000)), pmod(id, lit(10000)))).otherwise(lit("")))
        graft.pipeline.Pii.scrub(
          spread(docs(s, d).select(col("doc_id"), withPii.as("text")),
            "doc_id"),
          "text", "doc_id")
      },
      Some("""WITH p AS (SELECT doc_id, text ||
        |  CASE WHEN doc_id % 2 = 0
        |       THEN printf(' contact u%d@example.com', doc_id) ELSE '' END ||
        |  CASE WHEN doc_id % 3 = 0
        |       THEN printf(' from 10.%d.0.%d', doc_id % 200, doc_id % 250)
        |       ELSE '' END ||
        |  CASE WHEN doc_id % 5 = 0
        |       THEN printf(' call 555-%03d-%04d', doc_id % 1000, doc_id % 10000)
        |       ELSE '' END AS t FROM documents),
        |-- staged redaction: counts attribute each span to the kind that
        |-- consumes it (emails on t, IPs on t1, phones on t2), matching
        |-- the engine's semantics exactly
        |s AS (SELECT doc_id, t,
        |  regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
        |  FROM p),
        |s2 AS (SELECT doc_id, t, t1,
        |  regexp_replace(t1,
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS t2
        |  FROM s)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
        |  CAST(len(regexp_extract_all(t1,
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INT) AS n_ips,
        |  CAST(len(regexp_extract_all(t2,
        |    '\+?\d{3}[- ]\d{3}[- ]\d{4}')) AS INT) AS n_phones,
        |  regexp_replace(t2,
        |    '\+?\d{3}[- ]\d{3}[- ]\d{4}', '<PHONE>', 'g') AS redacted,
        |  (len(regexp_extract_all(t,
        |     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) +
        |   len(regexp_extract_all(t1,
        |     '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) +
        |   len(regexp_extract_all(t2,
        |     '\+?\d{3}[- ]\d{3}[- ]\d{4}'))) > 0 AS has_pii
        |FROM s2""".stripMargin)),
    // Character-trigram LM scoring: model trained on the corpus itself
    // in both engines (trigram + bigram frequency tables), each doc
    // scored by mean smoothed conditional log-prob and rare-trigram
    // fraction. avg(ln) is the one float aggregate in the suite — the
    // value is rounded at 1e-4 so cross-engine noise (libm ulps +
    // summation order over ~150 terms, bounded near 1e-13) cannot
    // plausibly straddle a rounding boundary.
    Q("text_lm_score",
      (s, d) => graft.pipeline.NgramLm.scoreDocs(docs(s, d), "text",
        "doc_id", vocabSize = 64, rareMax = 2),
      Some("""WITH c3 AS (SELECT doc_id,
        |        unnest(generate_series(1, length(text)-2)) AS i, text
        |        FROM documents),
        |tri AS (SELECT doc_id, substr(text, i, 3) AS g3,
        |        substr(text, i, 2) AS g2 FROM c3),
        |m3 AS (SELECT g3, count(*) AS cnt3 FROM tri GROUP BY 1),
        |cb AS (SELECT doc_id,
        |        unnest(generate_series(1, length(text)-1)) AS i, text
        |        FROM documents),
        |m2 AS (SELECT substr(text, i, 2) AS g2, count(*) AS cnt2
        |       FROM cb GROUP BY 1)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |  round(avg(ln((cnt3 + 1.0) / (cnt2 + 64.0))), 4) AS avg_logprob,
        |  round(avg(CASE WHEN cnt3 <= 2 THEN 1.0 ELSE 0.0 END), 6) AS rare_frac
        |FROM tri JOIN m3 USING (g3) JOIN m2 USING (g2)
        |GROUP BY doc_id""".stripMargin))
  )

  /** Shared oracle CTE: the closed-form payload contract of
    * [[Multimodal.mediaFromDocuments]] — per doc, every shape parameter the
    * REAL codec round-trip must reproduce (the Spark side genuinely encodes
    * BMP/WAV/GFV1 containers and decodes them back with ImageIO/AudioSystem;
    * the oracle recomputes the decoded values analytically from the seed). */
  private val mediaCte =
    """WITH m AS (SELECT doc_id AS media_id, doc_id % 192 AS seed
      |           FROM documents),
      |t AS (SELECT media_id, seed,
      |  CASE seed % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
      |       ELSE 'video' END AS media_type,
      |  16 + seed % 32 AS iw, 16 + (seed // 2) % 32 AS ih,
      |  800 + (seed % 100) * 8 AS frames,
      |  2 + seed % 4 AS nf,
      |  16 + seed % 16 AS fw, 16 + (seed // 2) % 16 AS fh
      |  FROM m)""".stripMargin

  private val multimodalQueries: Seq[Q] = Seq(
    // Real-codec round trip: Spark synthesizes genuine BMP/WAV/GFV1 bytes,
    // decodes them back with the JDK codecs, and the oracle checks every
    // decoded dimension/duration/byte-count against the closed forms.
    Q("mm_media_features",
      (s, d) => {
        import s.implicits._
        val media = Multimodal.mediaFromDocuments(docs(s, d))
          .as[Multimodal.MediaRecord]
        Multimodal.extractFeatures(media)(s).toDF()
          .select("media_id", "media_type", "n_bytes", "width", "height",
            "duration_ms")
      },
      Some(s"""$mediaCte
        |SELECT media_id, media_type,
        |  CASE media_type
        |    WHEN 'image' THEN 54 + ih * ((3*iw + 3) // 4 * 4)
        |    WHEN 'audio' THEN 44 + 2 * frames
        |    ELSE 12 + nf * (4 + 54 + fh * ((3*fw + 3) // 4 * 4))
        |  END AS n_bytes,
        |  CASE media_type WHEN 'image' THEN iw WHEN 'video' THEN fw
        |       ELSE 0 END AS width,
        |  CASE media_type WHEN 'image' THEN ih WHEN 'video' THEN fh
        |       ELSE 0 END AS height,
        |  CASE media_type WHEN 'image' THEN 0
        |       WHEN 'audio' THEN 100 + seed % 100
        |       ELSE nf * 40 END AS duration_ms
        |FROM t""".stripMargin)),
    Q("mm_frame_sample",
      (s, d) => {
        import s.implicits._
        val media = Multimodal.mediaFromDocuments(docs(s, d))
          .as[Multimodal.MediaRecord]
        Multimodal.sampleFrames(media, everyN = 2)(s).toDF()
          .select(col("media_id"), col("frame_idx"),
            length(col("frame_bytes")).as("n_frame_bytes"))
      },
      Some(s"""$mediaCte,
        |f AS (SELECT media_id, fw, fh,
        |      unnest(generate_series(0, nf - 1)) AS frame_idx
        |      FROM t WHERE media_type = 'video')
        |SELECT media_id, frame_idx,
        |       54 + fh * ((3*fw + 3) // 4 * 4) AS n_frame_bytes
        |FROM f WHERE frame_idx % 2 = 0""".stripMargin)),
    // Image resize through the real codec: oversized images decode, scale
    // to the clamped box, re-encode; everything else passes byte-identical.
    Q("mm_resize",
      (s, d) => {
        import s.implicits._
        val media = Multimodal.mediaFromDocuments(docs(s, d))
          .as[Multimodal.MediaRecord]
        val resized = Multimodal.resize(media, maxW = 32, maxH = 24)(s)
        Multimodal.extractFeatures(resized)(s).toDF()
          .select("media_id", "media_type", "n_bytes", "width", "height")
      },
      Some(s"""$mediaCte,
        |r AS (SELECT media_id, media_type, frames, nf, fw, fh,
        |  CASE WHEN iw <= 32 AND ih <= 24 THEN iw
        |       ELSE least(iw, 32) END AS iw2,
        |  CASE WHEN iw <= 32 AND ih <= 24 THEN ih
        |       ELSE least(ih, 24) END AS ih2
        |  FROM t)
        |SELECT media_id, media_type,
        |  CASE media_type
        |    WHEN 'image' THEN 54 + ih2 * ((3*iw2 + 3) // 4 * 4)
        |    WHEN 'audio' THEN 44 + 2 * frames
        |    ELSE 12 + nf * (4 + 54 + fh * ((3*fw + 3) // 4 * 4))
        |  END AS n_bytes,
        |  CASE media_type WHEN 'image' THEN iw2 WHEN 'video' THEN fw
        |       ELSE 0 END AS width,
        |  CASE media_type WHEN 'image' THEN ih2 WHEN 'video' THEN fh
        |       ELSE 0 END AS height
        |FROM r""".stripMargin)),
    // Perceptual near-dup detection through the REAL DCT pHash pipeline
    // (decode → 32x32 grayscale → DCT-II → sign-of-median bits → exact
    // pigeonhole banding). At maxHamming=7 over this corpus the pair set
    // is provably the identical-image pairs: byte-identical seeds hash
    // identically (hamming 0) while distinct seeds measure >= 14 bits
    // apart (7-bit margin; measured across all 2016 seed pairs) — so the
    // seed-equality oracle verifies hash determinism, banding exactness
    // AND the absence of false positives end to end. Resize invariance
    // (the fuzzy half of pHash) is spec-territory: MultimodalSpec pins
    // rescaled copies to small distances, unrelated seeds to large.
    Q("mm_phash_neardup",
      (s, d) => {
        import s.implicits._
        // prune to image docs BEFORE synthesis: a Dataset filter after
        // the generation mapPartitions can't be pushed through it, and
        // would pay for audio/video payloads the hash never reads
        val media = Multimodal.mediaFromDocuments(
            docs(s, d).where(pmod(col("doc_id"), lit(3)) === 0))
          .as[Multimodal.MediaRecord]
        Multimodal.phashNearDups(media, maxHamming = 7)(s)
      },
      Some("""WITH m AS (SELECT doc_id, doc_id % 192 AS seed
        |  FROM documents WHERE doc_id % 3 = 0)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(0 AS INTEGER) AS hamming
        |FROM m a JOIN m b ON a.seed = b.seed AND a.doc_id < b.doc_id"""
        .stripMargin)),
    // The audio counterpart: spectral-fingerprint near-dups through the
    // real PCM decode (Goertzel band energies, sign-of-delta bits).
    // Same proof shape as mm_phash_neardup: byte-identical seeds
    // fingerprint identically, distinct seeds measure >= 16 bits apart
    // (chirped generator; measured across all 2016 seed pairs), so the
    // seed-equality oracle pins determinism, banding exactness and
    // false-positive absence at maxHamming=7.
    Q("mm_audio_neardup",
      (s, d) => {
        import s.implicits._
        val media = Multimodal.mediaFromDocuments(
            docs(s, d).where(pmod(col("doc_id"), lit(3)) === 1))
          .as[Multimodal.MediaRecord]
        Multimodal.audioNearDups(media, maxHamming = 7)(s)
      },
      Some("""WITH m AS (SELECT doc_id, doc_id % 192 AS seed
        |  FROM documents WHERE doc_id % 3 = 1)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(0 AS INTEGER) AS hamming
        |FROM m a JOIN m b ON a.seed = b.seed AND a.doc_id < b.doc_id"""
        .stripMargin)),
    // The end-to-end media dedup: synthesize -> decode -> perceptual
    // hash per modality -> exact-recall banding -> union of pair lists
    // -> label-propagation clustering -> survivors. Clusters never span
    // modalities (pairs are type-local), so the oracle's per-seed groups
    // are exactly the expected components. Media is persisted once and
    // reused by all three hash paths + the vertex list (cache ownership:
    // the session loop's clearCache, like dedup_clusters).
    Q("mm_media_clusters",
      (s, d) => {
        import s.implicits._
        val media = Multimodal.mediaFromDocuments(docs(s, d))
          .as[Multimodal.MediaRecord].persist()
        // mediaNearDupPairs (r16 shape) is ONE banded self-join over the
        // unioned per-modality hash frames (modality ordinal in the
        // bucket key), persisted+counted inside bandedHammingPairs;
        // everything this composition caches is dropped in the finally
        // once label propagation has materialized the labels — no net
        // decode-sized caches outlive the query
        val pairs = Multimodal.mediaNearDupPairs(media, maxHamming = 7)(s)
        try
          // vertex list straight from the docs scan (r16): media_id IS
          // doc_id, but `media.select(media_id)` re-ran the whole payload
          // synthesis at force time — the labels are eager, the final
          // label join is not, and by then `media` is unpersisted.
          Dedup.nearDupClusters(
            docs(s, d).select(col("doc_id").as("media_id")), "media_id",
            pairs.select("id_a", "id_b"))
        finally { pairs.unpersist(); media.unpersist() }
      },
      Some("""WITH m AS (SELECT doc_id, doc_id % 192 AS seed FROM documents),
        |g AS (SELECT seed, min(doc_id) AS cid, count(*) AS n
        |      FROM m GROUP BY seed)
        |SELECT m.doc_id AS media_id, g.cid AS cluster_id,
        |       CAST(g.n AS BIGINT) AS n_cluster,
        |       m.doc_id = g.cid AS is_survivor
        |FROM m JOIN g USING (seed)""".stripMargin)),
    // Pixel-exact codec round trip: Spark DECODES every raster byte and
    // sums the channels; the oracle recomputes the sums straight from
    // the generation formulas. 24-bit BMP is lossless, so a single
    // flipped pixel anywhere in encode->decode fails the hash match —
    // the deepest verification the codec path has.
    Q("mm_image_stats",
      (s, d) => {
        import s.implicits._
        val media = Multimodal.mediaFromDocuments(
            docs(s, d).where(pmod(col("doc_id"), lit(3)) === 0))
          .as[Multimodal.MediaRecord]
        Multimodal.imageStats(media)(s)
      },
      Some("""WITH m AS (SELECT doc_id AS media_id, doc_id % 192 AS seed
        |  FROM documents WHERE doc_id % 3 = 0),
        |d AS (SELECT media_id, seed, 16 + seed % 32 AS w,
        |      16 + (seed // 2) % 32 AS h FROM m),
        |px AS (SELECT media_id, seed, w, h,
        |       unnest(generate_series(0, w*h - 1)) AS i FROM d)
        |SELECT media_id, CAST(w*h AS BIGINT) AS n_px,
        |  CAST(sum((seed*31 + (i % w)*7 + (i // w)*13) % 251) AS BIGINT)
        |    AS sum_r,
        |  CAST(sum((seed*17 + (i % w)*11 + (i // w)*3) % 251) AS BIGINT)
        |    AS sum_g,
        |  CAST(sum((seed*7 + (i % w)*5 + (i // w)*19) % 251) AS BIGINT)
        |    AS sum_b
        |FROM px GROUP BY media_id, w, h""".stripMargin)),
    // The audio twin: every decoded PCM sample summed exactly; the
    // oracle replays the chirp's sign pattern in SQL.
    Q("mm_pcm_stats",
      (s, d) => {
        import s.implicits._
        val media = Multimodal.mediaFromDocuments(
            docs(s, d).where(pmod(col("doc_id"), lit(3)) === 1))
          .as[Multimodal.MediaRecord]
        Multimodal.pcmStats(media)(s)
      },
      Some("""WITH m AS (SELECT doc_id AS media_id, doc_id % 192 AS seed
        |  FROM documents WHERE doc_id % 3 = 1),
        |d AS (SELECT media_id, 800 + (seed % 100) * 8 AS frames,
        |      3 + seed % 29 AS base, 1 + (seed // 29) % 7 AS sweep FROM m),
        |sm AS (SELECT media_id, frames, base, sweep,
        |       unnest(generate_series(0, frames - 1)) AS i FROM d)
        |SELECT media_id, CAST(frames AS BIGINT) AS n_samples,
        |  CAST(sum(CASE WHEN (i // (base + (i // 200) % (sweep + 1))) % 2 = 0
        |           THEN 12000 ELSE -12000 END) AS BIGINT) AS sum_amp,
        |  CAST(frames * 12000 AS BIGINT) AS sum_abs
        |FROM sm GROUP BY media_id, frames""".stripMargin)),
    // Frame-level video copy detection at maxHamming=0 (clean copies:
    // frames match iff their 64-bit pHashes are identical). Same-seed
    // videos share every frame byte-identically, so the pair count is
    // the closed-form frame count; the measured cross-video frame floor
    // is 4 bits, so zero cross-seed frame pairs collide at threshold 0.
    Q("mm_frame_match",
      (s, d) => {
        import s.implicits._
        val media = Multimodal.mediaFromDocuments(
            docs(s, d).where(pmod(col("doc_id"), lit(3)) === 2))
          .as[Multimodal.MediaRecord]
        Multimodal.frameMatches(media, maxHamming = 0)(s)
      },
      Some("""WITH m AS (SELECT doc_id, doc_id % 192 AS seed
        |  FROM documents WHERE doc_id % 3 = 2)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(2 + a.seed % 4 AS BIGINT) AS n_matched_frames
        |FROM m a JOIN m b ON a.seed = b.seed AND a.doc_id < b.doc_id"""
        .stripMargin)),
    // Video near-dups complete the perceptual triad: per-frame DCT
    // pHashes folded by XOR-of-rotations (order-sensitive), frame-count
    // equality as a hard banding key. Same proof shape: identical seeds
    // fold identically; distinct same-count seeds measure >= 22 bits
    // apart (measured over all 480 same-count pairs) — 15-bit margin at
    // maxHamming=7.
    Q("mm_video_neardup",
      (s, d) => {
        import s.implicits._
        val media = Multimodal.mediaFromDocuments(
            docs(s, d).where(pmod(col("doc_id"), lit(3)) === 2))
          .as[Multimodal.MediaRecord]
        Multimodal.videoNearDups(media, maxHamming = 7)(s)
      },
      Some("""WITH m AS (SELECT doc_id, doc_id % 192 AS seed
        |  FROM documents WHERE doc_id % 3 = 2)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(0 AS INTEGER) AS hamming
        |FROM m a JOIN m b ON a.seed = b.seed AND a.doc_id < b.doc_id"""
        .stripMargin))
  )

  /** Curation operators (stratified sample / token packing / benchmark
    * contamination / top-k tokens). Sampling and bucketing decisions are
    * md5-based, so DuckDB reproduces row membership bit-for-bit; the
    * benchmark set for the contamination check is the doc_id % 97 == 0
    * slice of `documents`, the corpus is the rest. */
  private val curationQueries: Seq[Q] = Seq(
    // Z-order (Morton) layout key over (user bucket, hour bucket): the
    // 2-D clustering key a 100 TB table sorts/partitions by so parquet
    // min/max stats stay tight on BOTH dimensions (predicates on either
    // prune row groups). The oracle SQL is GENERATED from the same bit
    // walk as the Spark column (Distribution.zOrderSql), so the engines
    // agree by construction; zb (z >> 8) is the coarse write-partition
    // bucket that zBucketsForBox covers at query time.
    Q("curation_zorder",
      (s, d) => {
        val e = ChangeFeed.table(s, d, "events")
          .select(col("event_id"),
            col("user_id").bitwiseAND(lit(255L)).as("x"),
            expr("unix_micros(ts) div 1000000 div 3600")
              .bitwiseAND(lit(255L)).as("y"))
        e.withColumn("z",
            graft.plans.Distribution.zOrderKey(col("x"), col("y"), 8))
          .withColumn("zb", shiftright(col("z"), 8))
      },
      Some {
        val zSql = graft.plans.Distribution.zOrderSql("x", "y", 8)
        s"""WITH b AS (SELECT event_id, (user_id & 255) AS x,
           |  ((epoch_us(ts)//1000000//3600) & 255) AS y FROM events)
           |SELECT event_id, x, y, $zSql AS z, ($zSql) >> 8 AS zb
           |FROM b""".stripMargin
      }),
    // 3-D variant through the N-ary interleave: (user, hour, event-type
    // ordinal) at 4 bits each — the layout key for a table queried by
    // any subset of three dimensions. Same generated-oracle contract.
    Q("curation_zorder3",
      (s, d) => {
        val ord = expr("""CASE event_type WHEN 'click' THEN 0
          WHEN 'view' THEN 1 WHEN 'purchase' THEN 2
          WHEN 'signup' THEN 3 ELSE 4 END""")
        val e = ChangeFeed.table(s, d, "events")
          .select(col("event_id"),
            col("user_id").bitwiseAND(lit(15L)).as("x"),
            expr("unix_micros(ts) div 1000000 div 3600")
              .bitwiseAND(lit(15L)).as("y"),
            ord.cast("long").as("w"))
        e.withColumn("z", graft.plans.Distribution.zOrderKey(
          Seq(col("x"), col("y"), col("w")), 4))
      },
      Some {
        val zSql = graft.plans.Distribution.zOrderSql(Seq("x", "y", "w"), 4)
        s"""WITH b AS (SELECT event_id, (user_id & 15) AS x,
           |  ((epoch_us(ts)//1000000//3600) & 15) AS y,
           |  (CASE event_type WHEN 'click' THEN 0 WHEN 'view' THEN 1
           |   WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3
           |   ELSE 4 END) AS w
           |  FROM events)
           |SELECT event_id, x, y, w, $zSql AS z FROM b""".stripMargin
      }),
    Q("curation_sample",
      (s, d) => Curation.stratifiedSample(docs(s, d), "lang", "doc_id",
          rates = Map("en" -> 0.5, "de" -> 0.25), defaultRate = 0.125)
        .select("doc_id", "lang"),
      Some("""SELECT doc_id, lang FROM documents
        |WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT)
        |        % 4096 <
        |      CASE lang WHEN 'en' THEN 2048 WHEN 'de' THEN 1024 ELSE 512 END"""
        .stripMargin)),
    // Exact per-stratum budget: exactly min(n, |stratum|) docs per lang,
    // chosen by the deterministic (md5(id), id) permutation; the
    // two-phase rank keeps the global window input bounded by n × P,
    // not the stratum size.
    Q("curation_take_n",
      (s, d) => Curation.takeExactN(docs(s, d), "lang", "doc_id", n = 30)
        .select("doc_id", "lang"),
      Some("""WITH r AS (SELECT doc_id, lang,
        |  row_number() OVER (PARTITION BY lang
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |SELECT doc_id, lang FROM r WHERE rn <= 30""".stripMargin)),
    Q("curation_pack",
      (s, d) => Curation.packTokenBudget(
          docs(s, d).select("doc_id", "lang", "text"),
          stratumCol = "lang", orderCol = "doc_id",
          tokensCol = TextAnalysis.tokenCount(col("text")),
          budget = 2000L, nShards = 4)
        .select("doc_id", "lang", "shard", "n_tokens", "bin_id", "pack_key"),
      Some("""WITH t AS (SELECT doc_id, lang, doc_id % 4 AS shard,
        |  len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
        |  FROM documents)
        |SELECT doc_id, lang, shard, n_tokens,
        |  CAST(floor(COALESCE(sum(n_tokens) OVER
        |    (PARTITION BY lang, shard ORDER BY doc_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    / 2000.0) AS BIGINT) AS bin_id,
        |  concat_ws('#', lang, shard,
        |    CAST(floor(COALESCE(sum(n_tokens) OVER
        |      (PARTITION BY lang, shard ORDER BY doc_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      / 2000.0) AS BIGINT)) AS pack_key
        |FROM t""".stripMargin)),
    Q("curation_contamination",
      (s, d) => {
        val dd = docs(s, d)
        Curation.contamination(
            dd.where(col("doc_id") % 97 =!= 0), "text", "doc_id",
            dd.where(col("doc_id") % 97 === 0), "text",
            shingleN = 3, threshold = 0.1)
          .select("doc_id", "n_shingles", "n_hits", "contamination",
            "contaminated")
      },
      Some("""WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
        |           FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(ws) >= 3 THEN
        |        list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
        |         for i in generate_series(1, len(ws)-2)])
        |       ELSE [] END AS sh FROM w),
        |bench AS (SELECT DISTINCT unnest(sh) AS shingle FROM sh
        |          WHERE doc_id % 97 = 0),
        |corpus AS (SELECT doc_id, len(sh) AS n_shingles,
        |           unnest(CASE WHEN len(sh) = 0 THEN [NULL] ELSE sh END) AS shingle
        |           FROM sh WHERE doc_id % 97 != 0),
        |j AS (SELECT c.doc_id, c.n_shingles,
        |      CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END AS hit
        |      FROM corpus c LEFT JOIN bench b ON c.shingle = b.shingle)
        |SELECT doc_id, n_shingles, CAST(sum(hit) AS BIGINT) AS n_hits,
        |  CASE WHEN n_shingles = 0 THEN 0.0
        |       ELSE round(sum(hit)::DOUBLE / n_shingles, 6) END AS contamination,
        |  CASE WHEN n_shingles = 0 THEN 0.0
        |       ELSE round(sum(hit)::DOUBLE / n_shingles, 6) END >= 0.1
        |    AS contaminated
        |FROM j GROUP BY doc_id, n_shingles""".stripMargin)),
    Q("curation_source_mix",
      (s, d) => Curation.sourceMixReport(docs(s, d), "source", "text"),
      Some("""WITH s AS (SELECT source, md5(text) AS digest,
        |  len(regexp_split_to_array(trim(text), '\s+')) AS toks FROM documents),
        |a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(*) - count(DISTINCT digest) AS BIGINT) AS n_exact_dups,
        |  CAST(sum(toks) AS BIGINT) AS total_tokens,
        |  round(avg(toks), 6) AS mean_tokens
        |  FROM s GROUP BY 1)
        |SELECT source, n_docs, n_exact_dups, total_tokens, mean_tokens,
        |  round(n_docs::DOUBLE / sum(n_docs) OVER (), 6) AS share_docs
        |FROM a""".stripMargin)),
    Q("curation_topk",
      (s, d) => Curation.topKTokens(docs(s, d), "text", k = 50),
      Some("""WITH t AS (SELECT unnest(regexp_split_to_array(trim(text), '\s+'))
        |             AS token FROM documents)
        |SELECT token, CAST(count(*) AS BIGINT) AS n FROM t
        |WHERE length(token) > 0
        |GROUP BY token ORDER BY n DESC, token ASC LIMIT 50""".stripMargin)),
    // Pack materialization: the packTokenBudget assignment turned into
    // actual training sequences — each pack's docs concatenated in order
    // with an end-of-document marker.
    Q("curation_pack_concat",
      (s, d) => {
        val packed = Curation.packTokenBudget(
          docs(s, d).select("doc_id", "lang", "text"),
          stratumCol = "lang", orderCol = "doc_id",
          tokensCol = TextAnalysis.tokenCount(col("text")),
          budget = 2000L, nShards = 4)
        Curation.materializePacks(packed, "text", "doc_id", sep = "<|eod|>")
      },
      Some("""WITH t AS (SELECT doc_id, lang, text, doc_id % 4 AS shard,
        |  len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
        |  FROM documents),
        |p AS (SELECT doc_id, text, n_tokens,
        |  concat_ws('#', lang, shard,
        |    CAST(floor(COALESCE(sum(n_tokens) OVER
        |      (PARTITION BY lang, shard ORDER BY doc_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      / 2000.0) AS BIGINT)) AS pack_key
        |  FROM t)
        |SELECT pack_key, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
        |  string_agg(text, '<|eod|>' ORDER BY doc_id) AS pack_text
        |FROM p GROUP BY pack_key""".stripMargin)),
    // Near-dup cross-split leakage: simhash pairs that straddle the
    // md5-bucket train/test split flag the train side — the leak the
    // exact-digest guard cannot see.
    Q("curation_split_neardup",
      (s, d) => {
        val d0 = docs(s, d)
        val split = Curation.leakageGuardedSplit(d0, "text", "doc_id",
          testRate = 0.1).select("doc_id", "split")
        val pairs = Dedup.simhashNearDups(d0, "text", "doc_id",
          maxHamming = 12, prefixBits = 8)
        Curation.nearDupLeaks(split, "doc_id", pairs)
      },
      Some("""WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
        |           FROM documents),
        |wh AS (SELECT doc_id,
        |       CAST(list_sum([(strpos('0123456789abcdef', md5(wrd)[j+1:j+1]) - 1)::BIGINT
        |                      << (4*(14-j)) for j in generate_series(0,14)]) AS BIGINT) AS h
        |       FROM (SELECT doc_id, unnest(ws) AS wrd FROM w)),
        |bits AS (SELECT doc_id, b, sum((h >> b) & 1) AS cnt
        |         FROM wh, generate_series(0,59) t(b) GROUP BY doc_id, b),
        |nw AS (SELECT doc_id, len(ws) AS n FROM w),
        |sg AS (SELECT bits.doc_id,
        |       CAST(sum(CASE WHEN cnt*2 > n THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS sh
        |       FROM bits JOIN nw ON bits.doc_id = nw.doc_id GROUP BY bits.doc_id),
        |pr AS (SELECT x.doc_id AS a, y.doc_id AS b FROM sg x JOIN sg y
        |       ON (x.sh >> 52) = (y.sh >> 52) AND x.doc_id < y.doc_id
        |       WHERE bit_count(xor(x.sh, y.sh)) <= 12),
        |sp AS (SELECT doc_id,
        |       CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)
        |                 AS BIGINT) % 4096 < 409
        |            THEN 'test' ELSE 'train' END AS split FROM documents),
        |lk AS (SELECT DISTINCT u.x AS doc_id
        |       FROM (SELECT a AS x, b AS y FROM pr
        |             UNION ALL SELECT b AS x, a AS y FROM pr) u
        |       JOIN sp t ON u.y = t.doc_id AND t.split = 'test')
        |SELECT sp.doc_id, sp.split,
        |  (sp.split = 'train' AND lk.doc_id IS NOT NULL) AS near_dup_leak
        |FROM sp LEFT JOIN lk USING (doc_id)""".stripMargin)),
    // Train/test split with exact-duplicate leakage guard: md5-bucket
    // assignment (reproducible across engines/cluster sizes), TRAIN docs
    // whose content digest appears in TEST flagged is_leak.
    Q("curation_split_guarded",
      (s, d) => Curation.leakageGuardedSplit(docs(s, d), "text", "doc_id",
        testRate = 0.1),
      Some("""WITH a AS (SELECT doc_id,
        |  CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)
        |            AS BIGINT) % 4096 < 409
        |       THEN 'test' ELSE 'train' END AS split,
        |  md5(coalesce(text, '')) AS digest FROM documents)
        |SELECT doc_id, split,
        |  (split = 'train' AND digest IN
        |     (SELECT digest FROM a WHERE split = 'test')) AS is_leak
        |FROM a""".stripMargin))
  )

  /** End-to-end composed pipeline: quality gate → exact dedup →
    * stratified sample → token-budget pack, all in ONE lazily-composed
    * plan — the proof that the operators a user would chain actually
    * chain (each stage's semantics already verified alone; this verifies
    * the composition against the same chain in SQL). */
  private val e2eQueries: Seq[Q] = Seq(
    Q("pipeline_curation_e2e",
      (s, d) => {
        val dd = docs(s, d)
        val kept = TextAnalysis.gopherFilter(dd, "text", "doc_id")
          .where(col("keep")).select("doc_id")
        val keptDocs = dd.join(kept, "doc_id")
        val survivors = Dedup.exactSurvivors(keptDocs, "text", "doc_id")
          .select("doc_id")
        val surDocs = keptDocs.join(survivors, "doc_id")
        val sampled = Curation.stratifiedSample(surDocs, "lang", "doc_id",
          Map("en" -> 0.75, "de" -> 0.5), defaultRate = 0.25)
        Curation.packTokenBudget(sampled.select("doc_id", "lang", "text"),
            "lang", "doc_id", TextAnalysis.tokenCount(col("text")),
            budget = 1000L, nShards = 2)
          .select("doc_id", "lang", "shard", "n_tokens", "bin_id", "pack_key")
      },
      Some("""WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
        |           FROM documents),
        |t0 AS (SELECT doc_id, unnest(ws) AS w FROM w),
        |wc AS (SELECT doc_id, w, count(*) AS c FROM t0 GROUP BY 1, 2),
        |wa AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
        |       count(*) AS nd, max(c) AS mx FROM wc GROUP BY 1),
        |bt AS (SELECT doc_id, unnest(CASE WHEN len(ws) >= 2 THEN
        |         [ws[i] || ' ' || ws[i+1] for i in generate_series(1, len(ws)-1)]
        |       ELSE [] END) AS b FROM w),
        |bc AS (SELECT doc_id, b, count(*) AS c FROM bt GROUP BY 1, 2),
        |ba AS (SELECT doc_id, sum(c) AS nb, max(c) AS mxb FROM bc GROUP BY 1),
        |f AS (SELECT wa.doc_id, n_words,
        |      round(nd::DOUBLE / n_words, 6) AS dr,
        |      round(mx::DOUBLE / n_words, 6) AS mwr,
        |      COALESCE(round(mxb::DOUBLE / nb, 6), 0.0) AS tbr
        |      FROM wa LEFT JOIN ba ON wa.doc_id = ba.doc_id),
        |g AS (SELECT doc_id FROM f
        |      WHERE NOT (n_words < 50) AND NOT (n_words > 100000)
        |        AND NOT (dr < 0.3) AND NOT (mwr > 0.2) AND NOT (tbr > 0.18)),
        |kd AS (SELECT d.doc_id, d.lang, d.text FROM documents d
        |       JOIN g USING (doc_id)),
        |sur AS (SELECT min(doc_id) AS doc_id FROM kd GROUP BY md5(text)),
        |sd AS (SELECT kd.* FROM kd JOIN sur USING (doc_id)),
        |samp AS (SELECT * FROM sd WHERE
        |  CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT)
        |    % 4096 <
        |  CASE lang WHEN 'en' THEN 3072 WHEN 'de' THEN 2048 ELSE 1024 END),
        |t AS (SELECT doc_id, lang, doc_id % 2 AS shard,
        |      len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
        |      FROM samp)
        |SELECT doc_id, lang, shard, n_tokens,
        |  CAST(floor(COALESCE(sum(n_tokens) OVER
        |    (PARTITION BY lang, shard ORDER BY doc_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    / 1000.0) AS BIGINT) AS bin_id,
        |  concat_ws('#', lang, shard,
        |    CAST(floor(COALESCE(sum(n_tokens) OVER
        |      (PARTITION BY lang, shard ORDER BY doc_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      / 1000.0) AS BIGINT)) AS pack_key
        |FROM t""".stripMargin)))

  /** Round-6 additions: retrieval, span dedup, trainable classification,
    * kNN graph, deterministic shuffle, exact-sum correlation. */
  private val retrievalQueries: Seq[Q] = Seq(
    // BM25 top-20 for a 3-term query. Rational idf (the log's argument)
    // keeps every per-term score pure IEEE +,-,*,/ on identical inputs;
    // per-term scores integer-ize at 1e-6 so document totals are exact
    // BIGINT sums — ranking is bit-reproducible on both engines.
    Q("text_bm25",
      (s, d) => Retrieval.bm25TopK(docs(s, d), "text", "doc_id",
        Seq("spark", "window", "merge"), k = 20),
      Some("""WITH d AS (SELECT doc_id,
        |  list_filter(regexp_split_to_array(trim(text), '\s+'),
        |              w -> len(w) > 0) AS ws FROM documents),
        |dd AS (SELECT doc_id, len(ws) AS dl, ws FROM d),
        |st AS (SELECT count(*) AS n_docs,
        |       sum(dl)::DOUBLE / count(*) AS avgdl FROM dd),
        |t AS (SELECT doc_id, dl, unnest(ws) AS w FROM dd),
        |qtf AS (SELECT doc_id, dl, w, count(*) AS tf FROM t
        |        WHERE w IN ('spark', 'window', 'merge') GROUP BY 1, 2, 3),
        |dfreq AS (SELECT w, count(DISTINCT doc_id) AS df_t FROM qtf
        |          GROUP BY 1),
        |sc AS (SELECT doc_id, w,
        |       CAST(round((n_docs - df_t + 0.5::DOUBLE) /
        |           (df_t + 0.5::DOUBLE) *
        |           (tf * (1.2::DOUBLE + 1.0::DOUBLE)) /
        |           (tf + 1.2::DOUBLE *
        |             (1.0::DOUBLE - 0.75::DOUBLE +
        |              0.75::DOUBLE * dl / avgdl)) *
        |           1000000.0::DOUBLE) AS BIGINT) AS micro
        |       FROM qtf JOIN dfreq USING (w), st),
        |agg AS (SELECT doc_id, count(DISTINCT w) AS n_terms,
        |        CAST(sum(micro) AS BIGINT) AS score_micro FROM sc
        |        GROUP BY 1)
        |SELECT doc_id, n_terms, score_micro, rank FROM (
        |  SELECT doc_id, n_terms, score_micro,
        |         row_number() OVER (ORDER BY score_micro DESC, doc_id ASC)
        |           AS rank
        |  FROM agg) WHERE rank <= 20""".stripMargin)),
    // Duplicate-span fraction per doc: 10-word windows occurring ≥2
    // times corpus-wide (the substring-dedup signal).
    Q("dedup_spans",
      (s, d) => Dedup.duplicateSpans(docs(s, d), "text", "doc_id",
        spanN = 10, minOccurrences = 2),
      Some("""WITH w AS (SELECT doc_id,
        |  list_filter(regexp_split_to_array(trim(text), '\s+'),
        |              x -> len(x) > 0) AS ws FROM documents),
        |e AS (SELECT doc_id,
        |      unnest([md5(array_to_string(ws[i+1:i+10], ' '))
        |              for i in generate_series(0, len(ws) - 10)]) AS h
        |      FROM w),
        |f AS (SELECT h, count(*) AS occ FROM e GROUP BY 1),
        |pd AS (SELECT doc_id, count(*) AS n_spans,
        |       sum(CASE WHEN occ >= 2 THEN 1 ELSE 0 END) AS n_dup_spans
        |       FROM e JOIN f USING (h) GROUP BY 1)
        |SELECT w.doc_id,
        |       CAST(coalesce(pd.n_spans, 0) AS BIGINT) AS n_spans,
        |       CAST(coalesce(pd.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
        |       CASE WHEN coalesce(pd.n_spans, 0) = 0 THEN 0.0
        |            ELSE round(pd.n_dup_spans::DOUBLE / pd.n_spans, 6)
        |       END AS dup_span_fraction
        |FROM w LEFT JOIN pd USING (doc_id)""".stripMargin)),
    // The substring-dedup TRANSFORM: tokens under any corpus-duplicated
    // 10-word window removed, survivors reassembled in order.
    Q("dedup_spans_removed",
      (s, d) => Dedup.removeDuplicateSpans(docs(s, d), "text", "doc_id",
        spanN = 10, minOccurrences = 2),
      Some("""WITH w AS (SELECT doc_id,
        |  list_filter(regexp_split_to_array(trim(text), '\s+'),
        |              x -> len(x) > 0) AS ws FROM documents),
        |sp AS (SELECT doc_id,
        |       unnest([{'start': i,
        |                'h': md5(array_to_string(ws[i+1:i+10], ' '))}
        |               for i in generate_series(0, len(ws) - 10)],
        |              recursive := true)
        |       FROM w),
        |f AS (SELECT h, count(*) AS occ FROM sp GROUP BY 1),
        |cov AS (SELECT DISTINCT doc_id, start + d AS pos
        |        FROM sp JOIN f USING (h), generate_series(0, 9) g(d)
        |        WHERE occ >= 2),
        |tok AS (SELECT doc_id,
        |        unnest([{'pos': i - 1, 'w': ws[i]}
        |                for i in generate_series(1, len(ws))],
        |               recursive := true)
        |        FROM w),
        |kept AS (SELECT t.doc_id, t.pos, t.w FROM tok t
        |         LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.pos = c.pos
        |         WHERE c.pos IS NULL),
        |re AS (SELECT doc_id,
        |       array_to_string(list(w ORDER BY pos), ' ') AS clean_text,
        |       count(*) AS n_kept FROM kept GROUP BY 1)
        |SELECT w.doc_id, coalesce(re.clean_text, '') AS clean_text,
        |       CAST(len(ws) AS BIGINT) AS n_tokens,
        |       CAST(len(ws) - coalesce(re.n_kept, 0) AS BIGINT)
        |         AS n_removed
        |FROM w LEFT JOIN re USING (doc_id)""".stripMargin)),
    // Multinomial NB: train on even doc_ids (labeled subset), classify
    // the held-out odd half. Integer-ized log-probs → exact sums.
    Q("text_nb_classifier",
      (s, d) => {
        val dd = docs(s, d)
        Classifier.naiveBayes(
          dd.where(pmod(col("doc_id"), lit(2)) === 0),
          dd.where(pmod(col("doc_id"), lit(2)) === 1),
          "text", "doc_id", "lang")
      },
      Some("""WITH tr AS (SELECT lang,
        |  list_filter(regexp_split_to_array(trim(text), '\s+'),
        |              x -> len(x) > 0) AS ws
        |  FROM documents WHERE doc_id % 2 = 0),
        |trt AS (SELECT lang, unnest(ws) AS w FROM tr),
        |ct AS (SELECT lang, w, count(*) AS cnt FROM trt GROUP BY 1, 2),
        |tot AS (SELECT lang, count(*) AS tok_c FROM trt GROUP BY 1),
        |voc AS (SELECT count(DISTINCT w) AS v FROM trt),
        |nd AS (SELECT count(*) AS n_train FROM documents
        |       WHERE doc_id % 2 = 0),
        |cls AS (SELECT p.lang,
        |        CAST(round(ln(p.nd_c::DOUBLE / nd.n_train) *
        |          1000000.0::DOUBLE) AS BIGINT) AS prior_micro,
        |        CAST(round(ln(1.0::DOUBLE / (tot.tok_c + voc.v)) *
        |          1000000.0::DOUBLE) AS BIGINT) AS oov_micro
        |        FROM (SELECT lang, count(*) AS nd_c FROM documents
        |              WHERE doc_id % 2 = 0 GROUP BY 1) p
        |        JOIN tot USING (lang), nd, voc),
        |model AS (SELECT ct.lang, ct.w,
        |          CAST(round(ln((ct.cnt + 1.0::DOUBLE) /
        |            (tot.tok_c + voc.v)) * 1000000.0::DOUBLE) AS BIGINT)
        |            AS logp_micro
        |          FROM ct JOIN tot USING (lang), voc),
        |te AS (SELECT doc_id,
        |  list_filter(regexp_split_to_array(trim(text), '\s+'),
        |              x -> len(x) > 0) AS ws
        |  FROM documents WHERE doc_id % 2 = 1),
        |tfq AS (SELECT doc_id, w, count(*) AS tf FROM
        |        (SELECT doc_id, unnest(ws) AS w FROM te) GROUP BY 1, 2),
        |ts AS (SELECT tfq.doc_id, c.lang,
        |       sum(tfq.tf * coalesce(m.logp_micro, c.oov_micro))
        |         AS tok_micro
        |       FROM tfq CROSS JOIN cls c
        |       LEFT JOIN model m ON m.lang = c.lang AND m.w = tfq.w
        |       GROUP BY 1, 2),
        |sc AS (SELECT dd.doc_id, c.lang,
        |       CAST(c.prior_micro + coalesce(ts.tok_micro, 0) AS BIGINT)
        |         AS score_micro
        |       FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) dd
        |       CROSS JOIN cls c
        |       LEFT JOIN ts ON ts.doc_id = dd.doc_id AND ts.lang = c.lang)
        |SELECT doc_id, lang AS predicted, score_micro FROM (
        |  SELECT doc_id, lang, score_micro,
        |         row_number() OVER (PARTITION BY doc_id
        |           ORDER BY score_micro DESC, lang ASC) AS rn
        |  FROM sc) WHERE rn = 1""".stripMargin)),
    // Bucketed kNN graph: every vector's top-5 within its IVF bucket.
    Q("sim_knn_graph",
      (s, d) => Similarity.knnGraphIvf(emb(s, d), "embedding", "vec_id",
        k = 5, nCentroids = Similarity.sqrtCentroids(emb(s, d)), dim = 64),
      Some(s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
        |           FROM embeddings),
        |$sqrtCentroidsSql,
        |asg AS (SELECT vec_id, v, centroid_id AS bucket FROM (
        |  SELECT e.vec_id, e.v, c.centroid_id,
        |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |           list_dot_product(e.v, c.centv)
        |             /sqrt(list_dot_product(e.v, e.v))
        |             /sqrt(list_dot_product(c.centv, c.centv)) DESC,
        |           c.centroid_id ASC) AS rn
        |  FROM e, c) WHERE rn = 1),
        |sc AS (SELECT a.vec_id AS src_id, b.vec_id AS dst_id,
        |       list_dot_product(a.v, b.v)
        |         /sqrt(list_dot_product(a.v, a.v))
        |         /sqrt(list_dot_product(b.v, b.v)) AS cos
        |       FROM asg a JOIN asg b
        |         ON a.bucket = b.bucket AND a.vec_id != b.vec_id)
        |SELECT src_id, dst_id, rank FROM (
        |  SELECT src_id, dst_id,
        |         row_number() OVER (PARTITION BY src_id
        |           ORDER BY cos DESC, dst_id ASC) AS rank
        |  FROM sc) WHERE rank <= 5""".stripMargin)),
    // Hard-negative mining: cross-source neighbors from the in-bucket
    // kNN shortlist (shortlist=10 → top-5 survivors per src).
    Q("sim_hard_negatives",
      (s, d) => Similarity.hardNegatives(emb(s, d), docs(s, d),
        "embedding", "vec_id", "doc_id", "source",
        k = 5, shortlist = 10,
        nCentroids = Similarity.sqrtCentroids(emb(s, d)), dim = 64),
      Some(s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
        |           FROM embeddings),
        |$sqrtCentroidsSql,
        |asg AS (SELECT vec_id, v, centroid_id AS bucket FROM (
        |  SELECT e.vec_id, e.v, c.centroid_id,
        |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |           list_dot_product(e.v, c.centv)
        |             /sqrt(list_dot_product(e.v, e.v))
        |             /sqrt(list_dot_product(c.centv, c.centv)) DESC,
        |           c.centroid_id ASC) AS rn
        |  FROM e, c) WHERE rn = 1),
        |sc AS (SELECT a.vec_id AS src_id, b.vec_id AS dst_id,
        |       list_dot_product(a.v, b.v)
        |         /sqrt(list_dot_product(a.v, a.v))
        |         /sqrt(list_dot_product(b.v, b.v)) AS cos
        |       FROM asg a JOIN asg b
        |         ON a.bucket = b.bucket AND a.vec_id != b.vec_id),
        |shortlist AS (SELECT src_id, dst_id, rank FROM (
        |  SELECT src_id, dst_id,
        |         row_number() OVER (PARTITION BY src_id
        |           ORDER BY cos DESC, dst_id ASC) AS rank
        |  FROM sc) WHERE rank <= 10),
        |xg AS (SELECT s.src_id, s.dst_id, s.rank
        |       FROM shortlist s
        |       JOIN documents d1 ON d1.doc_id = s.src_id
        |       JOIN documents d2 ON d2.doc_id = s.dst_id
        |       WHERE d1.source != d2.source)
        |SELECT src_id, dst_id, neg_rank FROM (
        |  SELECT src_id, dst_id,
        |         row_number() OVER (PARTITION BY src_id
        |           ORDER BY rank ASC) AS neg_rank
        |  FROM xg) WHERE neg_rank <= 5""".stripMargin)),
    // Binary-signature Hamming retrieval: sign-bit quantization to two
    // 32-bit words, bit_count(xor) distance — exact integer math end
    // to end, no float parity concerns at all.
    Q("sim_hamming_topk",
      (s, d) => {
        val e = emb(s, d)
        Similarity.hammingTopK(e.where(col("vec_id") < 10), e,
          "embedding", "vec_id", k = 5)
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
        |           FROM embeddings),
        |sig AS (SELECT vec_id,
        |  CAST(list_sum([CASE WHEN v[i+1] > 0 THEN (1::BIGINT << i)
        |                      ELSE 0 END
        |                 for i in generate_series(0, 31)]) AS BIGINT)
        |    AS w0,
        |  CAST(list_sum([CASE WHEN v[i+33] > 0 THEN (1::BIGINT << i)
        |                      ELSE 0 END
        |                 for i in generate_series(0, 31)]) AS BIGINT)
        |    AS w1
        |  FROM e),
        |sc AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |       CAST(bit_count(xor(c.w0, q.w0)) +
        |            bit_count(xor(c.w1, q.w1)) AS BIGINT) AS hamming
        |       FROM sig q JOIN sig c ON q.vec_id != c.vec_id
        |       WHERE q.vec_id < 10)
        |SELECT query_id, neighbor_id, hamming, rank FROM (
        |  SELECT query_id, neighbor_id, hamming,
        |         row_number() OVER (PARTITION BY query_id
        |           ORDER BY hamming ASC, neighbor_id ASC) AS rank
        |  FROM sc) WHERE rank <= 5""".stripMargin)),
    // Deterministic export shuffle: md5-derived shard + in-shard rank.
    Q("curation_shuffle",
      (s, d) => Curation.deterministicShuffle(docs(s, d), "doc_id",
        seed = "s42", nShards = 16),
      Some("""WITH h AS (SELECT doc_id,
        |  md5('s42:' || coalesce(doc_id::VARCHAR, 'null')) AS k
        |  FROM documents),
        |s AS (SELECT doc_id, k,
        |      ('0x' || substr(k, 1, 6))::BIGINT % 16 AS shard FROM h)
        |SELECT doc_id, shard,
        |       row_number() OVER (PARTITION BY shard ORDER BY k, doc_id)
        |         AS pos
        |FROM s""".stripMargin)),
    // PMI collocation mining: rational pmi_ratio from exact integer
    // products (decimal² in Spark, HUGEINT in DuckDB) — identical
    // doubles on both engines.
    Q("text_collocations",
      (s, d) => TextAnalysis.collocations(docs(s, d), "text", "doc_id",
        minCount = 5L),
      Some("""WITH d AS (SELECT doc_id,
        |  list_filter(regexp_split_to_array(trim(text), '\s+'),
        |              w -> len(w) > 0) AS ws FROM documents),
        |t AS (SELECT unnest(ws) AS w FROM d),
        |uni AS (SELECT w, count(*) AS c_uni FROM t GROUP BY 1),
        |n AS (SELECT count(*) AS n_tokens FROM t),
        |bg AS (SELECT unnest([{'w1': ws[i], 'w2': ws[i+1]}
        |                      for i in generate_series(1, len(ws) - 1)],
        |                     recursive := true)
        |       FROM d WHERE len(ws) >= 2),
        |p AS (SELECT w1, w2, count(*) AS c_pair FROM bg GROUP BY 1, 2
        |      HAVING count(*) >= 5)
        |SELECT w1, w2, c_pair,
        |  round((p.c_pair::HUGEINT * n.n_tokens)::DOUBLE /
        |        (u1.c_uni::HUGEINT * u2.c_uni)::DOUBLE, 6) AS pmi_ratio
        |FROM p JOIN uni u1 ON u1.w = p.w1
        |       JOIN uni u2 ON u2.w = p.w2, n""".stripMargin)),
    // BPE tokenizer: train 20 merges on the corpus type table (driver
    // loop over a vocabulary-sized aggregate, like k-means centroids),
    // tokenize with the learned merges. Iterative-to-fixpoint — no SQL
    // re-expression exists, so this entry is rows-only; correctness is
    // spec-carried (hand-computed merges + invariants).
    Q("text_bpe_tokenize",
      (s, d) => {
        val dd = docs(s, d)
        val merges = Bpe.train(dd, "text", nMerges = 20)
        Bpe.tokenize(spread(dd.select("doc_id", "text"), "doc_id"),
          "text", "doc_id", merges)
      },
      Some(bpeOracleSql(20))),
    // Temperature (α=0.5) source mixing: sqrt-tempered weights,
    // integer-ized so Σw is exact; rates identical on both engines.
    Q("curation_temperature_mix",
      (s, d) => Curation.temperatureMixRates(docs(s, d), "source", "text",
        tokenBudget = 30000L),
      Some("""WITH s AS (SELECT source,
        |  len(regexp_split_to_array(trim(text), '\s+')) AS toks
        |  FROM documents),
        |a AS (SELECT source, CAST(sum(toks) AS BIGINT) AS n_tokens
        |      FROM s GROUP BY 1),
        |w AS (SELECT source, n_tokens,
        |      CAST(round(sqrt(n_tokens) * 1000000.0::DOUBLE) AS BIGINT)
        |        AS w_micro FROM a),
        |t AS (SELECT sum(w_micro) AS w_total FROM w)
        |SELECT source, n_tokens,
        |  round(least(1.0::DOUBLE,
        |    w_micro::DOUBLE / w_total * 30000 / n_tokens), 6) AS rate
        |FROM w, t""".stripMargin)),
    // Robust stats: exact per-stratum median + MAD (two sort-based
    // percentile passes; median table broadcasts back).
    // no spread (r17): the r16 pre-agg spread read REGRESSED on the r16
    // closing bench and the AbProbeR17 interleaved A/B (6 reps, one JVM,
    // sf0.1/32) adjudicated it NEUTRAL — spread min 0.593 / plain 0.578,
    // medians overlapping — so the extra exchange buys nothing here (the
    // decimal moment sums partial-aggregate fine from the scan's splits);
    // reverted per the s7_broadcast_changes neutral-spread precedent
    Q("a_robust_stats",
      (s, d) => graft.pipeline.Profile.robustStats(
        ChangeFeed.table(s, d, "lineitem")
          .select("l_orderkey", "l_returnflag", "l_quantity"),
        "l_returnflag", "l_quantity"),
      Some("""WITH v AS (SELECT l_returnflag, l_quantity::DOUBLE AS x
        |           FROM lineitem WHERE l_quantity IS NOT NULL),
        |m AS (SELECT l_returnflag, median(x) AS med FROM v GROUP BY 1),
        |d AS (SELECT v.l_returnflag, m.med, abs(v.x - m.med) AS ad
        |      FROM v JOIN m USING (l_returnflag))
        |SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |       round(max(med), 4) AS median, round(median(ad), 4) AS mad
        |FROM d GROUP BY 1""".stripMargin)),
    // Second end-to-end composition, entirely from this round's
    // operators: substring-dedup REWRITE → min-length gate →
    // temperature-tempered per-source rates (computed ON the cleaned
    // corpus, collected driver-side like the mixture solver) →
    // reproducible stratified sample. One oracle validates the
    // composition, not just the parts.
    Q("pipeline_curation_e2e_v2",
      (s, d) => {
        val dd = docs(s, d)
        val clean = Dedup.removeDuplicateSpans(dd, "text", "doc_id",
          spanN = 10, minOccurrences = 2)
        // persisted: this pipeline is the canonical two-pass shape —
        // pass 1 collects the source-level mix rates (metadata-sized),
        // pass 2 applies them — and without the persist BOTH passes
        // re-run the span-dedup subtree above (measured: the e2e cost
        // exactly 2× dedup_spans_removed). At corpus scale this is
        // MEMORY_AND_DISK-backed stats-then-apply, the standard Spark
        // idiom; the bench/verify harnesses clearCache per query.
        // the persist carries METADATA ONLY (r17): the output never uses
        // clean_text, and for kept rows tokenCount(clean_text) == n_kept
        // exactly (single-space-joined reassembly, n_kept ≥ 20 excludes
        // empties) — so the rates pass reads the carried count instead
        // of re-tokenizing the cached corpus, and the cache shrinks from
        // corpus-text-sized to id-sized
        val kept = clean
          .join(dd.select(col("doc_id"), col("source")), "doc_id")
          .withColumn("n_kept", col("n_tokens") - col("n_removed"))
          .where(col("n_kept") >= 20)
          .select(col("doc_id"), col("source"), col("n_kept"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val rates = Curation.temperatureMixRatesByCount(kept, "source",
            "n_kept", tokenBudget = 20000L)
          .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
        Curation.stratifiedSample(kept, "source", "doc_id", rates)
          .select(col("doc_id"), col("source"),
            col("n_kept").cast("long").as("n_kept"))
      },
      Some("""WITH w AS (SELECT doc_id,
        |  list_filter(regexp_split_to_array(trim(text), '\s+'),
        |              x -> len(x) > 0) AS ws FROM documents),
        |sp AS (SELECT doc_id,
        |       unnest([{'start': i,
        |                'h': md5(array_to_string(ws[i+1:i+10], ' '))}
        |               for i in generate_series(0, len(ws) - 10)],
        |              recursive := true)
        |       FROM w),
        |f AS (SELECT h, count(*) AS occ FROM sp GROUP BY 1),
        |cov AS (SELECT DISTINCT doc_id, start + dlt AS pos
        |        FROM sp JOIN f USING (h), generate_series(0, 9) g(dlt)
        |        WHERE occ >= 2),
        |tok AS (SELECT doc_id,
        |        unnest([{'pos': i - 1, 'w': ws[i]}
        |                for i in generate_series(1, len(ws))],
        |               recursive := true)
        |        FROM w),
        |kt AS (SELECT t.doc_id, t.pos FROM tok t
        |       LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.pos = c.pos
        |       WHERE c.pos IS NULL),
        |nk AS (SELECT w.doc_id, coalesce(k.n_kept, 0) AS n_kept
        |       FROM w LEFT JOIN (SELECT doc_id, count(*) AS n_kept
        |                         FROM kt GROUP BY 1) k USING (doc_id)),
        |kept AS (SELECT d.doc_id, d.source, nk.n_kept
        |         FROM documents d JOIN nk USING (doc_id)
        |         WHERE nk.n_kept >= 20),
        |agg AS (SELECT source, CAST(sum(n_kept) AS BIGINT) AS n_tokens
        |        FROM kept GROUP BY 1),
        |wm AS (SELECT source, n_tokens,
        |       CAST(round(sqrt(n_tokens) * 1000000.0::DOUBLE) AS BIGINT)
        |         AS w_micro FROM agg),
        |tt AS (SELECT sum(w_micro) AS w_total FROM wm),
        |rates AS (SELECT source,
        |          round(least(1.0::DOUBLE,
        |            w_micro::DOUBLE / w_total * 20000 / n_tokens), 6)
        |            AS rate FROM wm, tt)
        |SELECT k.doc_id, k.source, CAST(k.n_kept AS BIGINT) AS n_kept
        |FROM kept k JOIN rates r USING (source)
        |WHERE (('0x' || substr(md5(k.doc_id::VARCHAR), 1, 6))::BIGINT
        |       % 4096) < CAST(floor(r.rate * 4096) AS BIGINT)""".stripMargin)),
    // Derandomized A-Res weighted sampling: md5-uniform draws,
    // ln(u)/w priorities integer-ized at 1e-6, top-100 by priority.
    Q("curation_weighted_sample",
      (s, d) => Curation.weightedSample(docs(s, d), "doc_id", "n_chars",
        n = 100),
      Some("""WITH h AS (SELECT doc_id, n_chars,
        |  ((('0x' || substr(md5('ws:' || coalesce(doc_id::VARCHAR,
        |        'null')), 1, 6))::BIGINT % 4096) + 1)::DOUBLE / 4096 AS u
        |  FROM documents WHERE n_chars > 0)
        |SELECT doc_id, n_chars,
        |  CAST(round(ln(u) / n_chars * 1000000.0::DOUBLE) AS BIGINT)
        |    AS priority_micro
        |FROM h
        |ORDER BY priority_micro DESC, doc_id ASC LIMIT 100""".stripMargin)),
    // Per-source nucleus (top-p) selection by score mass: keep best
    // docs until ≥50% of each source's char mass is covered.
    Q("curation_top_p",
      (s, d) => Curation.topPByGroup(docs(s, d), "source", "doc_id",
        "n_chars", p = 0.5),
      Some("""WITH c AS (SELECT source, doc_id, n_chars,
        |  sum(n_chars) OVER (PARTITION BY source
        |    ORDER BY n_chars DESC, doc_id ASC
        |    ROWS UNBOUNDED PRECEDING) AS cum,
        |  sum(n_chars) OVER (PARTITION BY source) AS tot
        |  FROM documents)
        |SELECT source, doc_id, n_chars, CAST(cum AS BIGINT) AS cum_score
        |FROM c
        |WHERE (cum - n_chars)::DOUBLE < 0.5::DOUBLE * tot""".stripMargin)),
    // Logistic linear probe on embeddings: train on even vec_ids
    // (positive = label < 5), score the held-out half. ONE pinned
    // gradient step (round-13, closing the rows-only gap): from w = 0
    // the sigmoid is exactly 0.5, the gradient sums are already
    // 1e-6-integer-ized (order-free), and the weight update / scoring
    // arithmetic is a fixed op sequence — so the whole step replays
    // bit-for-bit in DuckDB. Multi-step convergence stays spec-carried
    // on separable data (ClassifierSpec); iterations change values,
    // not the associativity story.
    Q("sim_linear_probe",
      (s, d) => {
        val e = emb(s, d)
        Classifier.linearProbe(
          e.where(pmod(col("vec_id"), lit(2)) === 0),
          e.where(pmod(col("vec_id"), lit(2)) === 1),
          "embedding", "vec_id", positive = col("label") < 5, dim = 64,
          iters = 1)
      },
      Some("""WITH tr AS (SELECT embedding::DOUBLE[] AS x,
        |        CASE WHEN label < 5 THEN 1.0 ELSE 0.0 END AS y
        |      FROM embeddings WHERE vec_id % 2 = 0),
        |nn AS (SELECT count(*)::DOUBLE AS n FROM tr),
        |gr AS (SELECT pos,
        |         sum(CAST(round((0.5 - y) * xv * 1000000.0) AS BIGINT)) AS s
        |       FROM (SELECT y, unnest(
        |           [{pos: i, xv: x[i]} for i in generate_series(1, 64)]
        |             || [{pos: 65, xv: 1.0}],
        |           recursive := true) FROM tr)
        |       GROUP BY pos),
        |w AS (SELECT pos,
        |        0 - ((2.0 * (s::DOUBLE / 1000000.0)) / (SELECT n FROM nn)) AS wj
        |      FROM gr),
        |wvec AS (SELECT list(wj ORDER BY pos) AS wl FROM w WHERE pos <= 64),
        |wb AS (SELECT wj AS b FROM w WHERE pos = 65),
        |te AS (SELECT vec_id, embedding::DOUBLE[] AS x,
        |        CASE WHEN label < 5 THEN 1.0 ELSE 0.0 END AS y
        |       FROM embeddings WHERE vec_id % 2 = 1),
        |sc AS (SELECT vec_id, y,
        |        1.0 / (1.0 + exp(-(list_dot_product(x, (SELECT wl FROM wvec))
        |          + (SELECT b FROM wb)))) AS p
        |       FROM te)
        |SELECT vec_id, y,
        |  CAST(round(p * 1000000.0) AS BIGINT) AS score_micro,
        |  p >= 0.5 AS predicted
        |FROM sc""".stripMargin)),
    // Trailing-window rate anomaly: per (user, day) event count vs the
    // mean of the user's previous ≤7 OBSERVED days; spike = n > 2×mean.
    // Exact integer counts; the one rational mean is computed from
    // identical exact inputs in both engines.
    Q("a_rate_anomaly",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = ChangeFeed.table(s, d, "events")
        val daily = ev.groupBy(col("user_id"),
            to_date(col("ts")).cast("string").as("day"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("user_id").orderBy("day")
          .rowsBetween(-7, -1)
        daily
          .withColumn("trail_sum", sum(col("n")).over(w))
          .withColumn("trail_days", count(col("n")).over(w))
          .where(col("trail_days") > 0)
          .select(col("user_id"), col("day"), col("n"),
            round(col("trail_sum").cast("double") / col("trail_days"), 6)
              .as("trail_mean"),
            (col("n").cast("double") >
              lit(2.0) * (col("trail_sum").cast("double") /
                col("trail_days"))).as("spike"))
      },
      Some("""WITH daily AS (SELECT user_id,
        |  CAST(CAST(ts AS DATE) AS VARCHAR) AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT user_id, day, n,
        |      sum(n) OVER (PARTITION BY user_id ORDER BY day
        |        ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS ts,
        |      count(n) OVER (PARTITION BY user_id ORDER BY day
        |        ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS td
        |      FROM daily)
        |SELECT user_id, day, CAST(n AS BIGINT) AS n,
        |       round(ts::DOUBLE / td, 6) AS trail_mean,
        |       n::DOUBLE > 2.0::DOUBLE * (ts::DOUBLE / td) AS spike
        |FROM t WHERE td > 0""".stripMargin)),
    // Semi-structured rollup: JSON props parsed per row, aggregated by
    // the extracted key bucket — get_json_object ↔ json_extract.
    Q("a_props_rollup",
      (s, d) => ChangeFeed.table(s, d, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .where(col("k").isNotNull)
        .groupBy(col("event_type"), (col("k") % 10).as("k_bucket"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k")),
      Some("""SELECT event_type,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) % 10
        |    AS k_bucket,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |    AS BIGINT) AS sum_k
        |FROM events
        |WHERE json_extract_string(props, '$.k') IS NOT NULL
        |GROUP BY 1, 2""".stripMargin)),
    // CUBE rollup: every (lang, source) subtotal combination in one
    // pass — Spark's native cube ↔ DuckDB GROUP BY CUBE, with the
    // standard GROUPING bitmask disambiguating subtotal NULLs.
    Q("a_cube",
      // token count bound BEFORE the cube: words() is EvalOnce-fenced
      // (nondeterministic marker), which aggregate functions reject —
      // and binding it is the cheaper plan anyway (one tokenize per row
      // feeding all cube groupings)
      (s, d) => docs(s, d)
        .withColumn("_n_tok", TextAnalysis.tokenCount(col("text")))
        .cube(col("lang"), col("source"))
        .agg(grouping_id().as("gid"),
          count(lit(1)).as("n_docs"),
          sum(col("_n_tok")).as("n_tokens")),
      Some("""SELECT lang, source,
        |  CAST(GROUPING(lang, source) AS BIGINT) AS gid,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(regexp_split_to_array(trim(text), '\s+')))
        |    AS BIGINT) AS n_tokens
        |FROM documents GROUP BY CUBE (lang, source)""".stripMargin)),
    // Cohort retention: users bucketed by first-seen day, distinct
    // actives per (cohort, day-age). Two user-keyed aggregates; the
    // first-seen join is co-partitioned with the activity distinct.
    Q("a_cohorts",
      (s, d) => {
        val ev = ChangeFeed.table(s, d, "events")
        val first = ev.groupBy(col("user_id"))
          .agg(min(to_date(col("ts"))).as("cohort"))
        ev.select(col("user_id"), to_date(col("ts")).as("d")).distinct()
          .join(first, "user_id")
          .groupBy(col("cohort"),
            datediff(col("d"), col("cohort")).cast("long").as("age"))
          .agg(countDistinct(col("user_id")).as("n_users"))
          .withColumn("cohort", col("cohort").cast("string"))
      },
      Some("""WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort
        |           FROM events GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
        |SELECT CAST(cohort AS VARCHAR) AS cohort,
        |       CAST(date_diff('day', cohort, d) AS BIGINT) AS age,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM a JOIN f USING (user_id) GROUP BY 1, 2""".stripMargin)),
    // Exact-sum Pearson r per returnflag over 1e-6-quantized values.
    Q("a_corr",
      // pre-agg spread (r16, guide §2): the five exact-decimal moment
      // sums run in the PARTIAL aggregation below the exchange — one
      // task for a one-split 600k-row lineitem. The spread shuffles the
      // narrow 3-column projection; no-op at corpus split counts.
      (s, d) => graft.pipeline.Profile.correlation(
        spread(ChangeFeed.table(s, d, "lineitem")
          .select("l_orderkey", "l_returnflag", "l_quantity",
            "l_extendedprice"), "l_orderkey"),
        "l_returnflag", "l_quantity", "l_extendedprice"),
      Some("""WITH q AS (SELECT l_returnflag,
        |  CAST(round(l_quantity * 1000000.0::DOUBLE) AS BIGINT) AS xi,
        |  CAST(round(l_extendedprice * 1000000.0::DOUBLE) AS BIGINT) AS yi
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
        |a AS (SELECT l_returnflag, count(*) AS n,
        |      sum(xi::HUGEINT) AS sx, sum(yi::HUGEINT) AS sy,
        |      sum(xi::HUGEINT * yi) AS sxy,
        |      sum(xi::HUGEINT * xi) AS sxx,
        |      sum(yi::HUGEINT * yi) AS syy
        |      FROM q GROUP BY 1)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
        |  round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE) /
        |        sqrt(n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) /
        |        sqrt(n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE),
        |        6) AS r
        |FROM a""".stripMargin)))

  private val auditQueries: Seq[Q] = Seq(
    // Data-contract audit: 5 rules over events in ONE scan (one
    // conditional sum per rule inside a single aggregate), unpivoted to
    // a report row per rule. NULL predicate results count as violations.
    Q("a_expectations",
      (s, d) => graft.pipeline.Profile.expectations(
        ChangeFeed.table(s, d, "events"),
        Seq(
          graft.pipeline.Profile.Expectation("value", "not_null",
            col("value").isNotNull),
          graft.pipeline.Profile.Expectation("value", "non_negative",
            col("value") >= 0.0),
          graft.pipeline.Profile.Expectation("value", "below_400",
            col("value") < 400.0),
          graft.pipeline.Profile.Expectation("event_type", "snake_case",
            col("event_type").rlike("^[a-z_]+$")),
          graft.pipeline.Profile.Expectation("props", "has_json_k",
            get_json_object(col("props"), "$.k").isNotNull))),
      Some("""WITH a AS (SELECT count(*) AS n,
        |  sum(CASE WHEN NOT coalesce(value IS NOT NULL, false)
        |      THEN 1 ELSE 0 END) AS v0,
        |  sum(CASE WHEN NOT coalesce(value >= 0.0::DOUBLE, false)
        |      THEN 1 ELSE 0 END) AS v1,
        |  sum(CASE WHEN NOT coalesce(value < 400.0::DOUBLE, false)
        |      THEN 1 ELSE 0 END) AS v2,
        |  sum(CASE WHEN NOT coalesce(regexp_matches(event_type,
        |      '^[a-z_]+$'), false) THEN 1 ELSE 0 END) AS v3,
        |  sum(CASE WHEN NOT coalesce(json_extract_string(props, '$.k')
        |      IS NOT NULL, false) THEN 1 ELSE 0 END) AS v4
        |  FROM events)
        |SELECT column_name, rule, CAST(n AS BIGINT) AS n_rows,
        |       CAST(v AS BIGINT) AS n_violations,
        |       round(v::DOUBLE / n, 6) AS violation_rate
        |FROM (SELECT 'value' AS column_name, 'not_null' AS rule, n,
        |             v0 AS v FROM a
        |      UNION ALL SELECT 'value', 'non_negative', n, v1 FROM a
        |      UNION ALL SELECT 'value', 'below_400', n, v2 FROM a
        |      UNION ALL SELECT 'event_type', 'snake_case', n, v3 FROM a
        |      UNION ALL SELECT 'props', 'has_json_k', n, v4 FROM a)"""
        .stripMargin)),
    // PSI distribution drift per event_type: baseline = even event_ids,
    // current = odd; floor(value) div 50 bins; add-one smoothing over
    // the observed-bin union; each (p−q)·ln(p/q) term integer-ized at
    // 1e-6 right after the single ln, totals are exact BIGINT sums.
    Q("a_drift_psi",
      (s, d) => graft.pipeline.Profile.psiDrift(
        ChangeFeed.table(s, d, "events")
          .withColumn("v", floor(col("value")).cast("long")),
        "event_type", "v",
        baselinePred = pmod(col("event_id"), lit(2)) === 0,
        binWidth = 50L),
      Some("""WITH b AS (SELECT event_type,
        |  CAST(floor(value) AS BIGINT) // 50 AS bin,
        |  CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END AS isb
        |  FROM events WHERE value IS NOT NULL),
        |c AS (SELECT event_type, bin, sum(isb) AS nb,
        |      sum(1 - isb) AS nc FROM b GROUP BY 1, 2),
        |t AS (SELECT event_type, nb, nc,
        |      sum(nb) OVER (PARTITION BY event_type) AS tb,
        |      sum(nc) OVER (PARTITION BY event_type) AS tc,
        |      count(*) OVER (PARTITION BY event_type) AS k
        |      FROM c),
        |m AS (SELECT event_type, nb, nc,
        |      (nb::DOUBLE + 1.0::DOUBLE) / (tb + k)::DOUBLE AS p,
        |      (nc::DOUBLE + 1.0::DOUBLE) / (tc + k)::DOUBLE AS q
        |      FROM t)
        |SELECT event_type, CAST(sum(nb) AS BIGINT) AS n_base,
        |       CAST(sum(nc) AS BIGINT) AS n_current,
        |       CAST(sum(CAST(round((p - q) * ln(p / q) * 1000000.0::DOUBLE)
        |         AS BIGINT)) AS BIGINT) AS psi_micros,
        |       CAST(sum(CAST(round((p - q) * ln(p / q) * 1000000.0::DOUBLE)
        |         AS BIGINT)) AS BIGINT) > 200000 AS drifted
        |FROM m GROUP BY 1""".stripMargin)),
    // Trailing EWMA with α = 1/2 (depth 8): every weight is a power of
    // two, so each product is IEEE-exact and the fixed left-assoc sum is
    // bit-identical cross-engine. Deliberately NOT rounded: 2-decimal
    // inputs × binary weights land exactly on .5e-6 decimal boundaries,
    // where the engines' round() implementations disagree (measured);
    // the raw doubles themselves are identical.
    Q("a_ewma",
      (s, d) => graft.rates.Rates.ewmaTrailing(
          ChangeFeed.table(s, d, "events"),
          "user_id", "ts", "event_id", "value", depth = 8)
        .select(col("user_id"), col("event_id"), col("value"),
          col("ewma")),
      Some("""SELECT user_id, event_id, value,
        |  coalesce(value, 0.0::DOUBLE) * 0.5::DOUBLE
        |    + coalesce(lag(value, 1) OVER w, 0.0::DOUBLE) * 0.25::DOUBLE
        |    + coalesce(lag(value, 2) OVER w, 0.0::DOUBLE) * 0.125::DOUBLE
        |    + coalesce(lag(value, 3) OVER w, 0.0::DOUBLE) * 0.0625::DOUBLE
        |    + coalesce(lag(value, 4) OVER w, 0.0::DOUBLE)
        |      * 0.03125::DOUBLE
        |    + coalesce(lag(value, 5) OVER w, 0.0::DOUBLE)
        |      * 0.015625::DOUBLE
        |    + coalesce(lag(value, 6) OVER w, 0.0::DOUBLE)
        |      * 0.0078125::DOUBLE
        |    + coalesce(lag(value, 7) OVER w, 0.0::DOUBLE)
        |      * 0.00390625::DOUBLE AS ewma
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"""
        .stripMargin)),
    // PageRank centrality over the Hamming kNN graph of a 1-in-10
    // embedding sample — representative-document selection. 5 fixed
    // iterations, ALL rank arithmetic in exact integer PER-NODE micros
    // (uniform rank = 10^6 at any graph size — the r16 law; the old
    // total-mass units floored to zero past 150k nodes) with the
    // overflow-safe two-term floor, so ranks are bit-identical on any
    // engine/partitioning; the oracle unrolls the iterations as
    // chained CTEs.
    Q("sim_pagerank",
      (s, d) => {
        val sample = emb(s, d).where(pmod(col("vec_id"), lit(10)) === 0)
        val edges = Similarity.hammingTopK(sample, sample,
          "embedding", "vec_id", k = 5)
        graft.pipeline.Graph.pageRank(edges, "query_id", "neighbor_id",
          iters = 5)
      },
      Some("""WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v
        |           FROM embeddings WHERE vec_id % 10 = 0),
        |sig AS (SELECT vec_id,
        |  CAST(list_sum([CASE WHEN v[i+1] > 0 THEN (1::BIGINT << i)
        |                      ELSE 0 END
        |                 for i in generate_series(0, 31)]) AS BIGINT)
        |    AS w0,
        |  CAST(list_sum([CASE WHEN v[i+33] > 0 THEN (1::BIGINT << i)
        |                      ELSE 0 END
        |                 for i in generate_series(0, 31)]) AS BIGINT)
        |    AS w1
        |  FROM e0),
        |sc AS (SELECT q.vec_id AS src, c.vec_id AS dst,
        |       bit_count(xor(c.w0, q.w0)) +
        |       bit_count(xor(c.w1, q.w1)) AS h
        |       FROM sig q JOIN sig c ON q.vec_id != c.vec_id),
        |e AS (SELECT src, dst FROM (
        |    SELECT src, dst, row_number() OVER (PARTITION BY src
        |      ORDER BY h ASC, dst ASC) AS rk FROM sc) WHERE rk <= 5),
        |nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
        |nn AS (SELECT count(*) AS n FROM nodes),
        |deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
        |r0 AS (SELECT id, 1000000 AS r FROM nodes),
        |c1 AS (SELECT e.dst AS id,
        |       sum(850000 * (r.r // (1000000 * d.outdeg))
        |           + (850000 * ((r.r % (1000000 * d.outdeg)) // d.outdeg))
        |             // 1000000) AS s
        |       FROM e JOIN r0 r ON e.src = r.id
        |       JOIN deg d ON e.src = d.src GROUP BY 1),
        |r1 AS (SELECT n.id,
        |       150000 + coalesce(c1.s, 0) AS r
        |       FROM nodes n LEFT JOIN c1 USING (id)),
        |c2 AS (SELECT e.dst AS id,
        |       sum(850000 * (r.r // (1000000 * d.outdeg))
        |           + (850000 * ((r.r % (1000000 * d.outdeg)) // d.outdeg))
        |             // 1000000) AS s
        |       FROM e JOIN r1 r ON e.src = r.id
        |       JOIN deg d ON e.src = d.src GROUP BY 1),
        |r2 AS (SELECT n.id,
        |       150000 + coalesce(c2.s, 0) AS r
        |       FROM nodes n LEFT JOIN c2 USING (id)),
        |c3 AS (SELECT e.dst AS id,
        |       sum(850000 * (r.r // (1000000 * d.outdeg))
        |           + (850000 * ((r.r % (1000000 * d.outdeg)) // d.outdeg))
        |             // 1000000) AS s
        |       FROM e JOIN r2 r ON e.src = r.id
        |       JOIN deg d ON e.src = d.src GROUP BY 1),
        |r3 AS (SELECT n.id,
        |       150000 + coalesce(c3.s, 0) AS r
        |       FROM nodes n LEFT JOIN c3 USING (id)),
        |c4 AS (SELECT e.dst AS id,
        |       sum(850000 * (r.r // (1000000 * d.outdeg))
        |           + (850000 * ((r.r % (1000000 * d.outdeg)) // d.outdeg))
        |             // 1000000) AS s
        |       FROM e JOIN r3 r ON e.src = r.id
        |       JOIN deg d ON e.src = d.src GROUP BY 1),
        |r4 AS (SELECT n.id,
        |       150000 + coalesce(c4.s, 0) AS r
        |       FROM nodes n LEFT JOIN c4 USING (id)),
        |c5 AS (SELECT e.dst AS id,
        |       sum(850000 * (r.r // (1000000 * d.outdeg))
        |           + (850000 * ((r.r % (1000000 * d.outdeg)) // d.outdeg))
        |             // 1000000) AS s
        |       FROM e JOIN r4 r ON e.src = r.id
        |       JOIN deg d ON e.src = d.src GROUP BY 1),
        |r5 AS (SELECT n.id,
        |       150000 + coalesce(c5.s, 0) AS r
        |       FROM nodes n LEFT JOIN c5 USING (id))
        |SELECT id, CAST(r AS BIGINT) AS rank_micros FROM r5"""
        .stripMargin)),
    // nDCG@10 of the BM25 ranking against deterministic graded labels
    // (rel = doc_id mod 4): retrieval evaluation as a first-class op.
    // Each (2^rel−1)/log2(i+1) term integer-izes at 1e-6 right after
    // the one log2; DCG/IDCG are exact BIGINT sums.
    Q("text_ndcg",
      (s, d) => {
        val dd = docs(s, d)
        val ranked = Retrieval.bm25TopK(dd, "text", "doc_id",
            Seq("spark", "window", "merge"), k = 10)
          .withColumn("rel", pmod(col("doc_id"), lit(4)))
        Retrieval.ndcgAtK(ranked, "rank", "rel",
          dd.select(col("doc_id"),
            pmod(col("doc_id"), lit(4)).as("rel")), "doc_id", k = 10)
      },
      Some("""WITH d AS (SELECT doc_id,
        |  list_filter(regexp_split_to_array(trim(text), '\s+'),
        |              w -> len(w) > 0) AS ws FROM documents),
        |dd AS (SELECT doc_id, len(ws) AS dl, ws FROM d),
        |st AS (SELECT count(*) AS n_docs,
        |       sum(dl)::DOUBLE / count(*) AS avgdl FROM dd),
        |t AS (SELECT doc_id, dl, unnest(ws) AS w FROM dd),
        |qtf AS (SELECT doc_id, dl, w, count(*) AS tf FROM t
        |        WHERE w IN ('spark', 'window', 'merge') GROUP BY 1, 2, 3),
        |dfreq AS (SELECT w, count(DISTINCT doc_id) AS df_t FROM qtf
        |          GROUP BY 1),
        |sc AS (SELECT doc_id, w,
        |       CAST(round((n_docs - df_t + 0.5::DOUBLE) /
        |           (df_t + 0.5::DOUBLE) *
        |           (tf * (1.2::DOUBLE + 1.0::DOUBLE)) /
        |           (tf + 1.2::DOUBLE *
        |             (1.0::DOUBLE - 0.75::DOUBLE +
        |              0.75::DOUBLE * dl / avgdl)) *
        |           1000000.0::DOUBLE) AS BIGINT) AS micro
        |       FROM qtf JOIN dfreq USING (w), st),
        |agg AS (SELECT doc_id, CAST(sum(micro) AS BIGINT) AS score_micro
        |        FROM sc GROUP BY 1),
        |bm AS (SELECT doc_id, rank FROM (
        |  SELECT doc_id, row_number() OVER (ORDER BY score_micro DESC,
        |    doc_id ASC) AS rank FROM agg) WHERE rank <= 10),
        |dcg AS (SELECT CAST(sum(CAST(round(
        |    ((1::BIGINT << CAST(doc_id % 4 AS INT)) - 1)::DOUBLE
        |    / (ln(rank::DOUBLE + 1.0::DOUBLE) / ln(2.0::DOUBLE))
        |    * 1000000.0::DOUBLE) AS BIGINT)) AS BIGINT) AS dcg_micros
        |  FROM bm),
        |ir AS (SELECT doc_id % 4 AS rel FROM documents
        |       ORDER BY rel DESC, doc_id ASC LIMIT 10),
        |ir2 AS (SELECT rel, row_number() OVER (ORDER BY rel DESC)
        |          AS rank FROM ir),
        |idcg AS (SELECT CAST(sum(CAST(round(
        |    ((1::BIGINT << CAST(rel AS INT)) - 1)::DOUBLE
        |    / (ln(rank::DOUBLE + 1.0::DOUBLE) / ln(2.0::DOUBLE))
        |    * 1000000.0::DOUBLE) AS BIGINT)) AS BIGINT) AS idcg_micros
        |  FROM ir2)
        |SELECT CAST(10 AS BIGINT) AS k, dcg_micros, idcg_micros,
        |       round(dcg_micros::DOUBLE / idcg_micros::DOUBLE, 6) AS ndcg
        |FROM dcg, idcg""".stripMargin)),
    // Curriculum schedule: exact global rank by token-count difficulty
    // (two-phase, never a one-partition window) cut into 10 rank-equal
    // bands; the explicit ((rank−1)·n) div N band rule is engine-
    // portable (ntile's remainder policy is not mirrored here).
    Q("curation_curriculum",
      (s, d) => Curation.curriculumBins(
        docs(s, d).select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("difficulty")),
        "difficulty", "doc_id", nBins = 10),
      Some("""WITH s AS (SELECT doc_id,
        |  len(regexp_split_to_array(trim(text), '\s+')) AS score
        |  FROM documents),
        |nn AS (SELECT count(*) AS n FROM s),
        |r AS (SELECT doc_id, score,
        |      row_number() OVER (ORDER BY score, doc_id) AS rn FROM s)
        |SELECT ((rn - 1) * 10) // (SELECT n FROM nn) AS bin,
        |       CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(min(score) AS BIGINT) AS min_score,
        |       CAST(max(score) AS BIGINT) AS max_score,
        |       CAST(sum(score) AS BIGINT) AS sum_score
        |FROM r GROUP BY 1""".stripMargin)),
    // Deterministic round-robin source interleave: per-source md5-rank,
    // then the global position visits rank 1 of each source, rank 2, …
    // Spark computes pos CLOSED-FORM from the |sources|-row count table
    // (no global window); the oracle states the same order as one
    // row_number over (src_rank, source).
    Q("curation_interleave",
      (s, d) => Curation.interleaveSources(docs(s, d), "source",
        "doc_id", seed = "s7"),
      Some("""WITH h AS (SELECT doc_id, source,
        |  md5('s7:' || coalesce(doc_id::VARCHAR, 'null')) AS k
        |  FROM documents),
        |r AS (SELECT doc_id, source,
        |      CAST(row_number() OVER (PARTITION BY source
        |        ORDER BY k, doc_id) AS BIGINT) AS src_rank FROM h)
        |SELECT doc_id, source, src_rank,
        |       CAST(row_number() OVER (ORDER BY src_rank, source)
        |         AS BIGINT) AS pos
        |FROM r""".stripMargin)),
    // Per-doc unigram entropy (template/boilerplate detector): each
    // p·ln(p) term integer-ized at 1e-6 after the one ln; the doc total
    // is an exact BIGINT sum negated at the end in BOTH engines.
    Q("text_entropy",
      (s, d) => TextAnalysis.tokenEntropy(docs(s, d), "text", "doc_id"),
      Some("""WITH w AS (SELECT doc_id,
        |  list_filter(regexp_split_to_array(trim(text), '\s+'),
        |              x -> len(x) > 0) AS ws FROM documents),
        |t AS (SELECT doc_id, unnest(ws) AS w FROM w),
        |c AS (SELECT doc_id, w, count(*) AS c FROM t GROUP BY 1, 2),
        |n AS (SELECT doc_id, w, c,
        |      sum(c) OVER (PARTITION BY doc_id) AS n FROM c),
        |m AS (SELECT doc_id, n, c::DOUBLE / n::DOUBLE AS p FROM n)
        |SELECT doc_id, CAST(max(n) AS BIGINT) AS n_tokens,
        |       CAST(count(*) AS BIGINT) AS n_types,
        |       CAST(-sum(CAST(round(p * ln(p) * 1000000.0::DOUBLE)
        |         AS BIGINT)) AS BIGINT) AS entropy_micros
        |FROM m GROUP BY 1""".stripMargin)),
    // Reciprocal-rank fusion of two BM25 rankings (different query
    // intents) — the train-free lexical+dense combiner. Each 1/(60+r)
    // contribution integer-izes at 1e-6; totals are exact BIGINT sums;
    // the fused rank ties on doc_id.
    Q("text_rrf",
      (s, d) => {
        val dd = docs(s, d)
        Retrieval.rrfFusion(Seq(
            Retrieval.bm25TopK(dd, "text", "doc_id",
              Seq("spark", "window", "merge"), k = 20),
            Retrieval.bm25TopK(dd, "text", "doc_id",
              Seq("data", "stream"), k = 20)),
          "doc_id", "rank", k = 15)
      },
      Some("""WITH d AS (SELECT doc_id,
        |  list_filter(regexp_split_to_array(trim(text), '\s+'),
        |              w -> len(w) > 0) AS ws FROM documents),
        |dd AS (SELECT doc_id, len(ws) AS dl, ws FROM d),
        |st AS (SELECT count(*) AS n_docs,
        |       sum(dl)::DOUBLE / count(*) AS avgdl FROM dd),
        |t AS (SELECT doc_id, dl, unnest(ws) AS w FROM dd),
        |qtf1 AS (SELECT doc_id, dl, w, count(*) AS tf FROM t
        |        WHERE w IN ('spark', 'window', 'merge') GROUP BY 1, 2, 3),
        |dfreq1 AS (SELECT w, count(DISTINCT doc_id) AS df_t FROM qtf1
        |          GROUP BY 1),
        |sc1 AS (SELECT doc_id,
        |       CAST(round((n_docs - df_t + 0.5::DOUBLE) /
        |           (df_t + 0.5::DOUBLE) *
        |           (tf * (1.2::DOUBLE + 1.0::DOUBLE)) /
        |           (tf + 1.2::DOUBLE *
        |             (1.0::DOUBLE - 0.75::DOUBLE +
        |              0.75::DOUBLE * dl / avgdl)) *
        |           1000000.0::DOUBLE) AS BIGINT) AS micro
        |       FROM qtf1 JOIN dfreq1 USING (w), st),
        |agg1 AS (SELECT doc_id, sum(micro) AS score FROM sc1 GROUP BY 1),
        |bm1 AS (SELECT doc_id, rank FROM (
        |  SELECT doc_id, row_number() OVER (ORDER BY score DESC,
        |    doc_id ASC) AS rank FROM agg1) WHERE rank <= 20),
        |qtf2 AS (SELECT doc_id, dl, w, count(*) AS tf FROM t
        |        WHERE w IN ('data', 'stream') GROUP BY 1, 2, 3),
        |dfreq2 AS (SELECT w, count(DISTINCT doc_id) AS df_t FROM qtf2
        |          GROUP BY 1),
        |sc2 AS (SELECT doc_id,
        |       CAST(round((n_docs - df_t + 0.5::DOUBLE) /
        |           (df_t + 0.5::DOUBLE) *
        |           (tf * (1.2::DOUBLE + 1.0::DOUBLE)) /
        |           (tf + 1.2::DOUBLE *
        |             (1.0::DOUBLE - 0.75::DOUBLE +
        |              0.75::DOUBLE * dl / avgdl)) *
        |           1000000.0::DOUBLE) AS BIGINT) AS micro
        |       FROM qtf2 JOIN dfreq2 USING (w), st),
        |agg2 AS (SELECT doc_id, sum(micro) AS score FROM sc2 GROUP BY 1),
        |bm2 AS (SELECT doc_id, rank FROM (
        |  SELECT doc_id, row_number() OVER (ORDER BY score DESC,
        |    doc_id ASC) AS rank FROM agg2) WHERE rank <= 20),
        |u AS (SELECT doc_id, CAST(round(1000000.0::DOUBLE /
        |        (60.0::DOUBLE + rank::DOUBLE)) AS BIGINT) AS m FROM bm1
        |      UNION ALL
        |      SELECT doc_id, CAST(round(1000000.0::DOUBLE /
        |        (60.0::DOUBLE + rank::DOUBLE)) AS BIGINT) AS m FROM bm2),
        |f AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lists,
        |      CAST(sum(m) AS BIGINT) AS rrf_micros FROM u GROUP BY 1)
        |SELECT doc_id, n_lists, rrf_micros, rank FROM (
        |  SELECT doc_id, n_lists, rrf_micros,
        |         row_number() OVER (ORDER BY rrf_micros DESC, doc_id ASC)
        |           AS rank FROM f) WHERE rank <= 15""".stripMargin)),
    // Pairwise source vocabulary Jaccard — corpus-mixing diagnostic.
    // Exact integer set sizes + inclusion–exclusion; the shuffle unit
    // is the distinct (source, token) set, never the corpus.
    Q("text_source_overlap",
      (s, d) => TextAnalysis.sourceVocabOverlap(docs(s, d), "source",
        "text"),
      Some("""WITH v AS (SELECT DISTINCT source AS s,
        |  unnest(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |         x -> len(x) > 0)) AS w FROM documents),
        |sz AS (SELECT s, count(*) AS n FROM v GROUP BY 1),
        |p AS (SELECT a.s AS source_a, b.s AS source_b,
        |      count(*) AS n_common
        |      FROM v a JOIN v b ON a.w = b.w AND a.s < b.s GROUP BY 1, 2)
        |SELECT source_a, source_b,
        |       CAST(sa.n AS BIGINT) AS v_a, CAST(sb.n AS BIGINT) AS v_b,
        |       CAST(n_common AS BIGINT) AS n_common,
        |       round(n_common::DOUBLE /
        |         (sa.n + sb.n - n_common)::DOUBLE, 6) AS jaccard
        |FROM p JOIN sz sa ON p.source_a = sa.s
        |       JOIN sz sb ON p.source_b = sb.s""".stripMargin)),
    // Third e2e composition, over THIS round's operators: exact dedup →
    // entropy + length gate → deterministic round-robin interleave of
    // the survivors into one training order. One oracle validates the
    // composed lazy plan end to end (thresholds are exact-integer
    // comparisons — no float margins anywhere in the chain).
    Q("pipeline_curation_e2e_v3",
      (s, d) => {
        val dd = docs(s, d)
        val surv = dd.join(
          Dedup.exactSurvivors(dd, "text", "doc_id").select("doc_id"),
          "doc_id")
        val keep = TextAnalysis.tokenEntropy(surv, "text", "doc_id")
          .where(col("entropy_micros") >= 3000000L &&
            col("n_tokens") >= 10L)
          .select("doc_id")
        Curation.interleaveSources(surv.join(keep, "doc_id"), "source",
          "doc_id", seed = "v3")
      },
      Some("""WITH dg AS (SELECT doc_id, source, text FROM documents),
        |keep AS (SELECT min(doc_id) AS doc_id FROM dg GROUP BY md5(text)),
        |surv AS (SELECT d.doc_id, d.source, d.text
        |         FROM dg d JOIN keep USING (doc_id)),
        |w AS (SELECT doc_id,
        |  list_filter(regexp_split_to_array(trim(text), '\s+'),
        |              x -> len(x) > 0) AS ws FROM surv),
        |t AS (SELECT doc_id, unnest(ws) AS w FROM w),
        |c AS (SELECT doc_id, w, count(*) AS c FROM t GROUP BY 1, 2),
        |n AS (SELECT doc_id, w, c,
        |      sum(c) OVER (PARTITION BY doc_id) AS n FROM c),
        |m AS (SELECT doc_id, n, c::DOUBLE / n::DOUBLE AS p FROM n),
        |e AS (SELECT doc_id, max(n) AS n_tokens,
        |      -sum(CAST(round(p * ln(p) * 1000000.0::DOUBLE) AS BIGINT))
        |        AS entropy_micros
        |      FROM m GROUP BY 1),
        |g AS (SELECT s.doc_id, s.source FROM surv s JOIN e USING (doc_id)
        |      WHERE e.entropy_micros >= 3000000 AND e.n_tokens >= 10),
        |h AS (SELECT doc_id, source,
        |      md5('v3:' || coalesce(doc_id::VARCHAR, 'null')) AS k FROM g),
        |r AS (SELECT doc_id, source,
        |      CAST(row_number() OVER (PARTITION BY source
        |        ORDER BY k, doc_id) AS BIGINT) AS src_rank FROM h)
        |SELECT doc_id, source, src_rank,
        |       CAST(row_number() OVER (ORDER BY src_rank, source)
        |         AS BIGINT) AS pos
        |FROM r""".stripMargin)),
    // Join-key skew diagnostic: the measurement that decides whether a
    // key needs salting before the shuffle falls over. Exact counts;
    // share and max/mean skew factor are final rationals at 1e-6.
    Q("a_skew_keys",
      (s, d) => graft.pipeline.Profile.keySkew(
        ChangeFeed.table(s, d, "events"), "user_id", topK = 10),
      Some("""WITH c AS (SELECT user_id AS key, count(*) AS cnt
        |           FROM events GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |      CAST(sum(cnt) AS BIGINT) AS n_rows,
        |      max(cnt) AS max_cnt FROM c),
        |top AS (SELECT key, cnt,
        |        row_number() OVER (ORDER BY cnt DESC, key ASC) AS rank
        |        FROM c)
        |SELECT key, CAST(cnt AS BIGINT) AS cnt, rank, n_keys, n_rows,
        |       round(cnt::DOUBLE / n_rows::DOUBLE, 6) AS share,
        |       round(max_cnt::DOUBLE * n_keys::DOUBLE / n_rows::DOUBLE,
        |         6) AS skew_factor
        |FROM top, t WHERE rank <= 10""".stripMargin)),
    // Exact heavy hitters with NO per-key shuffle: Misra–Gries native
    // aggregate (k-entry bounded buffers, mergeable-summaries merge)
    // proposes ≤k candidates guaranteed to cover every key with
    // count > n/(k+1); a broadcast verify pass re-counts candidates
    // exactly and thresholds on pure BIGINT math — deterministic even
    // though the sketch's below-bound extras are merge-order dependent.
    // k=4 over 5 event types forces eviction inside the sketch.
    Q("a_heavy_hitters",
      (s, d) => graft.pipeline.Profile.heavyHitters(
        ChangeFeed.table(s, d, "events"), "event_type", k = 4),
      Some("""WITH c AS (SELECT CAST(event_type AS VARCHAR) AS key,
        |             count(*) AS cnt
        |      FROM events WHERE event_type IS NOT NULL GROUP BY 1),
        |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_rows FROM c)
        |SELECT key, CAST(cnt AS BIGINT) AS cnt, n_rows,
        |       round(cnt::DOUBLE / n_rows::DOUBLE, 6) AS share
        |FROM c, t WHERE cnt * 5 > n_rows""".stripMargin)),
    // First-order Markov transitions between event types per user, in
    // (ts, event_id) order; row-normalized probability from exact
    // counts.
    Q("a_transitions",
      (s, d) => graft.rates.Rates.transitionMatrix(
        ChangeFeed.table(s, d, "events"), "user_id", "ts", "event_id",
        "event_type"),
      Some("""WITH p AS (SELECT event_type AS from_type,
        |  lead(event_type, 1) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |c AS (SELECT from_type, to_type, count(*) AS cnt FROM p
        |      WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, CAST(cnt AS BIGINT) AS cnt,
        |       round(cnt::DOUBLE /
        |         (sum(cnt) OVER (PARTITION BY from_type))::DOUBLE, 6)
        |         AS p
        |FROM c""".stripMargin)),
    // Cluster separation: pairwise squared distance between per-label
    // embedding centroids from exact integer sums — the (sa·nb − sb·na)²
    // /(na·nb)² identity keeps everything decimal/HUGEINT until ONE
    // final division, so the doubles are bit-identical (no rounding
    // tolerance, like a_ewma). dist2 is in 1e-6² units.
    Q("sim_centroid_sep",
      (s, d) => Similarity.labelCentroidDistances(emb(s, d), "embedding",
        "label"),
      Some("""WITH e AS (SELECT label, embedding::DOUBLE[] AS v
        |           FROM embeddings),
        |q AS (SELECT label,
        |      unnest([{d: i, q: CAST(round(v[i] * 1000000.0::DOUBLE)
        |                AS BIGINT)}
        |              for i in generate_series(1, 64)],
        |             recursive := true)
        |      FROM e),
        |s AS (SELECT label, d, sum(q) AS sq FROM q GROUP BY 1, 2),
        |c AS (SELECT label, count(*) AS n FROM e GROUP BY 1)
        |SELECT a.label AS label_a, b.label AS label_b,
        |       CAST(ca.n AS BIGINT) AS n_a, CAST(cb.n AS BIGINT) AS n_b,
        |       sum((a.sq::HUGEINT * cb.n - b.sq::HUGEINT * ca.n) *
        |           (a.sq::HUGEINT * cb.n - b.sq::HUGEINT * ca.n))::DOUBLE
        |         / ((ca.n * cb.n) * (ca.n * cb.n))::DOUBLE AS dist2
        |FROM s a JOIN s b ON a.d = b.d AND a.label < b.label
        |JOIN c ca ON ca.label = a.label
        |JOIN c cb ON cb.label = b.label
        |GROUP BY a.label, b.label, ca.n, cb.n""".stripMargin)),
    // Ordered journey path per user (first 20 steps, '>'-joined) — the
    // flow-mining shape; the rank filter bounds the per-key collect
    // BEFORE the list aggregate.
    Q("a_user_journey",
      (s, d) => graft.rates.Rates.journeyPaths(
        ChangeFeed.table(s, d, "events"), "user_id", "ts", "event_id",
        "event_type", maxSteps = 20),
      Some("""WITH r AS (SELECT user_id, event_type, ts, event_id,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    AS rn
        |  FROM events)
        |SELECT user_id,
        |       string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
        |       CAST(count(*) AS BIGINT) AS n_steps
        |FROM r WHERE rn <= 20 GROUP BY 1""".stripMargin)),
    // Rolling 7-day distinct actives per day: distinct (user, day) →
    // constant-fan day-range join → per-day exact distinct count.
    Q("a_rolling_actives",
      (s, d) => graft.rates.Rates.rollingActives(
        ChangeFeed.table(s, d, "events"), "user_id", "ts",
        windowDays = 7),
      Some("""WITH a AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id
        |           FROM events),
        |days AS (SELECT DISTINCT d AS day FROM a)
        |SELECT CAST(day AS VARCHAR) AS day,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
        |FROM days JOIN a ON date_diff('day', a.d, days.day)
        |  BETWEEN 0 AND 6
        |GROUP BY 1""".stripMargin)),
    // Row-level robust outliers: |x − med| > 3·MAD per event_type with
    // RANK-BASED lower medians (actual data elements, no interpolation
    // arithmetic) — every comparison operand is exact, so the boundary
    // decision needs no epsilon on either engine.
    Q("a_outliers_mad",
      (s, d) => graft.pipeline.Profile.outliersMad(
        ChangeFeed.table(s, d, "events"), "event_type", "value",
        "event_id", k = 3),
      Some("""WITH v AS (SELECT event_id, event_type, value::DOUBLE AS x
        |           FROM events WHERE value IS NOT NULL),
        |r1 AS (SELECT event_type, x,
        |       row_number() OVER (PARTITION BY event_type ORDER BY x)
        |         AS rn,
        |       count(*) OVER (PARTITION BY event_type) AS n FROM v),
        |med AS (SELECT event_type, x AS med FROM r1
        |        WHERE rn = (n + 1) // 2),
        |wm AS (SELECT v.event_id, v.event_type, v.x, med.med,
        |       abs(v.x - med.med) AS ad
        |       FROM v JOIN med USING (event_type)),
        |r2 AS (SELECT event_type, ad,
        |       row_number() OVER (PARTITION BY event_type ORDER BY ad)
        |         AS rn,
        |       count(*) OVER (PARTITION BY event_type) AS n FROM wm),
        |mad AS (SELECT event_type, ad AS mad FROM r2
        |        WHERE rn = (n + 1) // 2)
        |SELECT wm.event_id, wm.event_type, wm.x AS value, wm.med,
        |       mad.mad
        |FROM wm JOIN mad USING (event_type)
        |WHERE wm.ad > 3.0::DOUBLE * mad.mad""".stripMargin)),
    // Debounce: drop events within 5 s of the previous same-(user,
    // type) event (previous EVENT, not previous kept — documented lag
    // semantics); output is the kept set.
    Q("a_debounce",
      (s, d) => graft.rates.Rates.debounce(
          ChangeFeed.table(s, d, "events"), Seq("user_id", "event_type"),
          "ts", "event_id", minGapSec = 5L)
        .select(col("event_id"), col("user_id"), col("event_type")),
      Some("""WITH l AS (SELECT event_id, user_id, event_type,
        |  epoch_us(ts) - epoch_us(lag(ts, 1) OVER (
        |    PARTITION BY user_id, event_type ORDER BY ts, event_id))
        |    AS gap_us
        |  FROM events)
        |SELECT event_id, user_id, event_type FROM l
        |WHERE gap_us IS NULL OR gap_us > 5000000""".stripMargin)),
    // Week-over-week growth per event type: weekly exact counts, lag
    // window, one rational growth ratio at 1e-6. Weeks are epoch-day
    // div 7 buckets (exact integral division, no calendar ambiguity).
    Q("a_wow_growth",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val weekly = ChangeFeed.table(s, d, "events")
          .groupBy(col("event_type"),
            expr("datediff(to_date(ts), DATE '1970-01-01') div 7")
              .as("week"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("event_type").orderBy("week")
        weekly.withColumn("prev_n", lag(col("n"), 1).over(w))
          .where(col("prev_n").isNotNull)
          .select(col("event_type"), col("week"), col("n"), col("prev_n"),
            round(col("n").cast("double") / col("prev_n").cast("double"),
              6).as("growth"))
      },
      Some("""WITH wk AS (SELECT event_type,
        |  date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7
        |    AS week,
        |  count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |l AS (SELECT event_type, week, n,
        |      lag(n, 1) OVER (PARTITION BY event_type ORDER BY week)
        |        AS prev_n
        |      FROM wk)
        |SELECT event_type, week, CAST(n AS BIGINT) AS n,
        |       CAST(prev_n AS BIGINT) AS prev_n,
        |       round(n::DOUBLE / prev_n::DOUBLE, 6) AS growth
        |FROM l WHERE prev_n IS NOT NULL""".stripMargin)),
    // Percent-rank normalization of value within event_type: the
    // quantile-normalized feature column; (rank−1)/(n−1) is one
    // rational of exact integers (rank ties broken by event_id so the
    // permutation is total on both engines).
    Q("a_percent_rank",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("event_type")
          .orderBy(col("value"), col("event_id"))
        val cw = Window.partitionBy("event_type")
        ChangeFeed.table(s, d, "events")
          .where(col("value").isNotNull)
          .withColumn("_rn", row_number().over(w).cast("long"))
          .withColumn("_n", count(lit(1)).over(cw))
          .select(col("event_id"), col("event_type"), col("value"),
            round((col("_rn") - 1L).cast("double") /
              (col("_n") - 1L).cast("double"), 6).as("pr"))
      },
      Some("""WITH r AS (SELECT event_id, event_type, value,
        |  row_number() OVER (PARTITION BY event_type
        |    ORDER BY value, event_id) AS rn,
        |  count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events WHERE value IS NOT NULL)
        |SELECT event_id, event_type, value,
        |       round((rn - 1)::DOUBLE / (n - 1)::DOUBLE, 6) AS pr
        |FROM r""".stripMargin)),
    // Pearson χ² independence of (lang, source): exact observed
    // counts, each (O−E)²/E term integer-ized at 1e-6, exact BIGINT
    // total. Marginals from windows over the cells table, never a
    // second scan.
    Q("a_chisq",
      (s, d) => graft.pipeline.Profile.chiSquare(docs(s, d), "lang",
        "source"),
      Some("""WITH c0 AS (SELECT lang AS a, source AS b, count(*) AS o
        |           FROM documents GROUP BY 1, 2),
        |c AS (SELECT g.a, g.b, coalesce(c0.o, 0) AS o
        |      FROM (SELECT a, b FROM (SELECT DISTINCT lang AS a
        |              FROM documents),
        |            (SELECT DISTINCT source AS b FROM documents)) g
        |      LEFT JOIN c0 USING (a, b)),
        |m AS (SELECT a, b, o,
        |      sum(o) OVER (PARTITION BY a) AS rt,
        |      sum(o) OVER (PARTITION BY b) AS ct,
        |      sum(o) OVER () AS n FROM c),
        |t AS (SELECT a, b, CAST(round(
        |      (o - (rt * ct)::DOUBLE / n::DOUBLE) *
        |      (o - (rt * ct)::DOUBLE / n::DOUBLE) /
        |      ((rt * ct)::DOUBLE / n::DOUBLE) * 1000000.0::DOUBLE)
        |        AS BIGINT) AS t FROM m)
        |SELECT CAST(count(*) AS BIGINT) AS n_cells,
        |       CAST((count(DISTINCT a) - 1) * (count(DISTINCT b) - 1)
        |         AS BIGINT) AS dof,
        |       CAST(sum(t) AS BIGINT) AS chisq_micros
        |FROM t""".stripMargin)),
    // Stable three-way split by md5 hash range: a doc's split is a
    // pure function of (seed, id), immune to corpus growth.
    Q("curation_split3",
      (s, d) => Curation.threeWaySplit(docs(s, d), "doc_id", "sp",
        trainPct = 80, valPct = 10),
      Some("""SELECT doc_id, b AS bucket,
        |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |      ('0x' || substr(md5('sp:' ||
        |        coalesce(doc_id::VARCHAR, 'null')), 1, 6))::BIGINT % 100
        |        AS b
        |      FROM documents)""".stripMargin)),
    // RAKE keyphrases: maximal non-stopword runs (gaps-and-islands
    // grouping), word score = degree/freq integer-ized at 1e-6, phrase
    // score = exact BIGINT sum, top-10 distinct phrases.
    Q("text_keyphrases",
      (s, d) => TextAnalysis.rakeKeyphrases(docs(s, d), "text",
        "doc_id", lang = "en", k = 10),
      Some(s"""WITH ws AS (SELECT doc_id,
        |  list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
        |              x -> len(x) > 0) AS ws FROM documents),
        |toks AS (SELECT doc_id,
        |  unnest([{idx: i, w: ws[i]}
        |          for i in generate_series(1, len(ws))],
        |         recursive := true)
        |  FROM ws),
        |g AS (SELECT doc_id, idx, w,
        |      idx - row_number() OVER (PARTITION BY doc_id ORDER BY idx)
        |        AS grp
        |      FROM toks WHERE w NOT IN ($enSw)),
        |ph AS (SELECT doc_id, grp, count(*) AS len,
        |       string_agg(w, ' ' ORDER BY idx) AS phrase
        |       FROM g GROUP BY 1, 2),
        |freq AS (SELECT w, count(*) AS f FROM g GROUP BY 1),
        |deg AS (SELECT g.w, sum(ph.len) AS d
        |        FROM g JOIN ph USING (doc_id, grp) GROUP BY 1),
        |sc AS (SELECT w, CAST(round(d::DOUBLE / f::DOUBLE *
        |         1000000.0::DOUBLE) AS BIGINT) AS s
        |       FROM deg JOIN freq USING (w)),
        |psc AS (SELECT g.doc_id, g.grp, ph.phrase, ph.len,
        |        CAST(sum(sc.s) AS BIGINT) AS score
        |        FROM g JOIN ph USING (doc_id, grp) JOIN sc USING (w)
        |        GROUP BY 1, 2, 3, 4),
        |agg AS (SELECT phrase, CAST(max(len) AS BIGINT) AS n_words,
        |        CAST(count(*) AS BIGINT) AS n_occurrences,
        |        max(score) AS score_micros FROM psc GROUP BY 1)
        |SELECT phrase, n_words, n_occurrences, score_micros, rank
        |FROM (SELECT *, row_number() OVER (ORDER BY score_micros DESC,
        |        phrase ASC) AS rank FROM agg)
        |WHERE rank <= 10""".stripMargin)),
    // Exact dedup over the OPAQUE BINARY media column — the dedup
    // family extended to multimodal: digest the real codec bytes (md5
    // over binary, no content assumptions), first media_id per digest
    // survives, per media_type duplicate accounting. Bytes never
    // shuffle — only digests do. The oracle groups by the generation
    // seed instead of the (SQL-unreproducible) md5 — seed ↔ payload is
    // bijective (MultimodalSpec proves seed-sharing ids byte-identical),
    // so the groups coincide; total_bytes = n_copies × the closed-form
    // payload size.
    Q("mm_dedup_media",
      (s, d) => Multimodal.mediaFromDocuments(docs(s, d))
        .groupBy(md5(col("bytes")).as("_digest"), col("media_type"))
        .agg(min(col("media_id")).as("media_id"),
          count(lit(1)).as("n_copies"),
          sum(length(col("bytes"))).as("total_bytes"))
        .drop("_digest"),
      Some(s"""$mediaCte,
        |sz AS (SELECT media_id, seed, media_type,
        |  CASE media_type
        |    WHEN 'image' THEN 54 + ih * ((3*iw + 3) // 4 * 4)
        |    WHEN 'audio' THEN 44 + 2 * frames
        |    ELSE 12 + nf * (4 + 54 + fh * ((3*fw + 3) // 4 * 4))
        |  END AS n_bytes FROM t)
        |SELECT media_type, min(media_id) AS media_id,
        |  CAST(count(*) AS BIGINT) AS n_copies,
        |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes
        |FROM sz GROUP BY seed, media_type""".stripMargin)),
    // Packing-efficiency report composing packTokenBudget: per pack,
    // exact doc/token counts and fill rate vs budget — the number that
    // says whether the chosen budget wastes sequence space (ordered
    // chunking may overflow by at most one doc, so fill can exceed 1).
    Q("curation_pack_efficiency",
      (s, d) => Curation.packTokenBudget(
          docs(s, d).select("doc_id", "lang", "text"),
          stratumCol = "lang", orderCol = "doc_id",
          tokensCol = TextAnalysis.tokenCount(col("text")),
          budget = 2000L, nShards = 4)
        .groupBy(col("pack_key"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tokens"))
        .withColumn("fill",
          round(col("tokens").cast("double") / lit(2000.0), 6)),
      Some("""WITH t AS (SELECT doc_id, lang, doc_id % 4 AS shard,
        |  len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
        |  FROM documents),
        |p AS (SELECT n_tokens, concat_ws('#', lang, shard,
        |    CAST(floor(COALESCE(sum(n_tokens) OVER
        |      (PARTITION BY lang, shard ORDER BY doc_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      / 2000.0) AS BIGINT)) AS pack_key
        |  FROM t)
        |SELECT pack_key, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_tokens) AS BIGINT) AS tokens,
        |       round(sum(n_tokens)::DOUBLE / 2000.0::DOUBLE, 6) AS fill
        |FROM p GROUP BY 1""".stripMargin)),
    // Hour-of-day seasonality per event type: exact counts + share of
    // the type's daily cycle; the load-shaping profile a poller's
    // capacity planning reads.
    Q("a_hourly_profile",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        ChangeFeed.table(s, d, "events")
          .groupBy(col("event_type"), hour(col("ts")).as("hour"))
          .agg(count(lit(1)).as("n"))
          .withColumn("share", round(col("n").cast("double") /
            sum(col("n")).over(Window.partitionBy("event_type"))
              .cast("double"), 6))
      },
      Some("""WITH h AS (SELECT event_type, hour(ts) AS hour,
        |  count(*) AS n FROM events GROUP BY 1, 2)
        |SELECT event_type, CAST(hour AS INT) AS hour,
        |       CAST(n AS BIGINT) AS n,
        |       round(n::DOUBLE / (sum(n) OVER (PARTITION BY event_type))
        |         ::DOUBLE, 6) AS share
        |FROM h""".stripMargin)),
    // Zipf slope of the top-100 token frequencies (corpus-health
    // number; natural text ≈ −1): ln values integer-ized at 1e-6, OLS
    // moments as exact HUGEINT/decimal sums, one mirrored slope
    // expression.
    Q("text_zipf",
      (s, d) => TextAnalysis.zipfSlope(docs(s, d), "text", topK = 100),
      Some("""WITH t AS (SELECT unnest(list_filter(
        |    regexp_split_to_array(trim(text), '\s+'),
        |    x -> len(x) > 0)) AS w FROM documents),
        |f AS (SELECT w, count(*) AS c FROM t GROUP BY 1),
        |r AS (SELECT c, row_number() OVER (ORDER BY c DESC, w ASC)
        |        AS r FROM f
        |      ORDER BY c DESC, w ASC LIMIT 100),
        |q AS (SELECT CAST(round(ln(r::DOUBLE) * 1000000.0::DOUBLE)
        |        AS BIGINT) AS x,
        |      CAST(round(ln(c::DOUBLE) * 1000000.0::DOUBLE) AS BIGINT)
        |        AS y FROM r),
        |m AS (SELECT count(*) AS n, sum(x::HUGEINT) AS sx,
        |      sum(y::HUGEINT) AS sy, sum(x::HUGEINT * y) AS sxy,
        |      sum(x::HUGEINT * x) AS sxx FROM q)
        |SELECT CAST(n AS BIGINT) AS n_ranks,
        |       round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE) /
        |         (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE), 6)
        |         AS slope
        |FROM m""".stripMargin)),
    // Gini concentration of events across users — the imbalance number
    // a sharding/mixing decision reads; exact counts and rank-weighted
    // sums, mirrored associativity on the two final divisions.
    Q("a_gini",
      (s, d) => graft.pipeline.Profile.giniConcentration(
        ChangeFeed.table(s, d, "events"), "user_id"),
      Some("""WITH c AS (SELECT user_id AS k, count(*) AS c FROM events
        |           GROUP BY 1),
        |r AS (SELECT c, row_number() OVER (ORDER BY c ASC, k ASC) AS i
        |      FROM c),
        |a AS (SELECT count(*) AS n_keys, sum(c) AS n_rows,
        |      sum(i * c) AS s FROM r)
        |SELECT CAST(n_keys AS BIGINT) AS n_keys,
        |       CAST(n_rows AS BIGINT) AS n_rows,
        |       round((2.0::DOUBLE * s::DOUBLE) /
        |           (n_keys * n_rows)::DOUBLE -
        |           (n_keys + 1)::DOUBLE / n_keys::DOUBLE, 6) AS gini
        |FROM a""".stripMargin)),
    // Per-source duplication report: the dedup-tuning diagnostic a
    // curation run reads before choosing thresholds — exact digest
    // distinct counts, dup_rate as one rational at 1e-6.
    Q("curation_dup_by_source",
      (s, d) => docs(s, d)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(md5(col("text"))).as("n_unique"))
        .withColumn("n_dups", col("n_docs") - col("n_unique"))
        .withColumn("dup_rate",
          round((col("n_docs") - col("n_unique")).cast("double") /
            col("n_docs").cast("double"), 6)),
      Some("""SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique,
        |  CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT) AS n_dups,
        |  round((count(*) - count(DISTINCT md5(text)))::DOUBLE /
        |    count(*)::DOUBLE, 6) AS dup_rate
        |FROM documents GROUP BY 1""".stripMargin)),
    // TextRank keywords: integer-exact PageRank over the symmetrized
    // adjacent-word graph (pairs with count ≥ 5) — the Mihalcea-Tarau
    // composition of the bigram machinery with Graph.pageRank; the
    // oracle unrolls the same 5 iterations as sim_pagerank.
    Q("text_textrank",
      (s, d) => TextAnalysis.textRank(docs(s, d), "text",
        minPairCount = 5L, k = 20),
      Some("""WITH d AS (SELECT
        |  list_filter(regexp_split_to_array(trim(text), '\s+'),
        |              w -> len(w) > 0) AS ws FROM documents),
        |bg AS (SELECT unnest([{'w1': ws[i], 'w2': ws[i+1]}
        |                      for i in generate_series(1, len(ws) - 1)],
        |                     recursive := true)
        |       FROM d WHERE len(ws) >= 2),
        |p AS (SELECT w1, w2 FROM bg GROUP BY 1, 2
        |      HAVING count(*) >= 5),
        |pf AS (SELECT w1, w2 FROM p WHERE w1 != w2),
        |e AS (SELECT DISTINCT src, dst FROM (
        |      SELECT w1 AS src, w2 AS dst FROM pf
        |      UNION ALL SELECT w2, w1 FROM pf)),
        |nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
        |nn AS (SELECT count(*) AS n FROM nodes),
        |deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
        |r0 AS (SELECT id, 1000000 AS r FROM nodes),
        |c1 AS (SELECT e.dst AS id,
        |       sum(850000 * (r.r // (1000000 * d.outdeg))
        |           + (850000 * ((r.r % (1000000 * d.outdeg)) // d.outdeg))
        |             // 1000000) AS s
        |       FROM e JOIN r0 r ON e.src = r.id
        |       JOIN deg d ON e.src = d.src GROUP BY 1),
        |r1 AS (SELECT n.id,
        |       150000 + coalesce(c1.s, 0) AS r
        |       FROM nodes n LEFT JOIN c1 USING (id)),
        |c2 AS (SELECT e.dst AS id,
        |       sum(850000 * (r.r // (1000000 * d.outdeg))
        |           + (850000 * ((r.r % (1000000 * d.outdeg)) // d.outdeg))
        |             // 1000000) AS s
        |       FROM e JOIN r1 r ON e.src = r.id
        |       JOIN deg d ON e.src = d.src GROUP BY 1),
        |r2 AS (SELECT n.id,
        |       150000 + coalesce(c2.s, 0) AS r
        |       FROM nodes n LEFT JOIN c2 USING (id)),
        |c3 AS (SELECT e.dst AS id,
        |       sum(850000 * (r.r // (1000000 * d.outdeg))
        |           + (850000 * ((r.r % (1000000 * d.outdeg)) // d.outdeg))
        |             // 1000000) AS s
        |       FROM e JOIN r2 r ON e.src = r.id
        |       JOIN deg d ON e.src = d.src GROUP BY 1),
        |r3 AS (SELECT n.id,
        |       150000 + coalesce(c3.s, 0) AS r
        |       FROM nodes n LEFT JOIN c3 USING (id)),
        |c4 AS (SELECT e.dst AS id,
        |       sum(850000 * (r.r // (1000000 * d.outdeg))
        |           + (850000 * ((r.r % (1000000 * d.outdeg)) // d.outdeg))
        |             // 1000000) AS s
        |       FROM e JOIN r3 r ON e.src = r.id
        |       JOIN deg d ON e.src = d.src GROUP BY 1),
        |r4 AS (SELECT n.id,
        |       150000 + coalesce(c4.s, 0) AS r
        |       FROM nodes n LEFT JOIN c4 USING (id)),
        |c5 AS (SELECT e.dst AS id,
        |       sum(850000 * (r.r // (1000000 * d.outdeg))
        |           + (850000 * ((r.r % (1000000 * d.outdeg)) // d.outdeg))
        |             // 1000000) AS s
        |       FROM e JOIN r4 r ON e.src = r.id
        |       JOIN deg d ON e.src = d.src GROUP BY 1),
        |r5 AS (SELECT n.id,
        |       150000 + coalesce(c5.s, 0) AS r
        |       FROM nodes n LEFT JOIN c5 USING (id))
        |SELECT id AS word, CAST(r AS BIGINT) AS rank_micros, pos
        |FROM (SELECT id, r, row_number() OVER (ORDER BY r DESC, id ASC)
        |        AS pos FROM r5)
        |WHERE pos <= 20""".stripMargin)))

  val all: Seq[Q] =
    dedupQueries ++ annQueries ++ textQueries ++ multimodalQueries ++
      curationQueries ++ e2eQueries ++ retrievalQueries ++ auditQueries
}
