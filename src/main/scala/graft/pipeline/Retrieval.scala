package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyword retrieval over a document corpus — the "find training docs
  * about X" query a curation pipeline runs constantly (topic-targeted
  * sampling, eval-set mining, contamination triage).
  *
  * Scale shape: tokens are filtered to the query terms BEFORE any
  * shuffle, so the aggregate that follows sees |matching tokens| rows,
  * not |corpus tokens|. Document frequencies are a |terms|-row side
  * that broadcasts; the final top-k is a distributed TakeOrdered, not a
  * global sort.
  *
  * Determinism: BM25 needs idf, which is conventionally a log — but a
  * log computed by two engines can differ in the last ulp. We use the
  * rational idf variant `(N - df + 0.5) / (df + 0.5)` (the argument of
  * the standard log-idf): every per-term score is then a chain of
  * IEEE-754 +,-,*,/ on identical inputs, which both engines round
  * identically. Per-term scores are integer-ized at 1e-6
  * (`score_micro`), and per-document totals are exact BIGINT sums —
  * order-independent, so the ranking is bit-reproducible anywhere.
  */
object Retrieval {

  /** BM25 top-k: the `k` highest-scoring documents for a bag of query
    * terms. Standard parameters `k1` (term-frequency saturation) and
    * `b` (length normalization). Documents matching no term are not
    * candidates (retrieval semantics). Emits
    * `(idCol, n_terms, score_micro, rank)`. */
  def bm25TopK(df: DataFrame, textCol: String, idCol: String,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val base = Spread(df, col(idCol)).select(col(idCol).as("id"),
        filter(TextAnalysis.words(col(textCol)), w => length(w) > 0).as("ws"))
      .withColumn("dl", size(col("ws")))
    val stats = base.agg(
        count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
      .select("n_docs", "avgdl")
    val qtf = base
      .select(col("id"), col("dl"), explode(col("ws")).as("w"))
      .where(col("w").isin(queryTerms: _*))
      .groupBy(col("id"), col("dl"), col("w"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = qtf.groupBy("w").agg(countDistinct(col("id")).as("df_t"))
    // Per-(doc, term) score — pure rational double arithmetic, then
    // integer-ized so the cross-term sum is exact and order-free.
    val scored = qtf
      .join(broadcast(dfreq), "w")
      .crossJoin(broadcast(stats))
      .withColumn("score_t",
        (col("n_docs") - col("df_t") + lit(0.5)) / (col("df_t") + lit(0.5)) *
          (col("tf") * lit(k1 + 1.0)) /
          (col("tf") +
            lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
      .withColumn("micro", round(col("score_t") * lit(1e6)).cast("long"))
    val perDoc = scored.groupBy("id")
      .agg(countDistinct(col("w")).as("n_terms"),
        sum(col("micro")).as("score_micro"))
    // TakeOrderedAndProject does the distributed top-k; the rank window
    // then runs over k rows only.
    val topk = perDoc
      .orderBy(col("score_micro").desc, col("id").asc).limit(k)
    topk.withColumn("rank", row_number().over(
        Window.orderBy(col("score_micro").desc, col("id").asc)))
      .select(col("id").as(idCol), col("n_terms"), col("score_micro"),
        col("rank"))
  }

  /** nDCG@k — ranking-quality evaluation of a retrieval result against
    * graded relevance labels. `ranked` carries `(rankCol, relCol)` for
    * the retrieved list; `corpusRel` carries `(corpusIdCol, relCol)`
    * for EVERY candidate (the ideal ranking draws from the whole
    * corpus, not just what was retrieved).
    *
    * DCG term at position i: (2^rel − 1) / log2(i + 1). Each term is
    * integer-ized at 1e-6 immediately after the one log2 call (the only
    * transcendental), so DCG and IDCG are exact BIGINT sums and
    * nDCG = dcg/idcg is one rational division of exact integers.
    *
    * Scale: DCG aggregates k rows; the ideal list is a distributed
    * TakeOrdered top-k over corpus relevance (never a global sort).
    * Emits one row: `(k, dcg_micros, idcg_micros, ndcg)`. */
  def ndcgAtK(ranked: DataFrame, rankCol: String, relCol: String,
      corpusRel: DataFrame, corpusIdCol: String, k: Int): DataFrame = {
    def termMicros(rankC: String, relC: String) = expr(
      s"""cast(round(cast(shiftleft(1L, cast($relC AS int)) - 1L AS double)
         |  / (ln(cast($rankC AS double) + 1.0D) / ln(2.0D))
         |  * 1000000.0D) AS long)""".stripMargin)
    val dcg = ranked.where(col(rankCol) <= k)
      .agg(sum(termMicros(rankCol, relCol)).as("dcg_micros"))
    val ideal = corpusRel
      .orderBy(col(relCol).desc, col(corpusIdCol).asc).limit(k)
      .withColumn("_rank", row_number().over(
        Window.orderBy(col(relCol).desc, col(corpusIdCol).asc)))
    val idcg = ideal.agg(sum(termMicros("_rank", relCol)).as("idcg_micros"))
    dcg.crossJoin(idcg).select(lit(k.toLong).as("k"),
      col("dcg_micros"), col("idcg_micros"),
      round(col("dcg_micros").cast("double") /
        col("idcg_micros").cast("double"), 6).as("ndcg"))
  }

  /** Reciprocal-rank fusion of several rankings of the same id space:
    * rrf(d) = Σ_lists 1/(rrfK + rank_list(d)) — the standard
    * train-free way to combine lexical and dense retrieval lists.
    *
    * Each list contribution integer-izes at 1e-6 (one exact integer
    * division rendered in double, identical everywhere), totals are
    * exact BIGINT sums, and the fused ranking breaks ties on id — so
    * the fusion is bit-reproducible. Scale: a unionByName of the
    * (already tiny) per-list top-k tables, one id groupBy, distributed
    * TakeOrdered for the final k. Emits
    * `(idCol, n_lists, rrf_micros, rank)`. */
  def rrfFusion(rankings: Seq[DataFrame], idCol: String, rankCol: String,
      k: Int, rrfK: Int = 60): DataFrame = {
    require(rankings.nonEmpty)
    val contrib = rankings.map(r =>
      r.select(col(idCol).as("id"),
        round(lit(1e6) / (lit(rrfK.toDouble) + col(rankCol).cast("double")))
          .cast("long").as("_m")))
      .reduce(_ unionByName _)
    val fused = contrib.groupBy(col("id"))
      .agg(count(lit(1)).as("n_lists"), sum(col("_m")).as("rrf_micros"))
    fused.orderBy(col("rrf_micros").desc, col("id").asc).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("rrf_micros").desc, col("id").asc)))
      .select(col("id").as(idCol), col("n_lists"), col("rrf_micros"),
        col("rank"))
  }
}
