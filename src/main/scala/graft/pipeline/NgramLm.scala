package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Character n-gram language-model scoring — a KenLM-style perplexity
  * proxy trained in-engine, the standard cheap quality signal for corpus
  * filtering (CCNet buckets documents by LM perplexity; gibberish,
  * wrong-language text, and binary junk all fall into the tail of the
  * character-trigram distribution).
  *
  * Model = corpus trigram/bigram frequency tables; score = per-document
  * average conditional log-probability ln P(c₃ | c₁c₂) with add-α
  * smoothing, plus the fraction of rare trigrams (count ≤ `rareMax`) —
  * a float-free companion signal that survives exact cross-engine
  * comparison.
  *
  * Scale: the model is VOCABULARY-sized (≤ |charset|ⁿ rows regardless of
  * corpus size), so both model tables broadcast to the scoring join;
  * training is one partial-aggregated groupBy per order; scoring is a
  * narrow explode + two broadcast hash joins + one per-doc aggregate —
  * the only data-sized shuffle. Nothing about this shape changes between
  * 60k docs and 100 TB.
  */
object NgramLm {

  /** Sliding character n-grams as an array column. Documents shorter
    * than `n` chars yield an EMPTY array — without the guard,
    * `sequence(1, len-(n-1))` with len < n would generate a DESCENDING
    * range and emit garbage windows. */
  def charNgrams(text: Column, n: Int): Column =
    when(length(text) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n))))

  /** Pre-explode spread (round-13, found by a warm probe reading 20×
    * slower than the arithmetic): the explode amplifies each document
    * into ~|text| gram rows INSIDE the scan's stage, and the broadcast
    * joins keep everything there until the first aggregate shuffle —
    * so with a small input (one parquet split; 5,000 docs at sf0.1)
    * the entire ~1.5M-row gram pipeline ran in ONE task on one core
    * (measured 1.7 s per leg; 0.65 s spread). One cheap shuffle of the
    * RAW doc rows (bytes = the corpus text, paid once, before the
    * 300× row amplification) hash-spreads the explode across the
    * cluster; at real scale the input already has many splits and the
    * extra exchange of narrow doc rows is noise next to the gram
    * volume it parallelizes.
    *
    * The partition count is EXPLICIT, not `repartition(by)`: a
    * column-only repartition is AQE-coalescible, and AQE sizes the
    * exchange by its INPUT bytes (~1.5 MB here → back to one
    * partition), blind to the amplification the Generate above it is
    * about to do — measured: the coalescible form kept the whole
    * 1.95 s single-task profile; the explicit form runs the leg in
    * 0.65 s. Delegates to the shared conditional [[Spread]], so an
    * input that already has the session's parallelism (the at-scale
    * case) pays nothing. */
  private def spread(df: DataFrame, by: Column): DataFrame =
    Spread(df, by)

  /** Corpus frequency table `(gram, cnt)` for order `n`. */
  def train(df: DataFrame, textCol: String, n: Int): DataFrame =
    spread(df.select(col(textCol)), col(textCol))
      .select(explode(charNgrams(col(textCol), n)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("cnt"))

  /** Score every document against the corpus-trained model:
    * `(idCol, n_grams, avg_logprob, rare_frac)`.
    *
    * `avg_logprob` = mean over trigram positions of
    * `ln((c₃ + 1) / (c₂ + vocabSize))` — add-one smoothing with an
    * explicit vocabulary-size constant so unseen continuations (scoring
    * a held-out document) stay finite. `rare_frac` = fraction of
    * positions whose trigram count ≤ `rareMax`. */
  def scoreDocs(df: DataFrame, textCol: String, idCol: String,
      vocabSize: Int = 64, rareMax: Long = 2): DataFrame = {
    // persisted (r17): the trigram table feeds BOTH the scoring join and
    // the derived bigram table below — vocabulary-sized, so the cache is
    // tiny, and without it the full trigram explode+agg pass runs twice
    val tri = train(df, textCol, 3)
      .select(col("gram").as("g3"), col("cnt").as("c3"))
      .persist()
    // r17 (guide §1.2 — remove whole passes first): the bigram table
    // used to be a SECOND full corpus explode+aggregate
    // (`train(df, 2)`). But every bigram at position i ≤ len−2 is the
    // 2-char PREFIX of the trigram at i, so its corpus count is a
    // prefix-sum over the (vocabulary-sized!) trigram table; the only
    // bigrams not covered are each document's LAST one (position
    // len−1) — a narrow doc-sized projection, no explode. Exact by
    // position accounting: positions 1..len−2 via prefixes, len−1 via
    // the correction, len<2 contributes nothing on either path.
    val lastBg = df.select(col(textCol))
      .where(length(col(textCol)) >= 2)
      .select(col(textCol)
        .substr(length(col(textCol)) - 1, lit(2)).as("g2"))
      .groupBy("g2").agg(count(lit(1)).as("c_last"))
    val biFromTri = tri
      .select(col("g3").substr(lit(1), lit(2)).as("g2"), col("c3"))
      .groupBy("g2").agg(sum(col("c3")).as("c_pre"))
    val bi = biFromTri.join(lastBg, Seq("g2"), "full_outer")
      .select(col("g2"),
        (coalesce(col("c_pre"), lit(0L)) + coalesce(col("c_last"), lit(0L)))
          .as("c2"))
    val grams = spread(df.select(col(idCol).as("id"), col(textCol)),
        col(idCol))
      .select(col("id"), explode(charNgrams(col(textCol), 3)).as("g3"))
      .withColumn("g2", col("g3").substr(1, 2))
    grams
      // n-gram count tables grow with the training corpus — no broadcast
      // hint; AQE broadcasts at runtime while they fit
      .join(tri, Seq("g3"), "left")
      .join(bi, Seq("g2"), "left")
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_grams"),
        // Rounded at 1e-4, not 1e-6: cross-engine float noise (libm ulps,
        // summation order) is ~1e-13, so the probability of a mean landing
        // within noise of a .5e-4 boundary is negligible (~1e-9 per doc),
        // where at 1e-6 grain it was only ~1e-7 — coarser grain makes the
        // oracle comparison robust rather than merely probably-fine.
        round(avg(log(
          (coalesce(col("c3"), lit(0L)) + lit(1.0)) /
            (coalesce(col("c2"), lit(0L)) + lit(vocabSize.toDouble)))), 4)
          .as("avg_logprob"),
        round(avg(when(coalesce(col("c3"), lit(0L)) <= rareMax, 1.0)
          .otherwise(0.0)), 6).as("rare_frac"))
      .select(col("id").as(idCol), col("n_grams"),
        col("avg_logprob"), col("rare_frac"))
  }
}
