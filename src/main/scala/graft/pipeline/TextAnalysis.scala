package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, language ID, document fingerprinting.
  *
  * All are narrow per-row projections built from codegen'd built-ins (no
  * UDFs): at 100 TB they run at scan speed, column-pruned to just the text
  * column, and never shuffle.
  */
object TextAnalysis {

  /** Whitespace tokenization (the reference corpus is space-separated). */
  /** Whitespace tokens, EvalOnce-fenced: `explode(words(...))` otherwise
    * triggers InferFiltersFromGenerate, whose inferred
    * `size(split(...)) > 0` pre-filter RE-TOKENIZES every document in a
    * Filter the Generate then tokenizes again — the text family's
    * dominant per-row cost, paid twice across eight queries (DupExprScan
    * cross-node). The fence suppresses the inference; an `outer=false`
    * explode of an empty array emits nothing anyway, so semantics are
    * unchanged and the skipped pre-filter saved only a row copy.
    *
    * Like every fenced column, compose via a BOUND column (`withColumn`
    * first): raw use inside aggregates / join conditions / grouping is
    * rejected at analysis time — see [[graft.plans.EvalOnce.of]]. */
  def words(text: Column): Column =
    graft.plans.EvalOnce.of(split(trim(text), "\\s+"))

  /** Whitespace token count. Carries [[words]]'s fence, so the same
    * bind-before-aggregating rule applies ([[graft.plans.EvalOnce.of]]). */
  def tokenCount(text: Column): Column = size(words(text))

  /** BPE-ish subword count: alpha runs, digit runs, and single punctuation
    * marks — a portable proxy for tokenizer load estimation. */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0)))

  /** Small multilingual stopword inventory for n-gram/stopword language ID. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "auf"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une", "est", "pour", "que")
  )

  /** Fraction of tokens that are stopwords of `lang` (distinct-insensitive:
    * every token occurrence counts). */
  def stopwordRatio(text: Column, lang: String): Column = {
    val sw = stopwords(lang)
    val ws = words(text)
    round(size(filter(ws, w => w.isInCollection(sw))) / size(ws).cast("double"), 6)
  }

  /** Heuristic language ID: the language with the highest stopword hit
    * count; 'und' (undetermined) when nothing matches. */
  def langId(text: Column): Column = {
    val ws = words(text)
    val scored = stopwords.toSeq.sortBy(_._1).map { case (lang, sw) =>
      struct(size(filter(ws, w => w.isInCollection(sw))).as("hits"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("hits") > 0, best.getField("lang")).otherwise("und")
  }

  /** Quality-score feature bundle (length / punctuation / stopword / word
    * shape), one pass over the text. */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val ws = words(t)
    df.withColumn("n_chars_q", length(t))
      .withColumn("n_tokens", size(ws))
      .withColumn("mean_word_len",
        round(length(regexp_replace(t, "\\s+", "")) / size(ws).cast("double"), 6))
      .withColumn("punct_ratio",
        round(size(regexp_extract_all(t, lit("[^a-zA-Z0-9\\s]"), lit(0)))
          / length(t).cast("double"), 6))
      .withColumn("stopword_ratio_en", stopwordRatio(t, "en"))
      .withColumn("alpha_ratio",
        round(size(regexp_extract_all(t, lit("[a-zA-Z]"), lit(0)))
          / length(t).cast("double"), 6))
  }

  /** Document fingerprint: md5 over the sorted distinct normalized word set
    * — stable under word reordering and duplication (the batch analog of a
    * rolling-hash fingerprint, collision-checked by dedup). */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(words(lower(text))))))

  /** Within-document repetition signals (the Gopher/RefinedWeb quality
    * family): distinct-word ratio, most-frequent-word fraction, and
    * most-frequent-bigram fraction.
    *
    * Relational shape, not per-doc HOF loops: tokens explode once and
    * aggregate by (doc, token) — two codegen'd hash aggregates whose
    * shuffle volume is the corpus token count. The per-doc alternative
    * (`max` over `transform(distinct, w => size(filter(ws, = w)))`) is an
    * interpreted O(n·distinct) lambda per row — the exact HOF trap the
    * simhash work measured at ~100×. Single-word docs have no bigrams;
    * their top_bigram_ratio is 0.0 (left join + coalesce, not a dropped
    * row). */
  def repetitionFeatures(df: DataFrame, textCol: String, idCol: String)
      : DataFrame = {
    // conditional pre-explode spread (graft.AmpScan): the agg below
    // explodes the word array within the scan's stage
    val base = Spread(df, col(idCol))
      .select(col(idCol), words(col(textCol)).as("ws"))
    // r17 reshape (guide §2.4): ONE merged explode of words + bigrams
    // through ONE (id, token) count and ONE per-doc aggregate, instead
    // of two independent explode→count→rollup chains joined on the id
    // (two token-sized exchanges + a doc-sized join → one token-sized
    // exchange, and the corpus is tokenized once, not twice). The two
    // populations need no tag column: `words` splits on whitespace so a
    // word NEVER contains a space, while every bigram contains its
    // joining space — `contains(" ")` is an exact classifier.
    val merged = base.select(col(idCol),
      explode(concat(col("ws"),
        when(size(col("ws")) >= 2, transform(
          sequence(lit(0), size(col("ws")) - 2),
          i => concat_ws(" ", slice(col("ws"), i + 1, lit(2)))))
          .otherwise(array().cast("array<string>")))).as("t"))
    val isW = !col("t").contains(" ")
    val perDoc = merged
      .groupBy(col(idCol), col("t")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(sum(when(isW, col("c"))).as("n_words"),
        count(when(isW, lit(1))).as("n_distinct"),
        max(when(isW, col("c"))).as("max_word"),
        sum(when(!isW, col("c"))).as("n_bigrams"),
        max(when(!isW, col("c"))).as("max_bigram"))
    perDoc
      .select(col(idCol),
        col("n_words"),
        round(col("n_distinct").cast("double") / col("n_words"), 6)
          .as("distinct_word_ratio"),
        round(col("max_word").cast("double") / col("n_words"), 6)
          .as("max_word_ratio"),
        coalesce(
          round(col("max_bigram").cast("double") / col("n_bigrams"), 6),
          lit(0.0)).as("top_bigram_ratio"))
  }

  /** Per-document top-k keywords by tf-idf, with a RATIONAL idf
    * (`tf · (N+1)/(df+1)` instead of the classic log form): rankings stay
    * tf-idf-shaped while the score is pure IEEE rational arithmetic —
    * bit-identical across engines, so the cross-engine oracle can
    * hash-match scores and the row_number cut (a log idf differs in the
    * last ulp between libm implementations, which can flip orderings of
    * near-tied scores).
    *
    * Relational shape: tokens explode once; tf = (doc, token) aggregate;
    * document frequency = token aggregate over the tf rows; N is a
    * broadcast single-row cross join. Top-k is a per-doc window over the
    * scored rows (partitioned by doc — no global sort). */
  def tfidfKeywords(df: DataFrame, textCol: String, idCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = Spread(df, col(idCol))
      .select(col(idCol), explode(words(col(textCol))).as("w"))
      .where(length(col("w")) > 0)
    val tf = toks.groupBy(col(idCol), col("w"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val nDocs = df.select(countDistinct(col(idCol)).as("n_docs"))
    val scored = tf.join(dfreq, "w")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        round(col("tf") * (col("n_docs") + 1) / (col("df") + 1), 6))
    val w = Window.partitionBy(idCol)
      .orderBy(col("score").desc, col("w").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(idCol), col("w").as("token"), col("tf"), col("df"),
        col("score"), col("rank"))
  }

  /** Fixed-token-window chunking with overlap — the pre-training
    * chunker: each document yields windows of `chunkTokens` words every
    * `chunkTokens - overlap` positions. A pure narrow projection
    * (stage words → explode window starts → slice); chunk boundaries
    * depend only on the document, so re-chunking any partition of a
    * 100 TB corpus is reproducible and shuffle-free. */
  def chunkByTokens(df: DataFrame, textCol: String, idCol: String,
      chunkTokens: Int, overlap: Int = 0): DataFrame = {
    require(overlap < chunkTokens, "overlap must be < chunkTokens")
    val step = chunkTokens - overlap
    val base = df.select(col(idCol), words(col(textCol)).as("ws"))
      .withColumn("n", size(col("ws")))
    base
      .select(col(idCol), col("ws"), col("n"),
        posexplode(sequence(lit(0), col("n") - 1, lit(step)))
          .as(Seq("chunk_idx", "start")))
      .select(col(idCol), col("chunk_idx"),
        col("start"),
        least(lit(chunkTokens), col("n") - col("start")).as("n_chunk_tokens"),
        concat_ws(" ", slice(col("ws"), col("start") + 1, lit(chunkTokens)))
          .as("chunk_text"))
  }

  /** Gopher-style keep/drop quality gate: the boolean rules a curation
    * pipeline actually filters on, with the signals they derive from kept
    * in-band for auditability (a 100 TB run wants to know WHY a document
    * dropped, not just that it did). Thresholds are the standard defaults;
    * all tunable. */
  def gopherFilter(
      df: DataFrame, textCol: String, idCol: String,
      minWords: Int = 50, maxWords: Int = 100000,
      minDistinctRatio: Double = 0.3, maxWordRatio: Double = 0.2,
      maxBigramRatio: Double = 0.18): DataFrame = {
    val rep = repetitionFeatures(df, textCol, idCol)
    rep
      .withColumn("flag_too_short", col("n_words") < minWords)
      .withColumn("flag_too_long", col("n_words") > maxWords)
      .withColumn("flag_low_diversity",
        col("distinct_word_ratio") < minDistinctRatio)
      .withColumn("flag_repetitive_word",
        col("max_word_ratio") > maxWordRatio)
      .withColumn("flag_repetitive_bigram",
        col("top_bigram_ratio") > maxBigramRatio)
      .withColumn("keep",
        !col("flag_too_short") && !col("flag_too_long") &&
        !col("flag_low_diversity") && !col("flag_repetitive_word") &&
        !col("flag_repetitive_bigram"))
  }

  /** Out-of-vocabulary rate per document against a vocabulary relation
    * `(token)` — the tokenizer-design signal ("how much of this source
    * does my vocab not cover"). Returns
    * `(idCol, n_tokens, n_oov, oov_rate)`; zero-token documents score
    * 0.0, not NULL (nothing is out of an empty token stream).
    *
    * Scale: tokens explode narrowly, the vocabulary joins as a
    * broadcast (a vocab is driver-sized by construction — 32k/64k/128k
    * entries), and the per-doc aggregate partial-combines map-side, so
    * the only exchange is the final groupBy on the doc id. */
  def oovRate(df: DataFrame, textCol: String, idCol: String,
      vocab: DataFrame): DataFrame = {
    val vTok = vocab.columns.head
    val hit = broadcast(vocab.select(col(vTok).as("_tok")).distinct()
      .withColumn("_in_vocab", lit(true)))
    df.select(col(idCol),
        explode_outer(filter(words(col(textCol)), w => length(w) > 0))
          .as("_tok"))
      .join(hit, Seq("_tok"), "left")
      .groupBy(col(idCol))
      .agg(
        count(col("_tok")).as("n_tokens"),
        count(when(col("_tok").isNotNull && col("_in_vocab").isNull, 1))
          .as("n_oov"))
      .withColumn("oov_rate",
        when(col("n_tokens") === 0, 0.0)
          .otherwise(col("n_oov").cast("double") / col("n_tokens")))
  }

  /** PMI collocation mining: adjacent word pairs whose co-occurrence is
    * improbably high given their unigram frequencies — multiword
    * expressions ("new york", "machine learning") that tokenization and
    * dedup pipelines treat as units. Emits
    * `(w1, w2, c_pair, pmi_ratio)` for pairs seen ≥ `minCount` times,
    * where `pmi_ratio = c(w1,w2)·N / (c(w1)·c(w2))` — the PMI's
    * argument, kept rational instead of logged: it ranks identically
    * (log is monotone) and every engine computes the identical double
    * from exact integer products. Products go through decimal(18)² →
    * decimal(37) so they are exact far past BIGINT range.
    *
    * Scale shape: bigram extraction is a narrow zip of two array
    * slices; the pair aggregate shuffles (w1, w2) keys with map-side
    * combine; unigram counts are vocabulary-sized and broadcast back.
    * The `minCount` filter applies BEFORE the unigram joins, so the
    * joined row count is the (tiny) surviving-pair set. */
  def collocations(df: DataFrame, textCol: String, idCol: String,
      minCount: Long = 5L): DataFrame = {
    val base = df.select(col(idCol),
      filter(words(col(textCol)), w => length(w) > 0).as("ws"))
    val toks = base.select(explode(col("ws")).as("w"))
    val uni = toks.groupBy("w").agg(count(lit(1)).as("c_uni"))
    val nTotal = toks.agg(count(lit(1)).as("n_tokens"))
    val bigrams = base
      .where(size(col("ws")) >= 2)
      .select(explode(arrays_zip(
        slice(col("ws"), lit(1), size(col("ws")) - 1).as("w1"),
        slice(col("ws"), lit(2), size(col("ws")) - 1).as("w2"))).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val pairs = bigrams.groupBy("w1", "w2")
      .agg(count(lit(1)).as("c_pair"))
      .where(col("c_pair") >= minCount)
    def d18(c: Column) = c.cast("decimal(18,0)")
    pairs
      // unigram counts are corpus-vocabulary-sized — no broadcast hint
      // (AQE broadcasts at runtime while they fit); nTotal is one row
      .join(uni.select(col("w").as("w1"), col("c_uni").as("c1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c_uni").as("c2")), Seq("w2"))
      .crossJoin(broadcast(nTotal))
      .select(col("w1"), col("w2"), col("c_pair"),
        round((d18(col("c_pair")) * d18(col("n_tokens"))).cast("double") /
          (d18(col("c1")) * d18(col("c2"))).cast("double"), 6)
          .as("pmi_ratio"))
  }

  /** Per-document unigram entropy H = −Σ_w p_w·ln(p_w) — the diversity
    * signal that separates natural prose from boilerplate/repetition
    * (low-entropy docs are template-like even when long).
    *
    * Determinism: each p·ln(p) term integer-izes at 1e-6 right after
    * the single ln, so the per-doc total is an exact BIGINT sum negated
    * at the end — identical on any engine and summation order.
    * Docs with zero (length>0) tokens have no terms and drop out.
    *
    * Scale: explode → (doc, token) partial-agg groupBy, one doc-keyed
    * window for totals, one final doc groupBy — shuffles carry counts,
    * never text. Emits (idCol, n_tokens, n_types, entropy_micros). */
  def tokenEntropy(df: DataFrame, textCol: String, idCol: String)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol),
        explode(filter(words(col(textCol)), w => length(w) > 0)).as("w"))
      .groupBy(col(idCol), col("w")).agg(count(lit(1)).as("c"))
    val n = sum(col("c")).over(Window.partitionBy(col(idCol)))
    toks.withColumn("_n", n)
      .withColumn("_p", col("c").cast("double") / col("_n").cast("double"))
      .withColumn("_t",
        round(col("_p") * log(col("_p")) * lit(1e6)).cast("long"))
      .groupBy(col(idCol))
      .agg(max(col("_n")).as("n_tokens"), count(lit(1)).as("n_types"),
        (-sum(col("_t"))).as("entropy_micros"))
  }

  /** Zipf slope of the corpus: OLS fit of ln(freq) against ln(rank)
    * over the top `topK` tokens — natural corpora sit near −1; a flat
    * slope flags templated/synthetic text, a steep one a degenerate
    * vocabulary. The corpus-health number next to entropy and TTR.
    *
    * Determinism: ln(rank) and ln(freq) integer-ize at 1e-6 per row
    * (the convention for the two ln calls), the OLS moments are exact
    * decimal sums of those integers (the [[Profile.correlation]]
    * pattern), and the slope is one mirrored-associativity double
    * expression. The ranked set is vocabulary-sized; top-k is a
    * distributed TakeOrdered. Emits (n_ranks, slope). */
  def zipfSlope(df: DataFrame, textCol: String, topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val freq = df.select(
        explode(filter(words(col(textCol)), w => length(w) > 0)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val ranked = freq.orderBy(col("c").desc, col("w").asc).limit(topK)
      .withColumn("r", row_number().over(
        Window.orderBy(col("c").desc, col("w").asc)).cast("long"))
    def q(c: org.apache.spark.sql.Column) =
      round(log(c) * lit(1e6)).cast("decimal(18,0)")
    val m = ranked
      .select(q(col("r").cast("double")).as("x"),
        q(col("c").cast("double")).as("y"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
    val nd = col("n").cast("double")
    def d(c: String) = col(c).cast("double")
    m.select(col("n").as("n_ranks"),
      round((nd * d("sxy") - d("sx") * d("sy")) /
        (nd * d("sxx") - d("sx") * d("sx")), 6).as("slope"))
  }

  /** TextRank keyword extraction: PageRank centrality over the word
    * co-occurrence graph (adjacent-word edges with count ≥
    * `minPairCount`, symmetrized, self-loops dropped) — the Mihalcea &
    * Tarau composition, built here from the bigram machinery +
    * [[Graph.pageRank]]'s exact integer iteration, so the whole
    * ranking is bit-reproducible. Emits the top `k` words:
    * `(word, rank_micros, pos)`.
    *
    * Scale: the graph is vocabulary-sized (count-gated pairs), so the
    * iteration joins tiny tables regardless of corpus size; the corpus
    * pass is the one bigram count. */
  def textRank(df: DataFrame, textCol: String, minPairCount: Long,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // conditional pre-explode spread (see Spread for the measured
    // rationale): the bigram explode amplifies each doc ~|ws|× inside
    // the scan's stage, and a small corpus is one split — the whole
    // corpus pass ran as ONE task; a column-only repartition gets
    // AQE-coalesced right back (sized on pre-explode bytes)
    val base = Spread(df, col(textCol))
      .select(
        filter(words(col(textCol)), w => length(w) > 0).as("ws"))
      .where(size(col("ws")) >= 2)
    val bigrams = base
      .select(explode(arrays_zip(
        slice(col("ws"), lit(1), size(col("ws")) - 1).as("w1"),
        slice(col("ws"), lit(2), size(col("ws")) - 1).as("w2"))).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val pairs = bigrams.groupBy("w1", "w2")
      .agg(count(lit(1)).as("c"))
      .where(col("c") >= minPairCount && col("w1") =!= col("w2"))
    val edges = pairs.select(col("w1").as("src"), col("w2").as("dst"))
      .union(pairs.select(col("w2").as("src"), col("w1").as("dst")))
      .distinct()
    Graph.pageRank(edges, "src", "dst", iters = 5)
      .orderBy(col("rank_micros").desc, col("id").asc).limit(k)
      .withColumn("pos", row_number().over(
        Window.orderBy(col("rank_micros").desc, col("id").asc)))
      .select(col("id").as("word"), col("rank_micros"), col("pos"))
  }

  /** RAKE keyphrase extraction over the corpus: candidate phrases are
    * maximal runs of non-stopwords, word score = degree/freq (degree =
    * Σ phrase lengths over the word's phrase occurrences, co-occurrence
    * including self), phrase score = Σ word scores — the classic
    * unsupervised keyword miner (Rose et al.), here as pure relational
    * ops so it's engine-portable.
    *
    * The consecutive-run grouping is the gaps-and-islands trick:
    * `grp = idx − row_number()` over non-stopword tokens — adjacent
    * survivors share a group, no sequential scan. Word scores
    * integer-ize at 1e-6 after the one division, so phrase totals are
    * exact BIGINT sums and the top-k is deterministic (ties on the
    * phrase text). Emits the top `k` DISTINCT phrases:
    * `(phrase, n_words, n_occurrences, score_micros, rank)`.
    *
    * Scale: shuffles carry (doc, idx, word) tokens and phrase-id
    * aggregates; freq/degree tables are vocabulary-sized and the final
    * top-k is a distributed TakeOrdered. */
  def rakeKeyphrases(df: DataFrame, textCol: String, idCol: String,
      lang: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sw = stopwords(lang)
    val toks = Spread(df, col(idCol)).select(col(idCol).as("id"),
        posexplode(filter(words(lower(col(textCol))),
          w => length(w) > 0)).as(Seq("idx", "w")))
    // r16 reshape (guide §2.4 — remove shuffles/joins outright): the
    // phrase length rides each TOKEN as a second window over the same
    // (id) partitioning (no new exchange), so degree needs no ns⋈ph
    // join, freq+degree collapse into ONE vocabulary aggregate, and the
    // phrase string is built inside the scoring aggregate — the two
    // corpus-token-sized ns⋈ph joins of the textbook formulation
    // disappear. Scores and phrases are bit-identical (same tokens,
    // same folds; TextAnalysisSpec pins the output).
    // persisted (r17): `ns` feeds both the vocabulary aggregate and the
    // scoring probe — two physical subtrees that each re-ran the explode
    // and BOTH (id)-keyed window sorts (ReuseExchange only dedups up to
    // the spread exchange below them). Window-izing the score instead
    // (count/sum over partition w) would compute ns once but add two
    // full token-sized exchanges, losing the broadcast join's free
    // probe; the cache keeps the broadcast shape at one compute.
    val ns = toks.where(!col("w").isin(sw: _*))
      .withColumn("grp", col("idx") - row_number().over(
        Window.partitionBy("id").orderBy("idx")))
      .withColumn("len", count(lit(1)).over(
        Window.partitionBy("id", "grp")))
      .persist()
    val sc = ns.groupBy("w")
      .agg(count(lit(1)).as("f"), sum(col("len")).as("d"))
      .select(col("w"),
        round(col("d").cast("double") / col("f").cast("double") *
          lit(1e6)).cast("long").as("s"))
    val pScore = ns
      .join(sc, "w") // per-word scores are vocab-sized — AQE decides
      .groupBy(col("id"), col("grp"))
      .agg(max(col("len")).as("len"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("idx"), col("w")))),
          x => x.getField("w"))).as("phrase"),
        sum(col("s")).as("score"))
    val agg = pScore.groupBy(col("phrase"))
      .agg(max(col("len")).as("n_words"),
        count(lit(1)).as("n_occurrences"),
        max(col("score")).as("score_micros"))
    agg.orderBy(col("score_micros").desc, col("phrase").asc).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score_micros").desc, col("phrase").asc)))
  }

  /** Pairwise vocabulary Jaccard between sources — the corpus-mixing
    * diagnostic (near-identical vocabularies ⇒ redundant sources;
    * disjoint ⇒ a domain gap). Exact integers end to end: distinct
    * (source, token) sets, token-keyed intersection counts, and
    * |A∪B| by inclusion–exclusion; the only division is the final
    * rational Jaccard.
    *
    * Scale: the shuffle unit is the DISTINCT (source, token) pair set —
    * vocabulary-sized, not corpus-sized; the token self-join fans out
    * at most |sources| per token. Emits one row per unordered source
    * pair `(source_a < source_b)`. */
  def sourceVocabOverlap(df: DataFrame, sourceCol: String,
      textCol: String): DataFrame = {
    val vocab = df.select(col(sourceCol).as("s"),
        explode(filter(words(col(textCol)), w => length(w) > 0)).as("w"))
      .distinct()
    val sizes = vocab.groupBy(col("s")).agg(count(lit(1)).as("n"))
    val pairs = vocab.as("a")
      .join(vocab.as("b"),
        col("a.w") === col("b.w") && col("a.s") < col("b.s"))
      .groupBy(col("a.s").as("source_a"), col("b.s").as("source_b"))
      .agg(count(lit(1)).as("n_common"))
    pairs
      .join(broadcast(sizes.select(col("s").as("source_a"),
        col("n").as("v_a"))), Seq("source_a"))
      .join(broadcast(sizes.select(col("s").as("source_b"),
        col("n").as("v_b"))), Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("v_a"), col("v_b"),
        col("n_common"),
        round(col("n_common").cast("double") /
          (col("v_a") + col("v_b") - col("n_common")).cast("double"), 6)
          .as("jaccard"))
  }
}
