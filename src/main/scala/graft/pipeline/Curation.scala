package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation operators: deterministic stratified sampling,
  * token-budget sequence packing, benchmark-contamination measurement,
  * and exact heavy-hitter tokens. All are DuckDB-oracle-reproducible:
  * sampling and bucketing decisions come from md5 (bit-identical in both
  * engines), never from engine RNG.
  *
  * Scale notes per operator are on the methods; the common theme is that
  * every decision is a pure projection over the row (sampling, packing
  * bin) or a broadcast-side lookup (contamination), so the corpus scan
  * stays narrow — the only shuffles are per-group aggregates over keys
  * whose cardinality is data-independent (languages, benchmark hits,
  * vocabulary).
  */
object Curation {

  /** Deterministic hash bucket in [0, 4096): the top 24 bits of md5 taken
    * mod 4096. Both engines compute the identical value
    * (`('0x' || substr(md5(x),1,6))::BIGINT % 4096` in DuckDB), so a
    * sample is reproducible across engines, runs, and cluster sizes —
    * unlike `rand()`-based sampling, which is neither. */
  def hashBucket(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 6), 16, 10)
      .cast("long") % 4096

  /** Stratified sampling with per-stratum rates: keep a row iff its id's
    * hash bucket falls under `rate(stratum) × 4096` (rate resolution
    * 1/4096). Rates are a small driver-side map compiled to a CASE chain
    * — the sample is a pure narrow filter over the scan: no join, no
    * shuffle, no RNG state, and adding executors cannot change which
    * rows are kept. Reproducibility is what makes a 100 TB curation run
    * auditable: re-running the pipeline selects the exact same corpus.
    *
    * NULL handling (both deliberate, neither a silent drop): a NULL id
    * hashes via the `"null"` sentinel key (same convention as the CDC
    * tenant gate) so NULL-id rows are sampled like any other, and a NULL
    * stratum falls through the CASE chain to `defaultRate`. */
  def stratifiedSample(
      df: DataFrame,
      stratumCol: String,
      idCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 0.0): DataFrame = {
    def cap(rate: Double): Column = lit(math.floor(rate * 4096).toLong)
    val threshold = rates.toSeq.sortBy(_._1)
      .foldRight(cap(defaultRate)) { case ((k, r), acc) =>
        when(col(stratumCol) === k, cap(r)).otherwise(acc)
      }
    val key = coalesce(col(idCol).cast("string"), lit("null"))
    df.where(hashBucket(key) < threshold)
  }

  /** Exact per-stratum budget sampling: EXACTLY `min(n, |stratum|)` rows
    * per stratum (versus [[stratifiedSample]]'s rate-proportional
    * expectation) — the mixture-execution primitive for "give me
    * precisely N documents per source". Selection order is the
    * deterministic pseudo-random permutation `(md5(id), id)` — no RNG,
    * so the chosen set is identical across engines, runs, and cluster
    * sizes, and growing the corpus only ever swaps rows whose hash
    * moved, never reshuffles everything.
    *
    * Scale: a naive rank-per-stratum window funnels EVERY row of a
    * stratum through one reducer — a straggler at 100 TB where one
    * source dominates. This is two-phase: phase 1 ranks within
    * (stratum × input partition) and keeps ≤ n per cell (parallel width
    * = number of scan partitions, no data-dependent skew), so phase 2's
    * exact global rank per stratum sees at most n × P rows — bounded by
    * the budget, not the corpus. */
  def takeExactN(df: DataFrame, stratumCol: String, idCol: String,
      n: Int): DataFrame = {
    require(n > 0, "n must be positive")
    val key = coalesce(col(idCol).cast("string"), lit("null"))
    val ordered = df.withColumn("_h", md5(key))
      .withColumn("_pid", spark_partition_id())
    val preW = Window.partitionBy(col(stratumCol), col("_pid"))
      .orderBy(col("_h"), col(idCol))
    val finW = Window.partitionBy(col(stratumCol))
      .orderBy(col("_h"), col(idCol))
    ordered
      .withColumn("_pr", row_number().over(preW)).where(col("_pr") <= n)
      .withColumn("_r", row_number().over(finW)).where(col("_r") <= n)
      .drop("_h", "_pid", "_pr", "_r")
  }

  /** Token-budget packing: assign each document a bin id such that bin
    * boundaries fall every `budget` tokens along the (partition, order)
    * sequence — `bin = floor(exclusive-running-sum / budget)`, the
    * ordered-chunking strategy (a bin may overflow by at most one
    * document; true next-fit needs a sequential scan and is not
    * cross-engine reproducible in SQL).
    *
    * Scale: the window partitions by (stratum, shard) — `nShards`
    * spreads a hot stratum over the cluster instead of funneling one
    * language's entire corpus through a single window task. Each
    * partition's pack is independent; at 1000 executors the shuffle is
    * one exchange on the composite key.
    *
    * The pack identity is the COMPOSITE key `(stratumCol, shard, bin_id)`
    * — `bin_id` restarts at 0 in every (stratum, shard) partition, so
    * grouping by `bin_id` alone would silently merge unrelated bins when
    * `nShards > 1`. The emitted `pack_key` column encodes the composite
    * so downstream grouping cannot get this wrong. */
  def packTokenBudget(
      df: DataFrame,
      stratumCol: String,
      orderCol: String,
      tokensCol: Column,
      budget: Long,
      nShards: Int = 1): DataFrame = {
    val shard = pmod(col(orderCol), lit(nShards)).as("shard")
    val staged = df.withColumn("shard", shard)
      .withColumn("n_tokens", tokensCol)
    val w = Window.partitionBy(stratumCol, "shard").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    staged.withColumn("bin_id",
        floor(coalesce(sum(col("n_tokens")).over(w), lit(0L)) / budget))
      .withColumn("pack_key",
        concat_ws("#", col(stratumCol), col("shard"), col("bin_id")))
  }

  /** Materialize packed training sequences from [[packTokenBudget]]
    * output: concatenate each pack's documents in `orderCol` order with
    * `sep` (an end-of-document marker), carrying doc and token counts.
    *
    * Scale: one groupBy on the composite `pack_key` — the same key the
    * packing window already partitioned by plus the bin, so cardinality
    * is corpus_tokens/budget and every group holds ≈budget tokens of
    * text: the collect_list per group is bounded by the pack budget by
    * construction, never by corpus size. */
  def materializePacks(packed: DataFrame, textCol: String,
      orderCol: String, sep: String = "<|eod|>"): DataFrame =
    packed.groupBy(col("pack_key"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("pack_tokens"),
        array_join(
          transform(
            sort_array(collect_list(struct(col(orderCol), col(textCol)))),
            x => x.getField(textCol)),
          sep).as("pack_text"))

  /** Near-duplicate cross-split leakage: given a split assignment
    * `(idCol, split)` and ANY near-dup pair list (minhash, simhash,
    * jaccard, embedding), flag TRAIN docs that near-duplicate a TEST
    * doc — the leak [[leakageGuardedSplit]]'s exact-digest guard cannot
    * see. Returns `(idCol, split, near_dup_leak)`.
    *
    * Scale: pairs symmetrize (one union, no shuffle), semi-join against
    * the test side on the pair endpoint, distinct leak ids, LEFT join
    * back — every shuffle is keyed on the doc id; the pair list is the
    * expensive input and it was already computed by the dedup pass the
    * pipeline runs anyway. */
  def nearDupLeaks(split: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String = "id_a", bCol: String = "id_b"): DataFrame = {
    val sym = pairs.select(col(aCol).as("x"), col(bCol).as("y"))
      .union(pairs.select(col(bCol).as("x"), col(aCol).as("y")))
    val testIds = split.where(col("split") === "test")
      .select(col(idCol).as("y"))
    val leakIds = sym.join(testIds, Seq("y"), "left_semi")
      .select(col("x").as(idCol)).distinct().withColumn("_nd", lit(true))
    split.join(leakIds, Seq(idCol), "left")
      .select(col(idCol), col("split"),
        (col("split") === "train" && col("_nd").isNotNull).as("near_dup_leak"))
  }

  /** Benchmark contamination: for each document, the fraction of its
    * distinct word n-gram shingles that appear in the benchmark set —
    * the standard train/test-overlap check before training on scraped
    * data.
    *
    * Scale: the benchmark side is aggregated to DISTINCT shingles and
    * broadcast (benchmarks are small — thousands of docs — versus the
    * corpus); the corpus explodes to (doc, shingle) rows once, probes
    * the broadcast hash set, and aggregates hit counts per doc. The
    * per-doc shingle totals ride along in the same pass (grouped after
    * the semi-probe, no second scan). Nothing corpus-sized is ever
    * broadcast or collected.
    *
    * Documents with fewer than `shingleN` words have no shingles to
    * overlap and score `contamination = 0.0` (kept in the output via
    * `explode_outer`, not dropped and not a crash — short and empty docs
    * are ubiquitous in scraped corpora). Words arrays are staged as
    * attributes before shingling so the tokenizer runs once per doc, not
    * once per shingle (HOF lambdas don't share subexpressions). */
  def contamination(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      benchmark: DataFrame,
      benchTextCol: String,
      shingleN: Int = 3,
      threshold: Double = 0.1): DataFrame = {
    val docSh = Spread(docs, col(idCol))
      .withColumn("_ws", TextAnalysis.words(col(textCol)))
      .select(col(idCol), Dedup.shinglesOfWords(col("_ws"), shingleN).as("sh"))
      .select(col(idCol), size(col("sh")).as("n_shingles"),
        explode_outer(col("sh")).as("shingle"))
    val benchSh = benchmark
      .withColumn("_ws", TextAnalysis.words(col(benchTextCol)))
      .select(explode(Dedup.shinglesOfWords(col("_ws"), shingleN)).as("shingle"))
      .distinct()
    docSh
      .join(broadcast(benchSh).withColumn("_hit", lit(1)), Seq("shingle"), "left")
      .groupBy(col(idCol), col("n_shingles"))
      .agg(sum(coalesce(col("_hit"), lit(0))).as("n_hits"))
      .withColumn("contamination",
        when(col("n_shingles") === 0, lit(0.0))
          .otherwise(round(col("n_hits").cast("double") / col("n_shingles"), 6)))
      .withColumn("contaminated", col("contamination") >= threshold)
  }

  /** Per-source mixing report — the numbers a pipeline reads before
    * choosing [[stratifiedSample]] rates: document and token volume,
    * exact-dup rate, and corpus share per source. One hash aggregate
    * keyed by source; the share column is a window over the AGGREGATED
    * rows (source cardinality — hundreds, not corpus-sized — so the
    * single-partition global window is a non-issue; the corpus scan
    * itself never re-partitions). */
  def sourceMixReport(
      df: DataFrame, sourceCol: String, textCol: String): DataFrame = {
    val agg = df
      .select(col(sourceCol), md5(col(textCol)).as("digest"),
        TextAnalysis.tokenCount(col(textCol)).as("toks"))
      .groupBy(sourceCol)
      .agg(count(lit(1)).as("n_docs"),
        (count(lit(1)) - countDistinct(col("digest"))).as("n_exact_dups"),
        sum(col("toks")).as("total_tokens"),
        round(avg(col("toks")), 6).as("mean_tokens"))
    agg.withColumn("share_docs",
      round(col("n_docs").cast("double") /
        sum(col("n_docs")).over(Window.partitionBy()), 6))
  }

  /** Per-source sampling rates that hit a target token MIXTURE under a
    * total token budget: rate(s) = min(1, share(s)·budget / tokens(s)).
    * Driver-side pure arithmetic over the [[sourceMixReport]] output
    * (source cardinality rows) — the result feeds [[stratifiedSample]],
    * so the actual row selection stays a reproducible narrow filter.
    * Sources missing from `targetShares` get rate 0 (explicitly out of
    * the mixture); a source with fewer tokens than its target share
    * caps at 1.0 (cannot oversample without replacement — the shortfall
    * is reported by comparing achieved vs target downstream). */
  def mixtureRates(
      tokensBySource: Map[String, Long],
      targetShares: Map[String, Double],
      tokenBudget: Long): Map[String, Double] =
    tokensBySource.map { case (s, toks) =>
      val share = targetShares.getOrElse(s, 0.0)
      val want = share * tokenBudget
      s -> (if (toks <= 0) 0.0 else math.min(1.0, want / toks))
    }

  /** Temperature-scaled source mixing (the multilingual/multi-source
    * α-sampling rule: weight(s) ∝ tokens(s)^α, α < 1 upweights
    * low-resource sources): per-source sampling rates hitting a total
    * token budget under the tempered distribution,
    * `rate(s) = min(1, q(s)·budget / tokens(s))` with
    * `q(s) = w(s)/Σw`. One source-keyed aggregate (source-cardinality
    * output), weights integer-ized at 1e-6 so Σw is an exact BIGINT —
    * the rates are identical on any engine or partitioning. α = 0.5
    * (the default) evaluates via `sqrt`, which IEEE requires correctly
    * rounded — bit-exact everywhere; other α go through `pow`, where
    * the last ulp is only conventionally identical (fine at the 1e-6
    * rounding grain). Feed the result into [[stratifiedSample]] for the
    * actual (narrow, reproducible) row selection. */
  def temperatureMixRates(df: DataFrame, sourceCol: String,
      textCol: String, tokenBudget: Long,
      alpha: Double = 0.5): DataFrame =
    ratesFromTokenAgg(
      df.select(col(sourceCol),
          TextAnalysis.tokenCount(col(textCol)).as("toks"))
        .groupBy(sourceCol).agg(sum(col("toks")).as("n_tokens")),
      sourceCol, tokenBudget, alpha)

  /** [[temperatureMixRates]] over a PRECOMPUTED per-row token count —
    * for pipelines that already carry the count (e.g. a span-dedup
    * stage's `n_kept`), where re-tokenizing the text column would be a
    * second full corpus pass for a number the frame already holds.
    * Identical output whenever `countCol` equals the text column's
    * token count (for single-space-joined reassembled text that is
    * exact by construction). */
  def temperatureMixRatesByCount(df: DataFrame, sourceCol: String,
      countCol: String, tokenBudget: Long,
      alpha: Double = 0.5): DataFrame =
    ratesFromTokenAgg(
      df.groupBy(sourceCol).agg(sum(col(countCol)).as("n_tokens")),
      sourceCol, tokenBudget, alpha)

  private def ratesFromTokenAgg(agg: DataFrame, sourceCol: String,
      tokenBudget: Long, alpha: Double): DataFrame = {
    val weight =
      if (alpha == 0.5) sqrt(col("n_tokens"))
      else pow(col("n_tokens"), lit(alpha))
    val weighted = agg.withColumn("w_micro",
      round(weight * lit(1e6)).cast("long"))
    val tot = weighted.agg(sum(col("w_micro")).as("w_total"))
    weighted.crossJoin(broadcast(tot))
      .select(col(sourceCol), col("n_tokens"),
        round(least(lit(1.0),
          col("w_micro").cast("double") / col("w_total") *
            tokenBudget / col("n_tokens")), 6).as("rate"))
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-Res),
    * derandomized: each row's "uniform" draw is md5-derived
    * (`u = (bucket+1)/4096`, the same reproducible convention as
    * [[hashBucket]]), its priority is `ln(u)/w` (monotone-equivalent to
    * the classic `u^(1/w)`; higher weight → priority nearer zero →
    * likelier kept), and the sample is the top-`n` priorities.
    * Integer-ized at 1e-6 with an id tie-break, so the selected set is
    * bit-reproducible across engines, runs, and cluster sizes — a
    * quality-weighted corpus sample you can re-derive during an audit.
    * One narrow projection + a distributed TakeOrdered: no shuffle of
    * the corpus, no RNG state. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      n: Int, seed: String = "ws"): DataFrame = {
    val key = concat_ws(":", lit(seed),
      coalesce(col(idCol).cast("string"), lit("null")))
    df.where(col(weightCol) > 0)
      .withColumn("_u", (hashBucket(key) + 1).cast("double") / 4096)
      .withColumn("priority_micro",
        round(log(col("_u")) / col(weightCol) * lit(1e6)).cast("long"))
      .orderBy(col("priority_micro").desc, col(idCol).asc)
      .limit(n)
      .select(col(idCol), col(weightCol), col("priority_micro"))
  }

  /** Per-group TOP-P (nucleus) selection: within each group keep the
    * best rows — ordered by `scoreCol` desc — until they cover fraction
    * `p` of the group's total score mass (the row that crosses the
    * boundary is kept, so coverage is ≥ p). The "keep only the best
    * half of every source, by mass not by count" curation rule. Exact
    * integer arithmetic throughout (running sums of the raw score
    * column); deterministic (score desc, id asc) order. One shuffle on
    * the group key; the running sum is a windowed cumsum within each
    * group, never global. */
  def topPByGroup(df: DataFrame, groupCol: String, idCol: String,
      scoreCol: String, p: Double): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(col(groupCol))
    df.withColumn("_cum", sum(col(scoreCol)).over(w))
      .withColumn("_tot", sum(col(scoreCol)).over(tot))
      .where((col("_cum") - col(scoreCol)).cast("double") <
        lit(p) * col("_tot"))
      .select(col(groupCol), col(idCol), col(scoreCol),
        col("_cum").as("cum_score"))
  }

  /** Exact top-k tokens with a deterministic tie-break (count desc, token
    * asc) — the honest version of heavy hitters when the vocabulary fits
    * a shuffle (it does: token vocabulary is data-independent-ish and
    * tiny next to the corpus). Partial map-side aggregation collapses
    * each partition to its local vocabulary before the exchange; the
    * final top-k is a TakeOrdered, never a global sort materialization.
    */
  def topKTokens(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(explode(TextAnalysis.words(col(textCol))).as("token"))
      .where(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(k)

  /** Deterministic train/test split with an exact-duplicate leakage
    * guard: assignment by id hash bucket (`test` iff bucket <
    * testRate·4096 — same reproducible md5 convention as
    * [[stratifiedSample]]), then every TRAIN document whose content
    * digest also appears in TEST is flagged `is_leak` (a held-out
    * evaluation document that is trainable verbatim measures memory,
    * not generalization). Returns `(idCol, split, is_leak)`; callers
    * drop or keep flagged rows by policy.
    *
    * Scale: assignment is a pure narrow projection; the leak check is a
    * digest-keyed LEFT join with both sides shuffled on md5(text). The
    * test-side digest set at 100 TB is itself TB-sized, so it is NOT
    * broadcast; a Bloom-filter pre-pass would cut the shuffle but
    * admits false positives — wrong for a purge gate, fine as a
    * pre-filter in front of this exact join if the shuffle ever
    * dominates. Near-duplicate leakage composes: feed
    * [[Dedup.minhashNearDups]] pairs that cross the split into the same
    * flag. */
  def leakageGuardedSplit(df: DataFrame, textCol: String, idCol: String,
      testRate: Double): DataFrame = {
    val cap = lit(math.floor(testRate * 4096).toLong)
    val key = coalesce(col(idCol).cast("string"), lit("null"))
    // NULL text coalesces to '' before hashing (mirroring the id
    // NULL-sentinel convention above): a NULL digest would make the
    // left-join emit is_leak=false while a SQL `IN` oracle evaluates
    // NULL, and a NULL-text train doc would silently never be flagged
    // against NULL-text test docs.
    // r17 reshape (guide §2.4, the duplicateSpans window pattern): the
    // digest-match used to be distinct + join-back, which exchanged the
    // doc rows twice AND ran the full-document md5 battery once per
    // branch — single-task on a one-split table (BatteryScan). One
    // window count over the digest partition answers "does any TEST row
    // share this digest" with ONE battery pass and ONE exchange; the
    // conditional Spread parallelizes the md5 below it.
    // digest EvalOnce-fenced (the Dedup.exactPairs precedent): it
    // becomes a window partition key, and the inferred key constraint
    // otherwise inlines a SECOND full-document md5 into the scan filter
    // (DupExprScan cross-node)
    val assigned = Spread(df, col(idCol))
      .select(col(idCol),
        graft.plans.EvalOnce.of(md5(coalesce(col(textCol), lit(""))))
          .as("digest"),
        when(hashBucket(key) < cap, "test").otherwise("train").as("split"))
    val testHits = count(when(col("split") === "test", lit(1)))
      .over(Window.partitionBy("digest"))
    assigned.withColumn("_tc", testHits)
      .select(col(idCol), col("split"),
        (col("split") === "train" && col("_tc") > 0).as("is_leak"))
  }

  /** Deterministic global shuffle into output shards — the final step of
    * a training-data export (batch diversity needs documents decorrelated
    * from crawl/source order, and the order must be REPRODUCIBLE so a
    * resumed or re-run export yields byte-identical shards; `rand()`
    * cannot promise that across cluster sizes).
    *
    * Each row gets a pseudo-random but deterministic position:
    * `shard = top-24-md5-bits(seed:id) mod nShards`, `pos` = rank of the
    * full digest within the shard. One shuffle, keyed by the shard —
    * exactly the write partitioning the export needs (`repartition` on
    * `shard` then `sortWithinPartitions` at the call site writes each
    * shard in a single sequential pass); the per-shard sort is
    * shard-sized, ~n/nShards, never global. NULL ids hash via the
    * `"null"` sentinel like every other md5 decision in this file. */
  def deterministicShuffle(df: DataFrame, idCol: String, seed: String,
      nShards: Int): DataFrame = {
    val key = md5(concat_ws(":", lit(seed),
      coalesce(col(idCol).cast("string"), lit("null"))))
    df.withColumn("_k", key)
      .withColumn("shard",
        conv(substring(col("_k"), 1, 6), 16, 10).cast("long") % nShards)
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("_k"), col(idCol))))
      .select(col(idCol), col("shard"), col("pos"))
  }

  /** Three-way train/val/test assignment by md5 hash range — the
    * stable split every run must agree on: a document's split never
    * changes when the corpus grows (pure function of id + seed), which
    * is what keeps eval sets eval sets across snapshots. Pure narrow
    * projection, zero shuffles. */
  def threeWaySplit(df: DataFrame, idCol: String, seed: String,
      trainPct: Int, valPct: Int): DataFrame = {
    require(trainPct > 0 && valPct > 0 && trainPct + valPct < 100)
    val key = md5(concat_ws(":", lit(seed),
      coalesce(col(idCol).cast("string"), lit("null"))))
    val bucket = conv(substring(key, 1, 6), 16, 10).cast("long") % 100
    df.select(col(idCol), bucket.as("bucket"),
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + valPct, "val")
        .otherwise("test").as("split"))
  }

  /** Materialize a training-ready shard layout: every row joined to its
    * [[deterministicShuffle]] (shard, pos) and written as
    * `outDir/shard=K/` parquet with rows sorted by `pos` inside each
    * shard — the byte-stable export a dataloader consumes, identical
    * across re-runs and cluster sizes.
    *
    * Scale: one id-keyed join to the (id, shard, pos) table, one
    * repartition on shard (each shard written by one task, so file
    * count and row order are layout-independent), sortWithinPartitions
    * for the in-file order. */
  def writeShards(df: DataFrame, idCol: String, seed: String,
      nShards: Int, outDir: String): Unit = {
    val sharded = df.join(
      deterministicShuffle(df, idCol, seed, nShards), idCol)
    sharded.repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.partitionBy("shard").mode("overwrite").parquet(outDir)
  }

  /** Curriculum binning: rank every row by a difficulty score (ties on
    * id) and cut the exact global rank order into `nBins` rank-equal
    * bands — `bin = ((rank−1)·nBins) div N`. Returns per-bin stats
    * `(bin, n_rows, min_score, max_score, sum_score)` — the schedule a
    * curriculum loader trains through easy→hard.
    *
    * Scale: the exact global rank is TWO-PHASE, never a one-partition
    * window — a range repartition on (score, id), per-partition local
    * row_numbers, then partition offsets from a partition-count-sized
    * collect. The rank formula (not ntile) is used so the band rule is
    * explicit and engine-portable. */
  def curriculumBins(df: DataFrame, scoreCol: String, idCol: String,
      nBins: Int): DataFrame = {
    require(nBins >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    val parts = df
      .select(col(idCol), col(scoreCol).cast("long").as("_score"))
      .repartitionByRange(col("_score"), col(idCol))
      .withColumn("_pid", spark_partition_id())
    // persisted: consumed twice (offset counts + ranked agg); cache
    // ownership is the session loop's (clearCache after the query)
    parts.persist()
    val counts = parts.groupBy(col("_pid")).agg(count(lit(1)).as("_cnt"))
      .as[(Int, Long)].collect().sortBy(_._1)
    val n = counts.map(_._2).sum.max(1L)
    val offsets = counts.map(_._1)
      .zip(counts.map(_._2).scanLeft(0L)(_ + _)).toMap
    val offCol = offsets.foldLeft(lit(0L)) { case (acc, (pid, off)) =>
      when(col("_pid") === pid, off).otherwise(acc)
    }
    val localW = Window.partitionBy(col("_pid"))
      .orderBy(col("_score"), col(idCol))
    val out = parts
      .withColumn("_rank", offCol + row_number().over(localW))
      .withColumn("bin", expr(s"((_rank - 1L) * ${nBins}L) div ${n}L"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_rows"), min(col("_score")).as("min_score"),
        max(col("_score")).as("max_score"),
        sum(col("_score")).as("sum_score"))
    out
  }

  /** Deterministic round-robin interleaving of sources into one global
    * training order: each source's rows get a reproducible per-source
    * rank (md5 permutation, as [[deterministicShuffle]]), and the
    * global position visits rank 1 of every source (source-ordered),
    * then rank 2, … — sources that run out simply drop from later
    * rounds. Emits `(idCol, source, src_rank, pos)`.
    *
    * Scale: the per-source rank is a source-partitioned window; the
    * global position is CLOSED-FORM from the source-size table —
    * pos = Σ_{s'} min(rank−1, n_{s'}) + |{s' < s : n_{s'} ≥ rank}| + 1
    * — evaluated by a broadcast join against the |sources|-row count
    * table and a re-aggregate, so no global window anywhere. */
  def interleaveSources(df: DataFrame, sourceCol: String, idCol: String,
      seed: String): DataFrame = {
    val key = md5(concat_ws(":", lit(seed),
      coalesce(col(idCol).cast("string"), lit("null"))))
    val ranked = df.withColumn("_k", key)
      .withColumn("src_rank", row_number().over(
        Window.partitionBy(col(sourceCol)).orderBy(col("_k"), col(idCol)))
        .cast("long"))
      .select(col(idCol), col(sourceCol).as("source"), col("src_rank"))
    val counts = ranked.groupBy(col("source").as("_s"))
      .agg(count(lit(1)).as("_n"))
    ranked.crossJoin(broadcast(counts))
      .groupBy(col(idCol), col("source"), col("src_rank"))
      .agg((sum(least(col("src_rank") - 1L, col("_n"))) +
        sum(when(col("_n") >= col("src_rank") &&
          col("_s") < col("source"), 1L).otherwise(0L)) + 1L).as("pos"))
  }
}
