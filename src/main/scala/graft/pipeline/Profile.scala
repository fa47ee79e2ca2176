package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the first thing a pipeline runs against an unknown
  * 100 TB table: one row per profiled column with row/null/distinct
  * counts and native min/max (rendered as strings so heterogeneous
  * columns stack into one result).
  *
  * Shape: one full-column aggregate per profiled column, unioned — each
  * aggregate is a partial-then-final hash aggregate over the scan, and
  * Catalyst prunes the scan to exactly the profiled column per branch.
  * Distinct counts are EXACT (countDistinct): approximate HLL sketches
  * are cheaper at scale but engine-specific, which would break the
  * cross-engine determinism this repo treats as a feature — swap in
  * `approx_count_distinct` per call site when 2% error is acceptable. */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.map { c =>
      df.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_s"),
        max(col(c)).cast("string").as("max_s"))
        .select(lit(c).as("column_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_s"), col("max_s"))
    }.reduce(_ unionByName _)

  /** Exact per-stratum quantiles (sort-based `percentile`, linear
    * interpolation): `(stratumCol, p, q)` — one row per requested
    * percentile. Values round at 1e-4 so cross-engine interpolation
    * ulp differences cannot flip the comparison (noise ~1e-13).
    *
    * Exact percentile buffers a stratum's values on its reducer — the
    * deliberate trade for a bit-reproducible answer; at 100 TB per
    * stratum, swap `percentile_approx` (bounded-memory t-digest style
    * sketch) at the call site when ε-error is acceptable. */
  def quantiles(df: DataFrame, stratumCol: String, valueCol: String,
      ps: Seq[Double]): DataFrame =
    df.groupBy(col(stratumCol))
      .agg(percentile(col(valueCol), typedLit(ps)).as("_qs"))
      .select(col(stratumCol), posexplode(col("_qs")).as(Seq("_i", "_q")))
      .select(col(stratumCol),
        element_at(typedLit(ps), col("_i").cast("int") + 1).as("p"),
        round(col("_q"), 4).as("q"))

  /** The TB-scale swap for [[quantiles]]: bounded-memory sketch
    * (`percentile_approx`, Greenwald–Khanna style) with the same output
    * shape. `accuracy` trades memory for rank error ≤ n/accuracy —
    * at accuracy 10⁴ a percentile lands within 0.01·n ranks of exact,
    * independent of stratum size. Engine-specific, so it carries NO
    * DuckDB oracle — its contract is spec-asserted against [[quantiles]]
    * (rank-error bound on skewed data). Use THIS per call site when a
    * stratum stops fitting a reducer; the exact form stays the
    * cross-engine reference. */
  def quantilesApprox(df: DataFrame, stratumCol: String, valueCol: String,
      ps: Seq[Double], accuracy: Int = 10000): DataFrame =
    df.groupBy(col(stratumCol))
      .agg(percentile_approx(col(valueCol), typedLit(ps), lit(accuracy))
        .as("_qs"))
      .select(col(stratumCol), posexplode(col("_qs")).as(Seq("_i", "_q")))
      .select(col(stratumCol),
        element_at(typedLit(ps), col("_i").cast("int") + 1).as("p"),
        col("_q").cast("double").as("q"))

  /** Exact fixed-width histogram per stratum:
    * `(stratumCol, bucket_lo, n)` with `bucket_lo = binWidth ⌊v/binWidth⌋`
    * (integral `div`, so the bucketing is exact at any magnitude —
    * intended for nonnegative integral measures like lengths/counts).
    * One partial-aggregated groupBy; bucket cardinality is value-range /
    * binWidth, data-size-independent. */
  def histogram(df: DataFrame, stratumCol: String, valueCol: String,
      binWidth: Long): DataFrame =
    df.where(col(valueCol).isNotNull)
      .groupBy(col(stratumCol),
        (expr(s"cast($valueCol AS bigint) div ${binWidth}L") * binWidth)
          .as("bucket_lo"))
      .agg(count(lit(1)).as("n"))

  /** Robust per-stratum location/scale: exact median and MAD (median
    * absolute deviation) — the outlier-resistant stats a pipeline uses
    * to winsorize or flag anomalous feature values (mean/stddev move
    * with the outliers they're supposed to catch; median/MAD don't).
    *
    * Two passes by construction (MAD needs the median first): each is
    * one per-stratum sort-based percentile; the median table that joins
    * back is stratum-cardinality and broadcasts. Values round at 1e-4
    * against cross-engine interpolation ulps (same grain as
    * [[quantiles]]); swap approx sketches per call site at TB-sized
    * strata. */
  def robustStats(df: DataFrame, stratumCol: String,
      valueCol: String): DataFrame = {
    val vals = df.where(col(valueCol).isNotNull)
      .select(col(stratumCol), col(valueCol).cast("double").as("_x"))
    val med = vals.groupBy(col(stratumCol))
      .agg(percentile(col("_x"), lit(0.5)).as("_med"))
    vals.join(broadcast(med), stratumCol)
      .select(col(stratumCol), col("_med"),
        abs(col("_x") - col("_med")).as("_ad"))
      .groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n"),
        round(max(col("_med")), 4).as("median"),
        round(percentile(col("_ad"), lit(0.5)), 4).as("mad"))
  }

  /** Exact-sum Pearson correlation per stratum over values quantized at
    * 1e-6 — profiling "are these two measures related" without the
    * nondeterminism of floating-point aggregation: a plain `corr()` sums
    * doubles in partition order, so two runs of the SAME engine can
    * disagree in the last ulps. Here each value becomes an integer
    * (`round(v·1e6)` as DECIMAL), the five moment sums are EXACT decimal
    * arithmetic (order-independent), and the closed-form r is computed
    * once from those sums in double — identical on any engine, any
    * partitioning, any cluster size. One partial-aggregated groupBy.
    * Decimal(18) inputs bound the product sums at decimal(38): exact to
    * ~1e37, far past any real corpus. */
  def correlation(df: DataFrame, stratumCol: String, xCol: String,
      yCol: String): DataFrame = {
    def q(c: String) = round(col(c) * lit(1e6)).cast("decimal(18,0)")
    val agg = df.where(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(stratumCol), q(xCol).as("xi"), q(yCol).as("yi"))
      .groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n"),
        sum(col("xi")).as("sx"), sum(col("yi")).as("sy"),
        sum(col("xi") * col("yi")).as("sxy"),
        sum(col("xi") * col("xi")).as("sxx"),
        sum(col("yi") * col("yi")).as("syy"))
    val nd = col("n").cast("double")
    def d(c: String) = col(c).cast("double")
    agg.select(col(stratumCol), col("n"),
      round(
        (nd * d("sxy") - d("sx") * d("sy")) /
          sqrt(nd * d("sxx") - d("sx") * d("sx")) /
          sqrt(nd * d("syy") - d("sy") * d("sy")), 6).as("r"))
  }

  /** Gini coefficient of a count distribution — "how concentrated is
    * activity/data across keys" (0 = perfectly even, →1 = one key owns
    * everything): the imbalance number a mixing/sharding decision
    * reads. Formula over counts sorted ascending with rank i:
    * G = (2·Σ i·cᵢ) / (n·Σcᵢ) − (n+1)/n.
    *
    * Exactness: counts and the rank-weighted sum are exact integers
    * (ranks from a total (count, key) order), the two divisions happen
    * on exact-int inputs and subtract once — mirrored associativity,
    * identical doubles, rounded at 1e-6. Scale: the ranked set is
    * KEY-cardinality (not row-cardinality); the one window runs over
    * |keys| rows. */
  def giniConcentration(df: DataFrame, keyCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df.groupBy(col(keyCol).as("_k"))
      .agg(count(lit(1)).as("c"))
    // global (c, _k) ranks WITHOUT a single-task window: the ranked set is
    // key-cardinality — billions at corpus scale — so rank two-phase like
    // curriculumBins: range-partition on the order keys, rank within each
    // partition, add per-partition offsets (a partition-COUNT-sized
    // driver map, never data). Persisted: consumed twice (offsets + agg);
    // cache ownership is the session loop's (clearCache after the query).
    val parts = counts
      .repartitionByRange(col("c").asc, col("_k").asc)
      .withColumn("_pid", spark_partition_id())
    parts.persist()
    val offs = parts.groupBy(col("_pid")).agg(count(lit(1)).as("_cnt"))
      .as[(Int, Long)].collect().sortBy(_._1)
    val offsets = offs.map(_._1).zip(offs.map(_._2).scanLeft(0L)(_ + _)).toMap
    val offCol = offsets.foldLeft(lit(0L)) { case (acc, (pid, off)) =>
      when(col("_pid") === pid, off).otherwise(acc)
    }
    val localW = Window.partitionBy(col("_pid"))
      .orderBy(col("c").asc, col("_k").asc)
    val ranked = parts.withColumn("i",
      (offCol + row_number().over(localW)).cast("long"))
    ranked.agg(count(lit(1)).as("n_keys"), sum(col("c")).as("n_rows"),
        sum(col("i") * col("c")).as("_s"))
      .select(col("n_keys"), col("n_rows"),
        round((lit(2.0) * col("_s").cast("double")) /
          (col("n_keys") * col("n_rows")).cast("double") -
          (col("n_keys") + 1L).cast("double") /
            col("n_keys").cast("double"), 6).as("gini"))
  }

  /** Pearson χ² independence statistic for two categorical columns —
    * "is language independent of source?" is the first question about
    * a stratified corpus. Observed counts are exact; each cell's
    * (O−E)²/E term (E = row·col/N, a rational of exact products)
    * integer-izes at 1e-6 so the total is an exact BIGINT sum. Emits
    * one row: (n_cells, dof, chisq_micros).
    *
    * Scale: one (a, b) partial-agg groupBy; marginals come from two
    * windows over the cells table (cells-sized, tiny), never a second
    * scan. */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(aCol).as("_a"), col(bCol).as("_b"))
      .agg(count(lit(1)).as("_o"))
    // the statistic sums over ALL R×C cells — absent combinations are
    // O=0 cells contributing E each, so rebuild the full grid from the
    // observed category values (R×C rows, tiny) before the windows
    val cells = df.select(col(aCol).as("_a")).distinct()
      .crossJoin(df.select(col(bCol).as("_b")).distinct())
      .join(counts, Seq("_a", "_b"), "left")
      .withColumn("o", coalesce(col("_o"), lit(0L)))
    val withMarg = cells
      .withColumn("rt", sum(col("o")).over(Window.partitionBy("_a")))
      .withColumn("ct", sum(col("o")).over(Window.partitionBy("_b")))
      .withColumn("n", sum(col("o")).over(Window.partitionBy()))
    val e = (col("rt") * col("ct")).cast("double") / col("n").cast("double")
    withMarg
      .withColumn("_e", e)
      .withColumn("_t", round((col("o") - col("_e")) * (col("o") - col("_e"))
        / col("_e") * lit(1e6)).cast("long"))
      .agg(count(lit(1)).as("n_cells"),
        ((countDistinct(col("_a")) - 1) * (countDistinct(col("_b")) - 1))
          .as("dof"),
        sum(col("_t")).as("chisq_micros"))
  }

  /** Row-level robust outlier flags: |x − median| > k·MAD per stratum,
    * emitting the flagged rows. Unlike [[robustStats]] (which reports
    * interpolated medians rounded against cross-engine ulps), the
    * median here is the RANK-BASED lower median — an actual element of
    * the data, no interpolation arithmetic — so med, MAD, and every
    * comparison operand are exact values and the boundary decision is
    * engine-independent without any epsilon.
    *
    * Scale: two ranked passes (median, then MAD over |x−med|), each one
    * window over the stratum key; the per-stratum med/MAD tables
    * broadcast. */
  def outliersMad(df: DataFrame, stratumCol: String, valueCol: String,
      idCol: String, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def lowerMedian(in: DataFrame, c: String, out: String): DataFrame = {
      val w = Window.partitionBy(stratumCol).orderBy(col(c))
      val cw = Window.partitionBy(stratumCol)
      in.withColumn("_rn", row_number().over(w))
        .withColumn("_n", count(lit(1)).over(cw))
        .where(col("_rn") === expr("(_n + 1L) div 2L"))
        .select(col(stratumCol), col(c).as(out))
    }
    val vals = df.where(col(valueCol).isNotNull)
      .select(col(idCol), col(stratumCol),
        col(valueCol).cast("double").as("_x"))
    val med = lowerMedian(vals, "_x", "med")
    val withMed = vals.join(broadcast(med), stratumCol)
      .withColumn("_ad", abs(col("_x") - col("med")))
    val mad = lowerMedian(withMed, "_ad", "mad")
    withMed.join(broadcast(mad), stratumCol)
      .where(col("_ad") > lit(k.toDouble) * col("mad"))
      .select(col(idCol), col(stratumCol), col("_x").as("value"),
        col("med"), col("mad"))
  }

  /** One data-contract rule: `pass` is a Column evaluating to true when a
    * row SATISFIES the expectation (NULL counts as a violation). */
  final case class Expectation(column: String, rule: String, pass: org.apache.spark.sql.Column)

  /** Data-contract audit ("expectations"): one report row per rule with
    * exact violation counts and a 1e-6-rounded violation rate.
    *
    * All rules are evaluated in a SINGLE full scan — one conditional sum
    * per rule inside one partial-then-final aggregate — so auditing 50
    * contracts over 100 TB costs the same scan as auditing one. The
    * per-rule rows are then unpivoted from the single aggregate row
    * (stack), which is constant-sized work. */
  def expectations(df: DataFrame, rules: Seq[Expectation]): DataFrame = {
    val aggs = count(lit(1)).as("_n") +:
      rules.zipWithIndex.map { case (r, i) =>
        sum(when(r.pass.isNull || !r.pass, 1L).otherwise(0L)).as(s"_v$i")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot by exploding structs out of the single aggregate row — a
    // union of per-rule projections would re-plan the scan per branch
    // (measured: 5 rules → 5 scans), the explode keeps it at ONE
    val entries = array(rules.zipWithIndex.map { case (r, i) =>
      struct(lit(r.column).as("column_name"), lit(r.rule).as("rule"),
        col(s"_v$i").as("n_violations"))
    }: _*)
    one.select(col("_n").as("n_rows"), explode(entries).as("e"))
      .select(col("e.column_name").as("column_name"),
        col("e.rule").as("rule"), col("n_rows"),
        col("e.n_violations").as("n_violations"),
        round(col("e.n_violations").cast("double") / col("n_rows"), 6)
          .as("violation_rate"))
  }

  /** Join/aggregation-key skew diagnostic: the top-k heaviest keys with
    * their share of all rows, plus the skew factor max/mean (how many ×
    * the heaviest key exceeds a uniform spread). This is the
    * measurement that decides whether a join needs salting
    * ([[graft.plans.Distribution.saltedJoin]]) BEFORE it falls over at
    * 100 TB — skew is a property you measure, not guess.
    *
    * Exact counts; the only divisions are final rationals of exact
    * integers (share, skew), rounded at 1e-6. One partial-agg groupBy
    * on the key, a 3-number global aggregate, distributed TakeOrdered
    * top-k. */
  def keySkew(df: DataFrame, keyCol: String, topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("cnt"))
    val tot = counts.agg(count(lit(1)).as("n_keys"),
      sum(col("cnt")).as("n_rows"), max(col("cnt")).as("max_cnt"))
    counts.orderBy(col("cnt").desc, col("key").asc).limit(topK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cnt").desc, col("key").asc)))
      .crossJoin(broadcast(tot))
      .select(col("key"), col("cnt"), col("rank"), col("n_keys"),
        col("n_rows"),
        round(col("cnt").cast("double") / col("n_rows").cast("double"), 6)
          .as("share"),
        round(col("max_cnt").cast("double") * col("n_keys").cast("double")
          / col("n_rows").cast("double"), 6).as("skew_factor"))
  }

  /** Population-stability-index drift between a baseline slice and the
    * rest, per stratum: PSI = Σ_bins (p_i − q_i)·ln(p_i/q_i) with add-one
    * smoothed proportions p_i = (b_i+1)/(B+K) over the K observed bins.
    *
    * Determinism: bin counts are exact integers from ONE conditional-sum
    * pass (no separate scans for baseline/current); each PSI term is
    * integer-ized at 1e-6 immediately after the single `ln` call and the
    * per-stratum total is an exact BIGINT sum — order-free and
    * engine-identical. Bins are exact FLOOR-division buckets of the value
    * (Spark's `div` truncates toward zero, DuckDB's `//` floors — they
    * disagree on negatives, so the bin is `div` corrected by the sign of
    * the remainder: -7 with width 5 lands in bin -2 on both engines).
    *
    * Scale: one scan + one (stratum, bin) aggregate + one bin-count
    * window per stratum; state is bins × strata, data-size-independent. */
  def psiDrift(df: DataFrame, stratumCol: String, valueCol: String,
      baselinePred: org.apache.spark.sql.Column, binWidth: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val v = s"cast($valueCol AS bigint)"
    val binned = df.where(col(valueCol).isNotNull)
      .select(col(stratumCol),
        expr(s"$v div ${binWidth}L - (CASE WHEN $v % ${binWidth}L < 0 " +
          "THEN 1 ELSE 0 END)").as("_bin"),
        when(baselinePred, 1L).otherwise(0L).as("_isb"))
    val counts = binned.groupBy(col(stratumCol), col("_bin"))
      .agg(sum(col("_isb")).as("b"),
        sum(lit(1L) - col("_isb")).as("c"))
    val w = Window.partitionBy(stratumCol)
    val tot = counts
      .withColumn("tb", sum(col("b")).over(w))
      .withColumn("tc", sum(col("c")).over(w))
      .withColumn("k", count(lit(1)).over(w))
    val p = (col("b").cast("double") + lit(1.0)) /
      (col("tb") + col("k")).cast("double")
    val q = (col("c").cast("double") + lit(1.0)) /
      (col("tc") + col("k")).cast("double")
    tot
      .withColumn("_p", p).withColumn("_q", q)
      .withColumn("_term",
        round((col("_p") - col("_q")) * log(col("_p") / col("_q")) * lit(1e6))
          .cast("long"))
      .groupBy(col(stratumCol))
      .agg(sum(col("b")).as("n_base"), sum(col("c")).as("n_current"),
        sum(col("_term")).as("psi_micros"))
      .withColumn("drifted", col("psi_micros") > lit(200000L))
  }

  /** Exact heavy hitters WITHOUT a per-key shuffle — the 100 TB companion
    * to [[keySkew]]: keys whose exact count strictly exceeds n/(k+1).
    *
    * Two passes, neither of which shuffles the full key space:
    *  1. sketch pass — one scan folded into a [[graft.plans.MisraGries]]
    *     native aggregate (O(k) state per partition, k-entry partial
    *     buffers merged under the mergeable-summaries rule) plus the
    *     total row count in the same aggregate. The MG bound guarantees
    *     the ≤k candidates cover every key with count > n/(k+1).
    *  2. verify pass — the ≤k candidate keys are BROADCAST back over the
    *     scan (hash semi-match, no shuffle of non-candidates) and counted
    *     exactly; the strict integer threshold cnt·(k+1) > n then makes
    *     the result independent of which extra below-bound candidates
    *     the sketch happened to retain — deterministic across partition
    *     counts, merge orders, and engines.
    *
    * Contrast with [[keySkew]]: that is a full groupBy over every
    * distinct key — exact, but the shuffle scales with key cardinality.
    * This scales with data volume only (two scans, k-bounded state). */
  def heavyHitters(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    val keyed = df.select(col(keyCol).cast("string").as("key"))
    val mg = ColumnBridge.column(
      graft.plans.MisraGries(
        ColumnBridge.expression(col("key")), k).toAggregateExpression())
    val sketchAndN = keyed.agg(mg.as("sk"), count(col("key")).as("n_rows"))
    val cand = sketchAndN
      .select(explode(col("sk")).as("e"), col("n_rows"))
      .select(col("e.key").as("key"), col("n_rows"))
    keyed.join(broadcast(cand), Seq("key"))
      .groupBy(col("key"), col("n_rows"))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * lit((k + 1).toLong) > col("n_rows"))
      .select(col("key"), col("cnt"), col("n_rows"),
        round(col("cnt").cast("double") / col("n_rows").cast("double"), 6)
          .as("share"))
  }

  /** Per-group exact heavy hitters — [[heavyHitters]] stratified by
    * `groupCol` (top talkers per tenant): one MG sketch per group in a
    * single pass (the aggregate composes with groupBy — G·k bounded
    * state, still no per-key shuffle), then one broadcast verify pass
    * over the ≤G·k (group, key) candidates with per-group totals carried
    * in the same aggregate. Same determinism argument as the global
    * form: the strict per-group threshold on exact counts erases the
    * sketch's merge-order-dependent extras. */
  def heavyHittersByGroup(df: DataFrame, groupCol: String, keyCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    val keyed = df.select(col(groupCol).cast("string").as("grp"),
      col(keyCol).cast("string").as("key"))
    val mg = ColumnBridge.column(
      graft.plans.MisraGries(
        ColumnBridge.expression(col("key")), k).toAggregateExpression())
    val cand = keyed.groupBy(col("grp"))
      .agg(mg.as("sk"), count(col("key")).as("n_grp"))
      .select(col("grp"), explode(col("sk")).as("e"), col("n_grp"))
      .select(col("grp"), col("e.key").as("key"), col("n_grp"))
    keyed.join(broadcast(cand), Seq("grp", "key"))
      .groupBy(col("grp"), col("key"), col("n_grp"))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * lit((k + 1).toLong) > col("n_grp"))
      .select(col("grp"), col("key"), col("cnt"), col("n_grp"),
        round(col("cnt").cast("double") / col("n_grp").cast("double"), 6)
          .as("share"))
  }
}
