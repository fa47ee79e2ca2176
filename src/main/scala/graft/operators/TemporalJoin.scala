package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark has no built-in operator for: the backward
  * as-of join (nearest prior match) and the interval/range join — the
  * two enrichment shapes a feature pipeline hits the moment events and
  * reference data live on different clocks ("what was the latest
  * config/price/error BEFORE this event", "which maintenance window
  * contains this point").
  *
  * Neither is expressed as an inequality join here: Catalyst plans a
  * non-equi join as broadcast-nested-loop (or a cartesian per key
  * group), which is quadratic in the hot key. Both operators below
  * compile to ONE hash exchange + narrow work, so the plan survives a
  * 100× scale-up; the predicate nonetheless stays declarative — plain
  * `Column`s all the way, fully inside whole-stage codegen.
  */
object TemporalJoin {

  /** Backward as-of join: for every left row, the single most recent
    * right row on the same key with `right.ts <= left.ts` (ties at the
    * exact same timestamp DO match — same contract as the usual SQL
    * `ASOF JOIN ... ON l.ts >= r.ts`). Left rows with no prior right
    * row keep NULL payload (left-outer semantics).
    *
    * Shape: tag + UNION + keyed running window, NOT a join. Both sides
    * are shuffled ONCE on the key, sorted inside each key by
    * `(ts, side)` with right rows ordered before left rows at equal
    * timestamps, and the right payload is carried forward with
    * `last(ignoreNulls)` over an UNBOUNDED PRECEDING→CURRENT ROW frame
    * (Spark evaluates the running frame incrementally — O(1) per row,
    * no per-row rescan). Total cost: one |L|+|R| exchange + sort for
    * the window, plus one |R|-only exchange for the dedup aggregate
    * below (map-side combined), zero row multiplication, skew bounded
    * by the hottest key's own row count — exactly what a
    * range/inequality join cannot promise.
    *
    * Right rows are first deduplicated to one per `(key, ts)` (greatest
    * payload struct wins, a total deterministic order) so the matched
    * row is engine-reproducible even when the right side carries exact
    * timestamp collisions.
    *
    * Output: every `left` column, then `payload` columns from the
    * matched right row, then `asof_ts_us` (the matched right timestamp
    * as epoch micros; NULL when unmatched). `payload` names must not
    * collide with left column names.
    *
    * @param toleranceUs optional max staleness: matches older than
    *   `left.ts - toleranceUs` are nulled out (the row stays, as-of
    *   left-outer style).
    */
  def asOfBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      toleranceUs: Option[Long] = None): DataFrame = {
    val keyCols = keys.map(col)
    val rStruct = struct(
      unix_micros(col(rightTs)).as("asof_ts_us") +: payload.map(col): _*)
    val rDedup = right
      .groupBy(keyCols :+ unix_micros(col(rightTs)).as("_t"): _*)
      .agg(max(rStruct).as("_r"))
    val lStruct = struct(left.columns.map(col): _*)
    val lTagged = left.select(
      keyCols ++ Seq(unix_micros(col(leftTs)).as("_t"), lit(1).as("_side"),
        lit(null).cast(rDedup.schema("_r").dataType).as("_r"),
        lStruct.as("_l")): _*)
    val rTagged = rDedup.select(
      keyCols ++ Seq(col("_t"), lit(0).as("_side"), col("_r"),
        lit(null).cast(lTagged.schema("_l").dataType).as("_l")): _*)
    val w = Window.partitionBy(keyCols: _*).orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lTagged.unionByName(rTagged)
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
    val gated = toleranceUs match {
      case Some(tol) => matched.withColumn("_m",
        when(col("_t") - col("_m.asof_ts_us") <= tol, col("_m")))
      case None => matched
    }
    gated.select(col("_l.*") +:
      payload.map(p => col(s"_m.$p")) :+ col("_m.asof_ts_us"): _*)
  }

  /** Forward as-of join — the "what happened NEXT" enrichment: for each
    * left row, the EARLIEST right row with `right.ts >= left.ts` on the
    * same keys (outcome labeling, next-error attribution, reaction
    * joins). Mirror image of [[asOfBackward]]: same tag + union + ONE
    * keyed window shape (zero row multiplication, no join operator),
    * realized as the REVERSED sort with the same growing frame — order
    * by (t DESC, side DESC) and gather `last(ignoreNulls)` over
    * [unbounded preceding, current], which is the nearest right row at
    * or above the left's tick. NOT the literal frame flip ([current,
    * unbounded following] + first): that is a SHRINKING frame, which
    * Spark recomputes from scratch per row — O(rows²) per key, the
    * same class the r14 PlanAudit shrinking-frame gate exists for; the
    * reversed growing frame is incremental O(rows) and plans as the
    * identical single sort+window. At equal timestamps the right row
    * is eligible (>=): rights sort before lefts within a tick under
    * DESC(side), landing inside the left's frame. Ties on the same
    * right (key, ts) dedup to the MIN payload struct (the
    * deterministic mirror of backward's latest-wins MAX).
    *
    * @param toleranceUs optional max lookahead: matches later than
    *   `left.ts + toleranceUs` are nulled out (row stays, left-outer
    *   style). */
  def asOfForward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      toleranceUs: Option[Long] = None): DataFrame = {
    val keyCols = keys.map(col)
    val rStruct = struct(
      unix_micros(col(rightTs)).as("asof_ts_us") +: payload.map(col): _*)
    val rDedup = right
      .groupBy(keyCols :+ unix_micros(col(rightTs)).as("_t"): _*)
      .agg(min(rStruct).as("_r"))
    val lStruct = struct(left.columns.map(col): _*)
    val lTagged = left.select(
      keyCols ++ Seq(unix_micros(col(leftTs)).as("_t"), lit(0).as("_side"),
        lit(null).cast(rDedup.schema("_r").dataType).as("_r"),
        lStruct.as("_l")): _*)
    val rTagged = rDedup.select(
      keyCols ++ Seq(col("_t"), lit(1).as("_side"), col("_r"),
        lit(null).cast(lTagged.schema("_l").dataType).as("_l")): _*)
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("_t").desc, col("_side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lTagged.unionByName(rTagged)
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .where(col("_side") === 0)
    val gated = toleranceUs match {
      case Some(tol) => matched.withColumn("_m",
        when(col("_m.asof_ts_us") - col("_t") <= tol, col("_m")))
      case None => matched
    }
    gated.select(col("_l.*") +:
      payload.map(p => col(s"_m.$p")) :+ col("_m.asof_ts_us"): _*)
  }

  /** Interval (range) join: `points ⨝ intervals` on `keys` with
    * `start <= t < end` (half-open, the usual window convention), via
    * bin banding: each interval is replicated to every `binUs`-wide
    * epoch bin it overlaps, each point lands in exactly ONE bin, and
    * the join becomes a pure equi-join on `(keys…, bin)` with the
    * exact range predicate as a post-filter. Each qualifying
    * (point, interval) pair meets in exactly one bin — the point's —
    * so no dedup pass is needed.
    *
    * Scale: the equi-join hash-shuffles both sides once; interval
    * replication is `len/binUs + 1` copies, so pick `binUs` near the
    * typical interval length (replication ~2×) — versus Catalyst's
    * broadcast-nested-loop for the same predicate, which is
    * |points|×|intervals| per key. Degenerate intervals
    * (`end <= start`) drop out, matching the empty half-open range.
    *
    * Output: every `points` column then every `intervals` column
    * (names must be disjoint; share only `keys`).
    */
  def rangeJoinBinned(points: DataFrame, intervals: DataFrame,
      keys: Seq[String], pointTs: String, startTs: String, endTs: String,
      binUs: Long): DataFrame = {
    require(binUs > 0, "binUs must be positive")
    val keyCols = keys.map(col)
    val p = points
      .withColumn("_pt_us", unix_micros(col(pointTs)))
      // `div` (not `/`): Column `/` is double division, inexact past
      // 2^53 — bins must floor-divide exactly over the full long range
      .withColumn("_bin", expr(s"_pt_us div ${binUs}L"))
    val i = intervals
      .withColumn("_s", unix_micros(col(startTs)))
      .withColumn("_e", unix_micros(col(endTs)))
      .where(col("_e") > col("_s"))
      .withColumn("_bin",
        explode(expr(s"sequence(_s div ${binUs}L, (_e - 1) div ${binUs}L)")))
    p.join(i, keys :+ "_bin")
      .where(col("_pt_us") >= col("_s") && col("_pt_us") < col("_e"))
      .select(points.columns.map(col) ++
        intervals.columns.filterNot(keys.contains).map(col): _*)
  }
}
