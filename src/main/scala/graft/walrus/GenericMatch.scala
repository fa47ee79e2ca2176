package graft.walrus

import graft.model.Subscription
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The degenerate-case subscription matcher (SURVEY §7.4 hard part 1): when
  * the distinct-filter-group count is too large to compile into one
  * predicate battery (≫10⁴ groups would blow plan/codegen size), fall back
  * to a **data-driven** evaluation:
  *
  *   changes ⨝(broadcast) exploded filter rows → per-(change, filter)
  *   runtime predicate → group by (change, subscription): matched iff
  *   every filter passed (the reference's `sum(..)=count(..)` conjunction
  *   trick, 20260626120000:168-178) — the J2 "unnest filters against row
  *   columns" shape as a relational plan.
  *
  * Typed comparison without compile-time types: each change row carries a
  * `map<col,string>`, a `map<col,double>` for fractional columns, and a
  * `map<col,decimal(38,10)>` for integral/decimal columns (exact — a double would
  * corrupt bigint keys beyond 2^53); a filter compares exactly-decimal when
  * its column is integral, numerically when fractional, else lexically
  * (same outcome as the reference's cast-both-sides-to-column-type for the
  * supported types). Fail-closed on unknown columns; SQL null semantics.
  *
  * Scale shape: the filter table broadcasts (it is the small dimension);
  * the change stream is never shuffled before the per-subscription
  * conjunction aggregate, which is keyed by (change ordinal, subscription) —
  * map-side partial aggregation collapses most of it. Cost is
  * O(|changes| × |filters of the table|) predicate evaluations — the price
  * of full generality, which is why [[Walrus.matchSubscriptions]] is the
  * default and this is the fallback.
  */
object GenericMatch {

  /** Subscriptions → exploded filter rows (one per (sub, filter), with a
    * sentinel always-true row for filterless subscriptions so they survive
    * the conjunction count). */
  def filterRows(spark: SparkSession, subs: Seq[Subscription],
      table: String, schemaName: String = "public"): DataFrame = {
    import spark.implicits._
    val rows = subs
      .filter(s => (s.table == "*" || s.table == table) &&
        (s.schema == "*" || s.schema == schemaName))
      .map(_.canonical)
      .flatMap { s =>
        if (s.filters.isEmpty)
          Seq((s.subscriptionId, s.actionFilter, "", "__true__", "", Seq.empty[String], false, 0))
        else s.filters.map(f =>
          (s.subscriptionId, s.actionFilter, f.column,
            f.op, f.value, f.values, f.negate, s.filters.size))
      }
    rows.toDF("subscription_id", "action_filter", "f_column", "f_op",
      "f_value", "f_values", "f_negate", "n_filters")
      .withColumn("n_filters",
        when(col("f_op") === "__true__", lit(1)).otherwise(col("n_filters")))
  }

  /** Runtime predicate for one (change, filter) pair. `sv`/`nv`/`iv` are
    * the row's value as string / double / exact decimal (null when the
    * column is missing or the value is null); `isInt`/`isNum` whether the
    * column is integral / fractional. */
  private def evalFilter(): Column = {
    val sv = col("_sv"); val nv = col("_nv"); val iv = col("_iv")
    val isNum = col("_is_num"); val isInt = col("_is_int")
    val exists = col("_col_exists")
    val fv = col("f_value"); val fnum = col("f_value").cast("double")
    // decimal(38,10) carries every long exactly (19 digits + 10 scale ≤ 38)
    // while still rejecting e.g. '10.5' = bigint 10 (no rounding, unlike a
    // cast to decimal(38,0))
    val fdec = col("f_value").cast("decimal(38,10)")
    val base =
      when(col("f_op") === "eq",
          when(isInt, iv === fdec).when(isNum, nv === fnum).otherwise(sv === fv))
        .when(col("f_op") === "neq",
          when(isInt, iv =!= fdec).when(isNum, nv =!= fnum).otherwise(sv =!= fv))
        .when(col("f_op") === "lt",
          when(isInt, iv < fdec).when(isNum, nv < fnum).otherwise(sv < fv))
        .when(col("f_op") === "lte",
          when(isInt, iv <= fdec).when(isNum, nv <= fnum).otherwise(sv <= fv))
        .when(col("f_op") === "gt",
          when(isInt, iv > fdec).when(isNum, nv > fnum).otherwise(sv > fv))
        .when(col("f_op") === "gte",
          when(isInt, iv >= fdec).when(isNum, nv >= fnum).otherwise(sv >= fv))
        .when(col("f_op") === "in",
          when(isInt, exists_in_dec(iv)).when(isNum, exists_in_num(nv))
            .otherwise(array_contains(col("f_values"), sv)))
        .when(col("f_op") === "like", expr("_sv LIKE f_value"))
        .when(col("f_op") === "ilike", expr("_sv ILIKE f_value"))
        .when(col("f_op") === "match", expr("_sv RLIKE f_value"))
        .when(col("f_op") === "imatch", expr("_sv RLIKE concat('(?i)', f_value)"))
        .when(col("f_op") === "is",
          when(lower(fv).isin("null", "unknown"), sv.isNull)
            .otherwise(sv <=> lower(fv)))
        .when(col("f_op") === "isdistinct", !(sv <=> fv))
        .otherwise(lit(false))
    // negate wraps NOT; a null comparison stays null either way (SQL
    // three-valued logic) and the final coalesce makes it not-visible —
    // same fail-closed outcome as the compiled path.
    // The fail-closed guards sit OUTSIDE the negation: a negated filter on
    // a missing column (or unknown op) must stay not-visible, exactly like
    // the compiled path's pre-negation lit(false) — negating the guard
    // would fail OPEN (caught by MatchDifferentialSpec).
    val negated = when(col("f_negate"), !base).otherwise(base)
    when(col("f_op") === "__true__", lit(true))
      .when(!exists, lit(false)) // fail closed: unknown column
      .when(!col("f_op").isin(knownOps: _*), lit(false)) // unknown op
      // invalid `is` keyword (validate() would reject it at subscribe
      // time) — compiled path yields lit(false) before negation
      .when(col("f_op") === "is" &&
        !lower(col("f_value")).isin("null", "true", "false", "unknown"),
        lit(false))
      .otherwise(coalesce(negated, lit(false)))
  }

  private val knownOps: Seq[String] =
    "__true__" +: graft.model.Filter.Ops.toSeq

  private def exists_in_num(nv: Column): Column =
    exists(col("f_values"), v => v.cast("double") === nv)

  private def exists_in_dec(iv: Column): Column =
    exists(col("f_values"), v => v.cast("decimal(38,10)") === iv)

  /** Match changes against subscriptions via the generic runtime path.
    * Returns one row per (change, matched subscription) — same contract as
    * exploding [[Walrus.matchSubscriptions]]'s `subscription_ids`. */
  def matchExploded(
      changes: DataFrame,
      subs: Seq[Subscription],
      schema: StructType,
      table: String,
      pkCol: String,
      schemaName: String = "public"): DataFrame = {
    val spark = changes.sparkSession
    val integralCols = schema.fields.collect {
      case f if Seq(ByteType, ShortType, IntegerType, LongType).contains(f.dataType) ||
        f.dataType.isInstanceOf[DecimalType] => f.name
    }.toSeq
    val numericCols = schema.fields.collect {
      case f if f.dataType.isInstanceOf[NumericType] &&
        !integralCols.contains(f.name) => f.name
    }.toSeq
    val allCols = schema.fieldNames.toSeq
    val strMap = map(allCols.flatMap(c =>
      Seq(lit(c), col(c).cast("string"))): _*)
    val numMap =
      if (numericCols.isEmpty) map().cast(MapType(StringType, DoubleType))
      else map(numericCols.flatMap(c =>
        Seq(lit(c), col(c).cast("double"))): _*)
    val intMap =
      if (integralCols.isEmpty) map().cast(MapType(StringType, DecimalType(38, 10)))
      else map(integralCols.flatMap(c =>
        Seq(lit(c), col(c).cast("decimal(38,10)"))): _*)
    val fr = filterRows(spark, subs, table, schemaName)
    val hasType = changes.columns.contains(Walrus.TypeCol)
    val joined = changes
      // unique per-change ordinal: the conjunction aggregate must be keyed
      // per change ROW, not per pk — one batch can legally carry several
      // changes of the same pk (INSERT then UPDATE), and folding them
      // together would sum n_pass across both while n_req stays
      // max(n_filters), corrupting the match
      .withColumn("_change_ord", monotonically_increasing_id())
      .withColumn("_vals_str", strMap)
      .withColumn("_vals_num", numMap)
      .withColumn("_vals_int", intMap)
      .crossJoin(broadcast(fr))
      .where(if (hasType)
          col("action_filter") === "*" || col("action_filter") === col(Walrus.TypeCol)
        else lit(true))
      .withColumn("_col_exists",
        col("f_op") === "__true__" ||
          array_contains(lit(allCols.toArray), col("f_column")))
      .withColumn("_is_num",
        if (numericCols.isEmpty) lit(false)
        else array_contains(lit(numericCols.toArray), col("f_column")))
      .withColumn("_is_int",
        if (integralCols.isEmpty) lit(false)
        else array_contains(lit(integralCols.toArray), col("f_column")))
      .withColumn("_sv", element_at(col("_vals_str"), col("f_column")))
      .withColumn("_nv", element_at(col("_vals_num"), col("f_column")))
      .withColumn("_iv", element_at(col("_vals_int"), col("f_column")))
      // TRUNCATE: no row data, filters bypassed (the action_filter='*'
      // gate above already routed it) — keep parity with the compiled path
      .withColumn("_pass",
        if (hasType)
          when(col(Walrus.TypeCol) === graft.model.ChangeType.Truncate, lit(true))
            .otherwise(evalFilter())
        else evalFilter())
    // drop failed (change, filter) rows BEFORE the conjunction aggregate:
    // a group matches iff its surviving row count equals n_filters (a
    // per-subscription constant carried on every row), so the shuffle
    // carries only passing rows — usually a small fraction of the
    // |changes| × |filters| cross product
    joined
      .where(col("_pass"))
      .groupBy(col("_change_ord"), col(pkCol), col("subscription_id"))
      .agg(count(lit(1)).as("n_pass"), max(col("n_filters")).as("n_req"))
      .where(col("n_pass") === col("n_req"))
      .select(col(pkCol), col("subscription_id"))
  }
}
