package graft.walrus

import graft.model.Subscription
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}

/** Client-payload shaping for matched changes — the output half of the
  * reference's `apply_rls` (P6 column projection, P7 oversize guard, P8
  * TOAST merge), organized the way the reference amortizes it: one shaped
  * payload per **distinct (role, selected_columns) group**, not per
  * subscriber (O3/O4, /root/reference/lib/realtime/tenants/repo/migrations/
  * 20260626120000_readd_postgrest_filter_ops.ex:413-417,540-545,638-648).
  *
  * Each group is one arm of a SINGLE projection over the matched stream
  * (no shuffle, ONE scan): per change row we build an array of per-group
  * payload structs — `when(size(ids)>0, struct(role, cols, record, …))` —
  * and `inline` it, the same battery trick as [[Walrus.matchSubscriptions]].
  * The record is serialized to JSON **once per group** before any
  * per-subscriber fan-out — encode-once (O6) — and a group's JSON build is
  * only evaluated when the group matched (CaseWhen laziness). The previous
  * shape (G unioned branches, each re-scanning `matched`) was G× I/O on a
  * 100 TB micro-batch; this is 1×.
  *
  * Payload fidelity (reference migration 20260626120000:583-647):
  *  - `record` only for INSERT/UPDATE (else absent);
  *  - `old_record` for UPDATE, and for DELETE with **pk-only** columns when
  *    RLS is enabled (deletes can't be secured row-wise);
  *  - oversize (413): the record is kept, but values whose text form
  *    exceeds 64 bytes are dropped (`to_json` omits null fields, matching
  *    `jsonb_object_agg`'s row filter at :604,646).
  */
object Payload {

  /** One row per (change × distinct payload group with ≥1 matching sub).
    *
    * @param matched   output of [[Walrus.matchSubscriptions]] (has
    *                  `subscription_ids`); may carry `old_<col>` columns with
    *                  pre-image values for UPDATE/DELETE shaping.
    * @param subs      the subscription registry (small, driver-side).
    * @param dataCols  data columns of the table.
    * @param pk        primary-key column names (always kept in projections).
    * @param maxBytes  oversize guard threshold (413 + 64-byte rule).
    */
  /** Reference error strings (in-band error rows, 20260626120000:449-488).
    */
  val Err400 = "Error 400: Bad Request, no primary key"
  val Err401 = "Error 401: Unauthorized"
  val Err413 = "Error 413: Payload Too Large"

  /** Serialize named typed fields to a JSON object, null fields omitted.
    * Native [[graft.plans.JsonStructProject]] when every field type is
    * supported — `to_json` is CodegenFallback and would drop the whole
    * G-arm shaping projection out of whole-stage codegen — with a
    * `to_json` fallback for exotic field types (timestamps, nested). */
  private def jsonObj(
      fields: Seq[(String, Column, org.apache.spark.sql.types.DataType)]): Column =
    if (fields.forall(f => graft.plans.JsonStructProject.supports(f._3))) {
      import org.apache.spark.sql.graft.ColumnBridge
      ColumnBridge.column(graft.plans.JsonStructProject(
        fields.map(_._1), fields.map(f => ColumnBridge.expression(f._2))))
    } else
      to_json(struct(fields.map { case (n, c, _) => c.as(n) }: _*))

  def shape(
      matched: DataFrame,
      subs: Seq[Subscription],
      dataCols: Seq[String],
      pk: Seq[String],
      maxBytes: Int = 1 << 20,
      unauthorizedRoles: Set[String] = Set.empty,
      rlsEnabled: Boolean = false): DataFrame = {
    val groups = subs.groupBy(s => (s.claimsRole, s.selectedColumns.sorted)).toSeq
      .sortBy { case ((role, sel), _) => (role, sel.mkString(",")) }
    val hasOld = matched.columns.exists(_.startsWith("old_"))
    val noPk = pk.isEmpty
    val isIns = col(Walrus.TypeCol) === "INSERT"
    val isUpd = col(Walrus.TypeCol) === "UPDATE"
    val isDel = col(Walrus.TypeCol) === "DELETE"
    // a value's text form over 64 bytes is dropped from oversize payloads;
    // to_json omits null struct fields, so nulling = jsonb_object_agg skip
    val branches: Seq[Column] = groups.map { case ((role, selected), ss) =>
      val keep = Walrus.projectRecord(dataCols, selected, pk)
      val groupIds = array(ss.map(_.subscriptionId).sorted.map(lit): _*)
      def dt(c: String) = matched.schema(c).dataType
      val recordFull = jsonObj(keep.map(c => (c, col(c), dt(c))))
      val recordTrunc = jsonObj(keep.map(c =>
        (c, when(octet_length(col(c).cast(StringType)) > 64, lit(null))
          .otherwise(col(c)), dt(c))))
      val tooLarge = octet_length(recordFull) > maxBytes
      val oldJson =
        if (hasOld) {
          val oldKeep = keep.filter(c => matched.columns.contains(s"old_$c"))
          val delKeep = if (rlsEnabled) oldKeep.filter(pk.contains) else oldKeep
          def enc(cols: Seq[String]): Column = when(tooLarge,
              jsonObj(cols.map(c =>
                (c, when(octet_length(col(s"old_$c").cast(StringType)) > 64,
                    lit(null)).otherwise(col(s"old_$c")), dt(s"old_$c")))))
            .otherwise(jsonObj(cols.map(c =>
              (c, col(s"old_$c"), dt(s"old_$c")))))
          when(isUpd, enc(oldKeep)).when(isDel, enc(delKeep))
        } else lit(null).cast(StringType)
      // error precedence mirrors apply_rls: 400 (no pk) > 401 (role denied
      // by RLS) > 413 (oversize); error rows are DELIVERED, with the record
      // suppressed (401/400) or value-truncated (413)
      val denied = unauthorizedRoles.contains(role)
      val errs =
        if (noPk) array(lit(Err400))
        else if (denied) array(lit(Err401))
        else when(tooLarge, array(lit(Err413)))
          .otherwise(lit(null).cast(ArrayType(StringType)))
      val rec =
        if (noPk || denied) lit(null).cast(StringType)
        else when(isIns || isUpd,
          when(tooLarge, recordTrunc).otherwise(recordFull))
      val ids = array_intersect(col("subscription_ids"), groupIds)
      when(size(ids) > 0, struct(
        lit(role).as("claims_role"),
        lit(if (selected.isEmpty) "" else selected.sorted.mkString(","))
          .as("selected_columns"),
        rec.as("record"),
        (if (noPk || denied) lit(null).cast(StringType) else oldJson)
          .as("old_record"),
        errs.as("errors"),
        sort_array(ids).as("subscription_ids")))
    }
    if (branches.isEmpty) {
      // no subscribers (e.g. every socket disconnected mid-stream): an
      // empty result with the output schema, not a reduce-on-empty crash
      val schema = StructType(
        pk.map(c => StructField(c, matched.schema(c).dataType)) ++ Seq(
          StructField(Walrus.TypeCol, StringType),
          StructField("commit_timestamp", StringType),
          StructField("claims_role", StringType),
          StructField("selected_columns", StringType),
          StructField("record", StringType),
          StructField("old_record", StringType),
          StructField("errors", ArrayType(StringType)),
          StructField("subscription_ids", ArrayType(StringType))))
      matched.sparkSession.createDataFrame(
        matched.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    } else {
      // single pass: arm per group, drop unmatched arms, inline the rest.
      // (see shapeGeneric for the map-shaped WAL variant)
      // inline_outer + null post-filter (not plain inline): the plain
      // generator makes InferFiltersFromGenerate add a pre-Generate
      // size(..)>0 filter that re-evaluates every arm twice — same pitfall
      // as the match battery (commit 4f05edc)
      val arms = filter(array(branches: _*), b => b.isNotNull)
      matched
        .select(
          (pk.map(col) :+
            col(Walrus.TypeCol) :+
            col("commit_timestamp") :+
            arms.as("_groups")): _*)
        .select(
          (pk.map(col) :+
            col(Walrus.TypeCol) :+
            col("commit_timestamp") :+
            inline_outer(col("_groups"))): _*)
        .where(col("claims_role").isNotNull)
    }
  }

  /** [[shape]] for the generic decoded-WAL stream (record/old_record as
    * `map<string,string>`, multi-table): the same single-pass per-group
    * arm structure, but column projection is a `map_filter` against each
    * (group × table) keep-set (selected ∪ table pk; empty selection = all)
    * and the JSON is `to_json` of the filtered map (text values — the
    * wal2json-like generic form; the typed path keeps native JSON types).
    * Record/old_record gating (INSERT/UPDATE vs UPDATE/DELETE, pk-only
    * DELETE under RLS) matches [[shape]].
    *
    * @param matched output of [[MultiTableMatch.matchSubscriptions]] with
    *                non-empty `subscription_ids`.
    * @param pkByTable (schema, table) → pk column names.
    */
  def shapeGeneric(
      matched: DataFrame,
      subs: Seq[Subscription],
      pkByTable: Map[(String, String), Seq[String]],
      rlsEnabled: Boolean = false): DataFrame = {
    val groups = subs.groupBy(s => (s.claimsRole, s.selectedColumns.sorted)).toSeq
      .sortBy { case ((role, sel), _) => (role, sel.mkString(",")) }
    val isIns = col(Walrus.TypeCol) === "INSERT"
    val isUpd = col(Walrus.TypeCol) === "UPDATE"
    val isDel = col(Walrus.TypeCol) === "DELETE"
    val hasOld = matched.columns.contains("old_record")
    def keepJson(m: Column, selected: Seq[String], pkOnly: Boolean): Column = {
      // per-table keep-set: arms are per GROUP, so the table pk is folded
      // in data-side via the change's (schema, table) columns. The
      // project+serialize is ONE native call ([[graft.plans.JsonMapProject]])
      // — map_filter (interpreted HOF) + to_json (CodegenFallback) would
      // drop every arm out of whole-stage codegen
      import org.apache.spark.sql.graft.ColumnBridge
      val perTable = pkByTable.toSeq.sortBy(_._1.toString).map {
        case ((sch, tbl), pks) =>
          val keep =
            if (pkOnly) Some(pks)
            else if (selected.isEmpty) None
            else Some((selected ++ pks).distinct)
          val tablePred = col("change_schema") === sch && col("change_table") === tbl
          (tablePred, ColumnBridge.column(
            graft.plans.JsonMapProject(ColumnBridge.expression(m), keep)))
      }
      perTable.foldRight(lit(null).cast(StringType): Column) {
        case ((p, j), acc) => when(p, j).otherwise(acc)
      }
    }
    val branches: Seq[Column] = groups.map { case ((role, selected), ss) =>
      val groupIds = array(ss.map(_.subscriptionId).sorted.map(lit): _*)
      val rec = when(isIns || isUpd, keepJson(col("record"), selected, pkOnly = false))
      val old =
        if (!hasOld) lit(null).cast(StringType)
        else when(isUpd, keepJson(col("old_record"), selected, pkOnly = false))
          .when(isDel, keepJson(col("old_record"), selected, pkOnly = rlsEnabled))
      val ids = array_intersect(col("subscription_ids"), groupIds)
      when(size(ids) > 0, struct(
        lit(role).as("claims_role"),
        lit(if (selected.isEmpty) "" else selected.sorted.mkString(","))
          .as("selected_columns"),
        rec.as("record"),
        old.as("old_record"),
        sort_array(ids).as("subscription_ids")))
    }
    if (branches.isEmpty)
      matched.sparkSession.createDataFrame(
        matched.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(
          StructField("change_schema", StringType),
          StructField("change_table", StringType),
          StructField(Walrus.TypeCol, StringType),
          StructField("commit_timestamp", StringType),
          StructField("claims_role", StringType),
          StructField("selected_columns", StringType),
          StructField("record", StringType),
          StructField("old_record", StringType),
          StructField("subscription_ids", ArrayType(StringType)))))
    else {
      val arms = filter(array(branches: _*), b => b.isNotNull)
      matched
        .select(col("change_schema"), col("change_table"), col(Walrus.TypeCol),
          col("commit_timestamp"), arms.as("_groups"))
        .select(col("change_schema"), col("change_table"), col(Walrus.TypeCol),
          col("commit_timestamp"), inline_outer(col("_groups")))
        .where(col("claims_role").isNotNull)
    }
  }
}
