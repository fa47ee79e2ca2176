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
  * Each group is a narrow projection over the matched stream (no shuffle);
  * the record is serialized to JSON **once per group** before any
  * per-subscriber fan-out — encode-once (O6). Groups are unioned; Spark
  * executes them as parallel branches over the same scan.
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

  def shape(
      matched: DataFrame,
      subs: Seq[Subscription],
      dataCols: Seq[String],
      pk: Seq[String],
      maxBytes: Int = 1 << 20,
      unauthorizedRoles: Set[String] = Set.empty): DataFrame = {
    val groups = subs.groupBy(s => (s.claimsRole, s.selectedColumns.sorted)).toSeq
      .sortBy { case ((role, sel), _) => (role, sel.mkString(",")) }
    val hasOld = matched.columns.exists(_.startsWith("old_"))
    val noPk = pk.isEmpty
    val branches = groups.map { case ((role, selected), ss) =>
      val keep = Walrus.projectRecord(dataCols, selected, pk)
      val groupIds = array(ss.map(_.subscriptionId).sorted.map(lit): _*)
      val recordJson = to_json(struct(keep.map(col): _*))
      val oldJson =
        if (hasOld) {
          val oldKeep = keep.filter(c => matched.columns.contains(s"old_$c"))
          when(col(Walrus.TypeCol) =!= "INSERT",
            to_json(struct(oldKeep.map(c => col(s"old_$c").as(c)): _*)))
        } else lit(null).cast(StringType)
      val tooLarge = octet_length(recordJson) > maxBytes
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
        else when(tooLarge, lit(null).cast(StringType)).otherwise(recordJson)
      matched
        .withColumn("ids", array_intersect(col("subscription_ids"), groupIds))
        .where(size(col("ids")) > 0)
        .select(
          (pk.map(col) :+
            col(Walrus.TypeCol) :+
            col("commit_timestamp") :+
            lit(role).as("claims_role") :+
            lit(if (selected.isEmpty) "" else selected.sorted.mkString(","))
              .as("selected_columns") :+
            rec.as("record") :+
            (if (noPk || denied) lit(null).cast(StringType) else oldJson)
              .as("old_record") :+
            errs.as("errors") :+
            sort_array(col("ids")).as("subscription_ids")): _*)
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
    } else branches.reduce(_ unionByName _)
  }
}
