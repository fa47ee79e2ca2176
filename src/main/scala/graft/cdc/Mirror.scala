package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-stream compaction: materialize the CURRENT table state implied
  * by a decoded WAL stream — last write per primary key wins, a trailing
  * DELETE removes the row. The standard CDC consumer (a queryable mirror
  * of the source table; the reference leaves this to subscribers, but
  * every deployment that stores what it receives needs exactly this
  * reduction).
  *
  * Scale shape: one shuffle on the pk, `row_number` per key in WAL order
  * — no global sort; 100 TB of history compacts to |live keys| rows. For
  * periodic re-compaction the input can be (previous mirror ∪ new
  * changes) with the same code path, since a mirror row is just an
  * INSERT-shaped change at its materialization seq.
  */
object Mirror {

  private def pkOf(pkCol: String): Column = coalesce(
    element_at(col("record"), pkCol),
    element_at(col("old_record"), pkCol))

  /** Compact decoded changes (the [[PgOutput.WalChange]] shape) for one
    * table: the pk value lives in `record` for INSERT/UPDATE and only in
    * `old_record` for DELETE (reference DELETE carries the key tuple).
    * `orderCol` is the WAL order (seq/lsn). Rows whose latest change is
    * a DELETE disappear from the mirror. */
  def fromWal(decoded: DataFrame, pkCol: String,
      orderCol: String = "seq"): DataFrame = {
    // TRUNCATE empties the table: any key whose LATEST change precedes
    // the last TRUNCATE is gone, even though no per-key DELETE exists.
    // The boundary is one scalar aggregate (a narrow second scan of the
    // change stream) broadcast into the main plan — no extra shuffle.
    val lastTrunc = decoded.where(col("message") === "TRUNCATE")
      .agg(max(col(orderCol)).as("_trunc_seq"))
    val w = Window.partitionBy("_pk").orderBy(col(orderCol).desc)
    decoded
      .withColumn("_pk", pkOf(pkCol))
      .where(col("_pk").isNotNull)
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1 && col("message") =!= "DELETE")
      .crossJoin(broadcast(lastTrunc))
      .where(col("_trunc_seq").isNull || col(orderCol) > col("_trunc_seq"))
      .select(col("_pk").as(pkCol), col(orderCol),
        col("record"), col("commit_timestamp"))
  }

  /** Diff two mirror materializations (e.g. yesterday's snapshot vs
    * today's): classify every key as INSERT (new only), DELETE (old
    * only), or UPDATE (present in both at a different change seq) —
    * the audit/reconciliation query a CDC consumer runs to validate
    * its downstream copy, and the minimal "what changed since" feed
    * when the WAL between two points is gone. UNCHANGED keys drop.
    * One full-outer join co-partitioned on the pk — both sides shuffle
    * once, output is |changed keys|. */
  def snapshotDiff(oldMirror: DataFrame, newMirror: DataFrame,
      pkCol: String, orderCol: String = "seq"): DataFrame = {
    val o = oldMirror.select(col(pkCol).as("pk"),
      col(orderCol).as("old_seq"))
    val n = newMirror.select(col(pkCol).as("pk"),
      col(orderCol).as("new_seq"))
    o.join(n, Seq("pk"), "full_outer")
      .withColumn("change",
        when(col("old_seq").isNull, "INSERT")
          .when(col("new_seq").isNull, "DELETE")
          .when(col("old_seq") =!= col("new_seq"), "UPDATE"))
      .where(col("change").isNotNull)
      .select(col("pk").as(pkCol), col("old_seq"), col("new_seq"),
        col("change"))
  }

  /** Fused [[snapshotDiff]] of the mirror at a WAL PREFIX against the
    * full mirror, from ONE window pass over the decoded stream (r17,
    * guide §2.4): the composed form —
    * `snapshotDiff(fromWal(decoded.where(p)), fromWal(decoded))` — runs
    * TWO pk-keyed window passes and a full-outer join, all three
    * exchanging the change stream; here one pass computes both heads:
    *
    *  - `_rn_new` = row_number over (pk, orderCol DESC) — 1 marks the
    *    full mirror's head, exactly [[fromWal]]'s window;
    *  - `_rn_old` = running count of PREFIX rows over the same
    *    descending order — for a prefix row, 1 ⟺ it is the max-seq
    *    prefix row of its key ⟺ the prefix mirror's head.
    *
    * A key is "present" in a side iff that side's head is non-DELETE
    * and above that side's TRUNCATE boundary (the prefix side's
    * boundary is the last TRUNCATE *within the prefix*) — the same
    * per-side rule [[fromWal]] applies; presence is carried as a
    * non-null seq out of one per-pk aggregate that REUSES the window's
    * partitioning (no further shuffle). Keys present in neither side
    * are dropped before classification (the composed full-outer join
    * never saw them). INSERT/DELETE/UPDATE classification and the
    * unchanged-key drop are verbatim [[snapshotDiff]].
    * MirrorSpec pins fused ≡ composed on a stream with deletes,
    * truncates, and re-inserts. */
  def snapshotDiffAtPrefix(decoded: DataFrame, pkCol: String,
      prefixPred: Column, orderCol: String = "seq"): DataFrame = {
    val lastTruncNew = decoded.where(col("message") === "TRUNCATE")
      .agg(max(col(orderCol)).as("_tn"))
    val lastTruncOld = decoded
      .where(col("message") === "TRUNCATE" && prefixPred)
      .agg(max(col(orderCol)).as("_to"))
    val w = Window.partitionBy("_pk").orderBy(col(orderCol).desc)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val live = col("message") =!= "DELETE"
    val heads = decoded
      .withColumn("_pk", pkOf(pkCol))
      .where(col("_pk").isNotNull)
      .withColumn("_rn_new", row_number().over(w))
      .withColumn("_rn_old",
        sum(when(prefixPred, 1L).otherwise(0L)).over(wRun))
    val agg = heads.groupBy(col("_pk"))
      .agg(
        max(when(col("_rn_new") === 1 && live, col(orderCol)))
          .as("_new_head"),
        max(when(prefixPred && col("_rn_old") === 1 && live,
          col(orderCol))).as("_old_head"))
    agg.crossJoin(broadcast(lastTruncNew))
      .crossJoin(broadcast(lastTruncOld))
      .select(col("_pk").as(pkCol),
        when(col("_to").isNull || col("_old_head") > col("_to"),
          col("_old_head")).as("old_seq"),
        when(col("_tn").isNull || col("_new_head") > col("_tn"),
          col("_new_head")).as("new_seq"))
      .where(col("old_seq").isNotNull || col("new_seq").isNotNull)
      .withColumn("change",
        when(col("old_seq").isNull, "INSERT")
          .when(col("new_seq").isNull, "DELETE")
          .when(col("old_seq") =!= col("new_seq"), "UPDATE"))
      .where(col("change").isNotNull)
      .select(col(pkCol), col("old_seq"), col("new_seq"), col("change"))
  }

  /** STREAMING twin of [[fromWal]]: maintain the mirror incrementally
    * across micro-batches with keyed state — each batch emits only the
    * keys it touched, as `(pk, op UPSERT|DELETE, seq, record,
    * commit_timestamp)` rows (Update output mode; the consumer applies
    * them to its store idempotently by (pk, seq)). State per key is the
    * latest (seq, tombstone, record) — live-key-count-sized, the same
    * asymptote as the batch mirror's output.
    *
    * Ordering: events WITHIN a batch fold in `orderCol` order; an event
    * at or below the key's applied seq (replays, cross-batch overlap)
    * is dropped — so at-least-once upstream delivery yields an
    * exactly-once mirror. TRUNCATE is a cross-key control event that
    * keyed state cannot see globally; route truncates to a control
    * stream that resets the sink (documented non-goal here, matching
    * the reference's truncate-as-broadcast-notification semantics). */
  def streamUpserts(decoded: DataFrame, pkCol: String,
      orderCol: String = "seq"): DataFrame = {
    val spark = decoded.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val typed = decoded
      .withColumn("_pk", pkOf(pkCol))
      .where(col("_pk").isNotNull &&
        col("message").isin("INSERT", "UPDATE", "DELETE"))
      .select(col("_pk").as("pk"), col("message"),
        col(orderCol).cast("long").as("seq"), col("record"),
        col("commit_timestamp").cast("string").as("ts"))
      .as[(String, String, Long, Map[String, String], String)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update(),
        GroupStateTimeout.NoTimeout()) {
        (pk: String,
         events: Iterator[(String, String, Long, Map[String, String], String)],
         state: org.apache.spark.sql.streaming.GroupState[
           (Long, Boolean, Map[String, String], String)]) =>
          var st = state.getOption
            .getOrElse((Long.MinValue, true, Map.empty[String, String], ""))
          var changed = false
          events.toSeq.sortBy(_._3).foreach { case (_, msg, seq, rec, ts) =>
            if (seq > st._1) {
              val del = msg == "DELETE"
              st = (seq, del, if (del) Map.empty[String, String] else rec, ts)
              changed = true
            }
          }
          if (changed) {
            state.update(st)
            Iterator.single(
              (pk, if (st._2) "DELETE" else "UPSERT", st._1, st._3, st._4))
          } else Iterator.empty
      }
      .toDF("pk", "op", "seq", "record", "commit_timestamp")
  }

  /** SCD-type-2 history from the same change stream: every INSERT/UPDATE
    * becomes a version row valid from its commit timestamp until the
    * key's NEXT change (of any kind — a DELETE closes the last version
    * without opening one); the open version is flagged `is_current`.
    * One window (lead over the key in WAL order) on the same single
    * shuffle as [[fromWal]] — 100 TB of history materializes as
    * version-count rows, queryable with a plain
    * `valid_from <= t AND (valid_to IS NULL OR t < valid_to)` predicate.
    */
  def scd2FromWal(decoded: DataFrame, pkCol: String,
      orderCol: String = "seq"): DataFrame = {
    // TRUNCATE closes every version open at its commit: valid_to is the
    // earlier of the key's next change and the first TRUNCATE after the
    // version opens. Truncates are DDL-rare, so the whole list fits one
    // aggregate row (sorted (seq, ts) structs) broadcast into the plan;
    // the per-row lookup is array_min∘filter — codegen, zero shuffle.
    val truncs = decoded.where(col("message") === "TRUNCATE")
      .agg(sort_array(collect_list(struct(
        col(orderCol).cast("long").as("s"),
        col("commit_timestamp").as("t")))).as("_truncs"))
    val w = Window.partitionBy("_pk").orderBy(col(orderCol))
    decoded
      .withColumn("_pk", pkOf(pkCol))
      .where(col("_pk").isNotNull)
      .withColumn("_next_change", lead(col("commit_timestamp"), 1).over(w))
      .where(col("message") =!= "DELETE")
      .crossJoin(broadcast(truncs))
      .withColumn("_next_trunc", array_min(filter(col("_truncs"),
        x => x.getField("s") > col(orderCol).cast("long"))).getField("t"))
      .withColumn("valid_to", least(col("_next_change"), col("_next_trunc")))
      .select(col("_pk").as(pkCol), col(orderCol),
        col("commit_timestamp").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"), col("record"))
  }
}
