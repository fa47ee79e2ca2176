package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Broadcast WRITE-path authorization — the ingest-side twin of the read
  * gate ([[Dispatcher.gate]], j9's RLS probe). The reference
  * write-authorizes private-channel broadcast pushes with a rolled-back
  * INSERT probe: inside a transaction it inserts a probe row into
  * `realtime.messages` for (topic, extension) under the caller's claims,
  * maps success → write:true and `insufficient_privilege` → write:false,
  * then issues `ROLLBACK AND CHAIN` so the probe never lands
  * (/root/reference/lib/realtime/tenants/authorization.ex:273-341); the
  * channel handler runs that check once per socket (the decision is
  * cached on the socket's `policies`), forwards authorized payloads —
  * still subject to the payload-size guard — and SILENTLY drops denied
  * ones without incrementing the tenant rate counter
  * (/root/reference/lib/realtime_web/channels/realtime_channel/
  * broadcast_handler.ex:25-88,160-167). Public (non-private) topics skip
  * the probe entirely and always count toward the rate counter.
  *
  * Relational re-expression: the rolled-back insert probe IS a lookup
  * against the write-policy view — probing (role, topic, extension) for
  * insert privilege reads exactly one row of policy truth and leaves no
  * state, so the batch analog is a join against that view, and "cached
  * per socket" becomes "probed once per DISTINCT key, not once per
  * message":
  *
  *  1. distinct (role, topic) keys of the private-channel ingest — the
  *     probe set: a |keys|-sized exchange (the `.distinct` shuffles the
  *     key projection, never the message payloads), NOT |messages|-sized;
  *  2. probe = left join against the write-policy view (a tenant-config
  *     dimension: tiny, broadcast — never a shuffle of the ingest);
  *  3. decisions join back to the full ingest on the same (role, topic)
  *     key — also broadcast (decisions ≤ probe keys), so the message
  *     stream itself flows through two broadcast hash joins and one
  *     codegen'd projection without being exchanged; the only shuffle in
  *     the plan is the keys-sized distinct of step 1.
  *
  * At 100 TB ingest the policy view and the decision set stay
  * dimension-sized (roles × topics), so the plan shape is invariant to
  * message volume.
  */
object WriteAuthz {

  /** Authorize a broadcast ingest frame stream.
    *
    * `ingest`: one row per pushed message with `topicCol`, `roleCol`, a
    * boolean `privateCol`, and a `sizeCol` (payload bytes).
    * `writePolicies`: the write-policy view — one row per (role, topic)
    * that may write (the probe's insert-privilege truth); tiny,
    * broadcast.
    *
    * Output adds the reference's decision surface:
    *  - `write_allowed`: public topics true; private iff the probe row
    *    exists (fail-closed: no policy row ⇒ insufficient_privilege);
    *  - `status`: 'deliver' | 'denied' | 'oversize' — denied is the
    *    silent drop, oversize the post-authz payload guard (P7 semantics:
    *    authorized but too large ⇒ an acked error, not a delivery);
    *  - `rate_counted`: the reference increments the tenant counter for
    *    every push EXCEPT a write-denied one.
    */
  def check(
      ingest: DataFrame,
      writePolicies: DataFrame,
      topicCol: String = "topic",
      roleCol: String = "role",
      privateCol: String = "private",
      sizeCol: String = "payload_bytes",
      maxPayloadBytes: Long = 64L): DataFrame = {
    // probe set: one row per distinct private-channel (role, topic) — the
    // socket-level policy cache, batch-shaped (shuffle is |keys|-sized)
    val probeKeys = ingest.where(col(privateCol))
      .select(col(roleCol), col(topicCol)).distinct()
    // the rolled-back insert probe: does the policy view hold an insert
    // privilege row for this key? (left join against a broadcast dim;
    // `_can_write` null ⇒ insufficient_privilege ⇒ write:false)
    val decisions = probeKeys.join(
        broadcast(writePolicies
          .select(col(roleCol), col(topicCol), lit(true).as("_can_write"))),
        Seq(roleCol, topicCol), "left")
      .select(col(roleCol), col(topicCol),
        coalesce(col("_can_write"), lit(false)).as("_probe_allowed"))
    // decisions re-join the FULL ingest — broadcast again (decisions are
    // a subset of the probe keys), so the stream never shuffles
    ingest.join(broadcast(decisions), Seq(roleCol, topicCol), "left")
      .withColumn("write_allowed",
        !col(privateCol) || coalesce(col("_probe_allowed"), lit(false)))
      .withColumn("status",
        when(!col("write_allowed"), "denied")
          .when(col(sizeCol) > maxPayloadBytes, "oversize")
          .otherwise("deliver"))
      .withColumn("rate_counted", col("write_allowed"))
      .drop("_probe_allowed")
  }
}
