package graft.messages

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The single-broadcast HTTP endpoint's data plane —
  * `Realtime.Tenants.SingleBroadcast` (single_broadcast.ex), the
  * `POST /api/broadcast/:topic/events/:event` surface that accepts ONE
  * message per request, JSON (`application/json`) or raw binary
  * (`application/octet-stream`), and pushes it through the suspension /
  * validation / rate / write-authorization chain before dispatch.
  *
  * This object owns the CHANGESET semantics (`validate_message`,
  * single_broadcast.ex:86-151) as a relational predicate; the ordered
  * gate chain itself is [[graft.rates.Rates.singleAdmission]] (the
  * admission family's ring replay), and the write-authorization probe
  * is [[graft.api.WriteAuthz.check]] reused verbatim — the decision
  * input here is the same policy-view lookup the channel push path
  * caches per socket.
  */
object SingleBroadcast {

  /** `validate_message`'s changeset as one codegen'd predicate
    * (single_broadcast.ex:86-151):
    *  - `content_type` must be `json` or `binary` (the inclusion
    *    validation; the Content-Type plug upstream maps
    *    application/json / application/octet-stream onto these);
    *  - the payload must be PRESENT (`validate_payload_present`: binary
    *    nil and json nil both error; the empty binary `<<>>` is valid —
    *    presence, not non-emptiness);
    *  - the payload must fit `max_payload_size_in_kb * 1000 + 500`
    *    bytes (`validate_payload_size`, strict `>` rejects — the same
    *    formula for BOTH encodings, since the reference measures both
    *    with `:erlang.external_size`; `payloadBytes` is this engine's
    *    documented byte-size proxy for that VM-term measure, as in
    *    [[BroadcastChanges]]).
    *
    * Null `payloadBytes` on a present payload reads as size 0 (fits).
    * The size check lives INSIDE validation — so an oversize request is
    * `invalid` (422) before the rate gate ever sees it, unlike the
    * channel push path where the size guard runs post-authz (P7). */
  def validRequest(contentType: Column, payloadPresent: Column,
      payloadBytes: Column, maxPayloadKb: Column): Column =
    contentType.isin("json", "binary") && payloadPresent &&
      coalesce(payloadBytes, lit(0L)) <=
        maxPayloadKb.cast("long") * 1000L + 500L

  /** The full single-broadcast admission replay over a logged request
    * stream. `requests` carries per-request columns
    * `(tenant, ts, req_id, suspend, content_type, payload_present,
    * payload_bytes, max_payload_kb, private, role, topic)` — the tenant
    * flags/limits pre-joined (tenant config is a broadcast dimension);
    * `writePolicies` is the (role, topic) write-policy view.
    *
    * Plan shape: the write probe is two broadcast hash joins over a
    * keys-sized distinct ([[graft.api.WriteAuthz.check]]'s shape), the
    * changeset predicate one codegen'd projection, and the ordered gate
    * chain one tenant-keyed shuffle ([[graft.rates.Rates
    * .singleAdmission]]) — the only exchanges are the probe-key
    * distinct and the tenant grouping, both invariant to request
    * volume's payload width. Output: `(tenant, req_id, status)` with
    * status ∈ forbidden_suspended | invalid | rate_limited | forbidden
    * | ok. */
  def admission(requests: DataFrame, writePolicies: DataFrame,
      limitNum: Long, limitDen: Long,
      tickSec: Long = 5L, windowTicks: Int = 12): DataFrame = {
    val authzed = graft.api.WriteAuthz.check(requests, writePolicies,
        sizeCol = "payload_bytes", maxPayloadBytes = Long.MaxValue)
      .withColumn("valid", validRequest(col("content_type"),
        col("payload_present"), col("payload_bytes"),
        col("max_payload_kb")))
    graft.rates.Rates.singleAdmission(authzed, "tenant", "ts", "req_id",
      "suspend", "valid", "write_allowed", limitNum, limitDen,
      tickSec, windowTicks)
  }
}
