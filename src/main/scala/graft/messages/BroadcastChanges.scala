package graft.messages

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The trigger-driven "broadcast table changes" bridge: user tables →
  * `realtime.broadcast_changes` → `realtime.send` → messages rows →
  * (replication loop) → broadcast frames.
  *
  * Reference surface:
  *  - `realtime.broadcast_changes(topic, event, operation, table, schema,
  *    NEW, OLD)` shapes `{old_record, record, operation, table, schema}`
  *    and PERFORMs `realtime.send(payload, event, topic)` — an INSERT into
  *    `realtime.messages` with `extension = 'broadcast'`, `private` true
  *    by default (/root/reference/lib/realtime/tenants/repo/migrations/
  *    20240919163303_add_payload_to_messages.ex:18-53). An operation
  *    outside INSERT/UPDATE/DELETE raises — here that is an error row,
  *    never a message. Since `…20251103001201_broadcast_send_include_
  *    payload_id.ex:19-23`, send() also splices the generated message id
  *    into any payload lacking an `'id'` key (see [[spliceIdIfAbsent]]).
  *  - `realtime.send_binary(payload bytea, event, topic, private)` is the
  *    bytea variant writing `binary_payload`
  *    (…/20260603120000_add_send_binary_function.ex:8-31); its insert
  *    failure is a WARNING (the row is dropped), not a raise.
  *  - The replication connection tails the messages table and broadcasts
  *    each row: requires id/topic/event/private/inserted_at present, picks
  *    `binary_payload` over `payload` (encoding `binary` vs `json` —
  *    `pick_payload`, /root/reference/lib/realtime/tenants/
  *    replication_connection.ex:406-467,515-517), validates payload size
  *    against `max_payload_size_in_kb * 1000 + 500`
  *    (/root/reference/lib/realtime/tenants.ex:532-537), and publishes to
  *    `tenant_topic` = `{tenant}-private:{topic}` (private) or
  *    `{tenant}:{topic}` (public) (tenants.ex:509-513). The payload body
  *    travels VERBATIM — already-encoded JSON text is spliced raw, never
  *    re-encoded (no-double-encoding).
  *
  * Divergences, by design: payload JSON keys keep the build order of the
  * migration's `jsonb_build_object` call (`old_record, record, operation,
  * table, schema`) rather than PG's jsonb storage canonicalization
  * (length-then-byte key sort) — a storage artifact, not an API contract;
  * payload size is the body's UTF-8/raw byte length rather than
  * `:erlang.external_size` (a VM-term measure with no Spark analog) — the
  * 500-byte padding constant is kept; the replication loop's tenant-cache
  * lookup (`Cache.get_tenant_by_external_id`) has no analog — the tenant
  * config IS the `maxPayloadKb`/rate arguments the caller passes, a
  * broadcast-dimension lookup at scale, not a per-row RPC.
  *
  * Scale shape: every step is a codegen'd projection or filter on the
  * change stream — no join, no shuffle, no driver loop. The one lookup
  * (tenant config: max payload size) is a constant/broadcast dimension.
  */
object BroadcastChanges {

  /** `@payload_size_padding` (tenants.ex:532). */
  val PayloadSizePadding = 500

  private val ValidOps = Seq("INSERT", "UPDATE", "DELETE")

  /** `realtime.send`'s id-if-absent payload splice
    * (…/20251103001201_broadcast_send_include_payload_id.ex:19-23): if
    * the payload OBJECT lacks an `'id'` key, the generated message id is
    * spliced in (`jsonb_set(payload, '{id}', to_jsonb(generated_id))`) —
    * the contract that lets P9's replay dedup key client payloads that
    * never set one. Key EXISTENCE is the test (`payload ? 'id'`): an
    * explicit `"id": null` is kept verbatim, exactly like the reference.
    * Expects object-shaped payload text (what `realtime.send` receives);
    * a null or non-object payload passes through untouched
    * (`json_object_keys` yields null there, which is never `true`-armed).
    * Divergence, by design (same note as [[changesToMessages]]): the id
    * lands as the LAST key rather than at jsonb's storage-canonical
    * position — key order is a storage artifact, not an API contract. */
  def spliceIdIfAbsent(payload: Column, idCol: Column): Column = {
    val keys = json_object_keys(payload)
    val idJson = graft.plans.JsonQuote.quote(idCol.cast("string"))
    when(keys.isNull || array_contains(keys, "id"), payload)
      .when(regexp_replace(payload, "\\s", "") === "{}",
        concat(lit("{\"id\":"), idJson, lit("}")))
      .otherwise(concat(regexp_replace(payload, "\\}\\s*$", ""),
        lit(",\"id\":"), idJson, lit("}")))
  }

  /** The swallow-to-WARNING prefix of realtime.send/send_binary's error
    * rows (…/20260605120000_rename_broadcast_send_warning.ex: `RAISE
    * WARNING 'WarnSendingBroadcastMessage: %', SQLERRM`). */
  val SendWarningPrefix = "WarnSendingBroadcastMessage: "

  /** `realtime.send(payload, event, topic, private)` itself
    * (…/20251103001201…:8-37): one messages row per input with
    * `extension = 'broadcast'` and the id-if-absent splice applied to
    * the payload. The reference's `gen_random_uuid()` is the
    * caller-provided `idCol` — a deterministic id keeps the model
    * oracle-replayable; at scale a `uuid()` column is the drop-in.
    *
    * Swallow-to-WARNING arm
    * (…/20260605120000_rename_broadcast_send_warning.ex): the reference
    * wraps the INSERT in `BEGIN … EXCEPTION WHEN OTHERS THEN RAISE
    * WARNING 'WarnSendingBroadcastMessage: %', SQLERRM END` — a failed
    * insert DROPS the message and logs; the caller (a trigger, a user
    * statement) never sees an error. `insertErrorCol` is the modeled
    * SQLERRM (an RLS denial, a constraint, a partition race — whatever
    * the deployment's insert can throw): where non-null the row becomes
    * a WARNING side-output row (`error = 'WarnSendingBroadcastMessage:
    * <sqlerrm>'`, null payload — the insert never happened), and the
    * inserted set is `error IS NULL` — the same in-band error-channel
    * pattern as [[graft.pipeline.Multimodal]]'s extractFeaturesSafe. */
  def send(rows: DataFrame, payloadCol: Column, eventCol: Column,
      topicCol: Column, idCol: Column, insertedAtCol: Column,
      privateFlag: Boolean = true,
      insertErrorCol: Column = lit(null).cast("string")): DataFrame = {
    val failed = insertErrorCol.isNotNull
    rows.select(
      idCol.as("id"),
      when(!failed, spliceIdIfAbsent(payloadCol, idCol)).as("payload"),
      lit(null).cast("binary").as("binary_payload"),
      eventCol.as("event"),
      topicCol.as("topic"),
      lit(privateFlag).as("private"),
      lit("broadcast").as("extension"),
      insertedAtCol.as("inserted_at"),
      when(failed, concat(lit(SendWarningPrefix), insertErrorCol))
        .as("error"))
  }

  /** `realtime.broadcast_changes` + `realtime.send` over a change batch:
    * shape the payload and emit message rows. Input columns: `id`,
    * `operation`, `record` (JSON text or null), `old_record` (JSON text
    * or null), `table_name`, `table_schema`, `inserted_at`; `topicCol` /
    * `eventCol` are the trigger's arguments (any Column over the input).
    *
    * Output: messages-shaped rows `(id, payload, binary_payload=null,
    * event, topic, private, extension, inserted_at, error)`. A row whose
    * operation is not INSERT/UPDATE/DELETE carries
    * `error = 'unexpected_operation'` and a NULL payload (the reference
    * raises, so no message is written — filter on `error IS NULL` for the
    * inserted set). */
  def changesToMessages(changes: DataFrame, topicCol: Column,
      eventCol: Column, privateFlag: Boolean = true): DataFrame = {
    val opOk = col("operation").isin(ValidOps: _*)
    // record/old_record are ALREADY-ENCODED JSON text, spliced verbatim
    // (the no-double-encoding contract); the scalar string fields go
    // through JsonQuote so a quote/backslash in an identifier cannot emit
    // a malformed frame — the reference's jsonb_build_object escapes them
    // the same way.
    def jq(c: Column): Column = graft.plans.JsonQuote.quote(c)
    changes.select(
      col("id"),
      // the trailing "id" is realtime.send's id-if-absent splice (see
      // [[spliceIdIfAbsent]]): broadcast_changes' jsonb_build_object
      // never carries an 'id' key, so the send() the trigger PERFORMs
      // always injects the generated message id — spliced inline here
      // (statically known absent, no runtime key probe needed)
      when(opOk, concat(
        lit("{\"old_record\":"), coalesce(col("old_record"), lit("null")),
        lit(",\"record\":"), coalesce(col("record"), lit("null")),
        lit(",\"operation\":"), jq(col("operation")),
        lit(",\"table\":"), jq(col("table_name")),
        lit(",\"schema\":"), jq(col("table_schema")),
        lit(",\"id\":"), jq(col("id").cast("string")),
        lit("}"))).as("payload"),
      lit(null).cast("binary").as("binary_payload"),
      eventCol.as("event"),
      topicCol.as("topic"),
      lit(privateFlag).as("private"),
      lit("broadcast").as("extension"),
      col("inserted_at"),
      when(!opOk, lit("unexpected_operation")).as("error"))
  }

  /** `realtime.send_binary`: bytea payload into messages rows
    * (…/20260603120000_add_send_binary_function.ex:8-31). A null payload
    * is the modeled swallowed-warning case — the row is DROPPED (filter),
    * matching "RAISE WARNING … END" never inserting; `insertErrorCol`
    * models any OTHER insert failure the same way (see [[send]]'s
    * swallow-to-WARNING contract — same `BEGIN … EXCEPTION` wrapper in
    * the reference's bytea variant). */
  def sendBinary(rows: DataFrame, payloadCol: Column, eventCol: Column,
      topicCol: Column, idCol: Column, insertedAtCol: Column,
      privateFlag: Boolean = true,
      insertErrorCol: Column = lit(null).cast("string")): DataFrame = {
    val failed = insertErrorCol.isNotNull
    rows.select(
      idCol.as("id"),
      lit(null).cast("string").as("payload"),
      when(!failed, payloadCol).as("binary_payload"),
      eventCol.as("event"),
      topicCol.as("topic"),
      lit(privateFlag).as("private"),
      lit("broadcast").as("extension"),
      insertedAtCol.as("inserted_at"),
      when(failed, concat(lit(SendWarningPrefix), insertErrorCol))
        .as("error"))
      .where(col("binary_payload").isNotNull || col("error").isNotNull)
  }

  /** The replication-connection outbound loop over messages rows →
    * broadcast frames: `(tenant_topic, user_event, encoding,
    * payload_text, payload_binary, metadata_id, status)`.
    *
    * `status = 'delivered'` rows are the published set; error rows keep
    * the reference's first-failing-check name (`<field>_missing`,
    * `payload_missing`, `payload_size_exceeded`, `rate_limited`) and are
    * NOT published (`log_error("UnableToBroadcastChanges")` — the loop
    * skips them). Check order matches the `with` chain: inserted_at,
    * event, id, topic, private, payload pick, size, then the per-tenant
    * events-per-second rate limit (`check_rate_limit`,
    * replication_connection.ex:419-421) — pass the admission verdict as
    * `rateLimited` (a boolean Column over the input, e.g. a
    * [[graft.rates.Rates]] sliding-window gate); the default `false`
    * models a tenant whose limit is never hit. */
  def streamOut(messages: DataFrame, tenantId: String,
      maxPayloadKb: Long, rateLimited: Column = lit(false)): DataFrame = {
    val maxBytes = maxPayloadKb * 1000L + PayloadSizePadding
    val body = coalesce(col("binary_payload"),
      to_binary(col("payload"), lit("utf-8")))
    val status =
      when(col("inserted_at").isNull, "inserted_at_missing")
        .when(col("event").isNull, "event_missing")
        .when(col("id").isNull, "id_missing")
        .when(col("topic").isNull, "topic_missing")
        .when(col("private").isNull, "private_missing")
        .when(col("binary_payload").isNull && col("payload").isNull,
          "payload_missing")
        .when(octet_length(body) > maxBytes, "payload_size_exceeded")
        .when(rateLimited, "rate_limited")
        .otherwise("delivered")
    messages
      .withColumn("status", status)
      .select(
        when(col("private"), concat(lit(tenantId + "-private:"), col("topic")))
          .otherwise(concat(lit(tenantId + ":"), col("topic")))
          .as("tenant_topic"),
        col("event").as("user_event"),
        when(col("binary_payload").isNotNull, "binary")
          .when(col("payload").isNotNull, "json").as("encoding"),
        // verbatim body, split by encoding: JSON text is spliced raw
        // (never re-encoded), binary stays bytes
        when(col("status") === "delivered" && col("binary_payload").isNull,
          col("payload")).as("payload_text"),
        when(col("status") === "delivered", col("binary_payload"))
          .as("payload_binary"),
        col("id").as("metadata_id"),
        col("status"))
  }
}
