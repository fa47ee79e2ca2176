package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The channel JOIN payload parse —
  * `RealtimeWeb.Channels.Payloads.Join` and its embedded changesets
  * (lib/realtime_web/channels/payloads/{join,config,broadcast,presence,
  * postgres_change}.ex, broadcast/replay.ex): every socket join carries
  * a `{"config": {...}, "access_token": ...}` payload that the
  * reference validates into the channel's runtime flags. The semantics
  * pinned here:
  *
  *  - **FlexibleBoolean** (payloads/flexible_boolean.ex): `private`,
  *    `broadcast.ack`, `broadcast.self`, `broadcast.replication_ready`
  *    and `presence.enabled` accept real JSON booleans AND
  *    case-insensitive `"true"`/`"false"` strings; ANY other present
  *    value (numbers included — `1` is an error, not truthy) fails the
  *    changeset (`invalid_join_payload` in the error log). Absent
  *    fields default to `false`.
  *  - **Replay** (broadcast/replay.ex): `limit` defaults 10, `since`
  *    defaults 0; Ecto's `:integer` cast accepts integers and
  *    integer-shaped strings, anything else errors.
  *  - **postgres_changes** (config.ex:22-28): an explicit `null`
  *    becomes `[]`, and `nil` LIST ENTRIES are filtered out before the
  *    embeds cast — `[x, null]` is one change, not an error.
  *  - **presence.key** (join.ex:38-41): `:any` virtual — never a cast
  *    error; `nil` or `""` means the server GENERATES a key
  *    (`UUID.uuid1()`). The generated value is nondeterministic, so
  *    this engine emits `presence_key_generated = true` with a null
  *    key instead of minting one — the caller owns uuid minting at the
  *    socket boundary. A NUMBER key is legal in the reference
  *    (join_test.exs "presence key can be number") and is carried here
  *    as its JSON text — the key's only use is identity, which text
  *    form preserves.
  *
  * Known scalar-coercion proxy: the all-string parse renders JSON
  * scalars as their text, so a non-string `access_token`/`user_token`
  * (JSON `true`, a number) reads as that text where Ecto's `:string`
  * cast would error it to nil — token fields are strings in every
  * real client; the flexible-boolean and integer fields are unaffected
  * (their accept-sets are checked on the text).
  *  - **embed shape errors**: a `config`/`broadcast`/`presence`/
  *    `replay` that is present but not a map, or `postgres_changes`
  *    present but not an array, fails the changeset
  *    ("unable to parse, expected a map/an array of maps").
  *
  * **Validation is LOG-ONLY** (realtime_channel.ex:62-71): the channel
  * does NOT reject an invalid join payload — it logs
  * `InvalidJoinPayload` with the changeset errors and builds the join
  * from `apply_changes` of the INVALID changeset, so every field that
  * did cast applies and every field that didn't falls back to its
  * default (an uncastable `private` joins public, an uncastable replay
  * `limit` replays 10, a non-map `config` joins with everything
  * defaulted). This operator therefore emits the LENIENT effective
  * values on every row, plus `valid` as the log surface — `valid =
  * false` means the reference would have logged, not refused.
  *
  * Parse shape: the payload is parsed ONCE per nesting level with
  * all-string leaf schemas (Spark's Jackson parser returns the RAW
  * JSON text for StringType fields holding objects/arrays — verified,
  * this is what makes one-parse-per-level possible), each bind fenced
  * with [[graft.plans.EvalOnce]] so Catalyst cannot duplicate a parse
  * per downstream reference (the r12 wal2json lesson). Map-ness is a
  * first-character test on the raw subtree text — exact for decoded
  * JSON, no extra parse. Everything downstream of the four parses is
  * one codegen'd projection; the operator adds no exchange.
  */
object JoinConfig {

  /** FlexibleBoolean.cast over the raw JSON scalar text: `"true"` /
    * `"false"` case-insensitive → the boolean, anything else → null
    * (callers distinguish absent-so-default from present-but-invalid
    * via the raw column's nullness). JSON `true`/`false` arrive as the
    * text `true`/`false`, so booleans and flexible strings land in the
    * same two arms — exactly the reference's accept set. */
  def flexibleBoolean(raw: Column): Column =
    when(lower(raw) === "true", lit(true))
      .when(lower(raw) === "false", lit(false))

  private val l1Schema = StructType(Seq(
    StructField("config", StringType),
    StructField("access_token", StringType),
    StructField("user_token", StringType)))
  private val cfgSchema = StructType(Seq(
    StructField("private", StringType),
    StructField("broadcast", StringType),
    StructField("presence", StringType),
    StructField("postgres_changes", StringType)))
  private val bcSchema = StructType(Seq(
    StructField("ack", StringType),
    StructField("self", StringType),
    StructField("replication_ready", StringType),
    StructField("replay", StringType)))
  private val prSchema = StructType(Seq(
    StructField("enabled", StringType),
    StructField("key", StringType)))
  private val replaySchema = StructType(Seq(
    StructField("limit", StringType),
    StructField("since", StringType)))
  private val pgSchema = ArrayType(StructType(Seq(
    StructField("event", StringType),
    StructField("schema", StringType),
    StructField("table", StringType),
    StructField("filter", StringType))), containsNull = true)

  private def fence(c: Column): Column = graft.plans.EvalOnce.of(c)

  private def flexValid(raw: Column): Column =
    raw.isNull || lower(raw).isin("true", "false")
  private def intValid(raw: Column): Column =
    raw.isNull || raw.rlike("^-?\\d+$")
  private def mapOrAbsent(raw: Column): Column =
    raw.isNull || raw.startsWith("{")
  private def arrayOrAbsent(raw: Column): Column =
    raw.isNull || raw.startsWith("[")

  /** Parse the join payload column; adds the validated config surface
    * (`valid`, `private`, `ack`, `self_broadcast`, `replication_ready`,
    * `presence_enabled`, `presence_key`, `presence_key_generated`,
    * `replay_limit`, `replay_since`, `n_postgres_changes`,
    * `access_token`, `user_token`) and drops the intermediates. The
    * payload is assumed to be a decoded JSON object (Phoenix rejects
    * non-map join params upstream of the changeset). */
  def parse(df: DataFrame, payloadCol: String): DataFrame = {
    val staged = df
      .withColumn("_l1", fence(from_json(col(payloadCol), l1Schema)))
      .withColumn("_cfg", fence(from_json(col("_l1.config"), cfgSchema)))
      .withColumn("_bc", fence(from_json(col("_cfg.broadcast"), bcSchema)))
      .withColumn("_pr", fence(from_json(col("_cfg.presence"), prSchema)))
      .withColumn("_rp", fence(from_json(col("_bc.replay"), replaySchema)))
      .withColumn("_pg",
        fence(from_json(col("_cfg.postgres_changes"), pgSchema)))
    val valid =
      mapOrAbsent(col("_l1.config")) &&
        mapOrAbsent(col("_cfg.broadcast")) &&
        mapOrAbsent(col("_cfg.presence")) &&
        mapOrAbsent(col("_bc.replay")) &&
        arrayOrAbsent(col("_cfg.postgres_changes")) &&
        flexValid(col("_cfg.private")) && flexValid(col("_bc.ack")) &&
        flexValid(col("_bc.self")) &&
        flexValid(col("_bc.replication_ready")) &&
        flexValid(col("_pr.enabled")) &&
        intValid(col("_rp.limit")) && intValid(col("_rp.since"))
    // LENIENT per-field application (realtime_channel.ex:62-71): an
    // invalid payload is LOG-ONLY — the channel builds the join from
    // `apply_changes` of the invalid changeset, so every field that DID
    // cast applies and every field that didn't falls back to its
    // default. `valid` is the InvalidJoinPayload log surface, never a
    // rejection. The coalesce-to-default shape below IS that semantics:
    // an uncastable flexible boolean reads null → false, an uncastable
    // replay int reads null → 10/0, a non-map embed parses to nulls →
    // all its fields default, a non-array postgres_changes → [].
    def flex(raw: Column): Column = coalesce(flexibleBoolean(raw), lit(false))
    val keyGen = col("_pr.key").isNull || col("_pr.key") === ""
    staged.withColumn("valid", valid)
      .withColumn("private", flex(col("_cfg.private")))
      .withColumn("ack", flex(col("_bc.ack")))
      .withColumn("self_broadcast", flex(col("_bc.self")))
      .withColumn("replication_ready", flex(col("_bc.replication_ready")))
      .withColumn("presence_enabled", flex(col("_pr.enabled")))
      .withColumn("presence_key", when(!keyGen, col("_pr.key")))
      .withColumn("presence_key_generated", keyGen)
      .withColumn("replay_limit",
        coalesce(when(intValid(col("_rp.limit")),
          col("_rp.limit").cast("int")), lit(10)))
      .withColumn("replay_since",
        coalesce(when(intValid(col("_rp.since")),
          col("_rp.since").cast("long")), lit(0L)))
      .withColumn("n_postgres_changes",
        coalesce(size(filter(col("_pg"), x => x.isNotNull)), lit(0)))
      .withColumn("access_token", col("_l1.access_token"))
      .withColumn("user_token", col("_l1.user_token"))
      .drop("_l1", "_cfg", "_bc", "_pr", "_rp", "_pg")
  }

  /** The two TENANT-config join gates that run right after the parse
    * (realtime_channel.ex:84-86, 1062-1068, 1097-1099):
    *  - `only_private?`: a tenant with `private_only` set REJECTS any
    *    non-private join (`private_only` error — a real rejection,
    *    unlike the payload validation above);
    *  - `presence_enabled?`: the effective presence flag is the
    *    client's parsed flag OR the tenant's `presence_enabled`
    *    override — a tenant can force presence on for joins that
    *    didn't ask.
    * Tenant config is a broadcast dimension; both gates are one
    * codegen'd projection on the join stream. */
  def joinGates(joins: DataFrame, tenants: DataFrame,
      tenantCol: String = "tenant", privateCol: String = "private",
      presenceEnabledCol: String = "presence_enabled"): DataFrame =
    joins.join(broadcast(tenants.select(col(tenantCol),
        col("private_only"), col("tenant_presence_enabled"))), tenantCol)
      .withColumn("presence_enabled_effective",
        col(presenceEnabledCol) || col("tenant_presence_enabled"))
      .withColumn("join_status",
        when(col("private_only") && !col(privateCol),
          "rejected_private_only").otherwise("ok"))
}
