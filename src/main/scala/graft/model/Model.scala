package graft.model

/** Core data model of the engine.
  *
  * Shapes derived from the reference's subscription table and change structs:
  *  - subscription row: /root/reference/lib/realtime/tenants/repo/migrations/20211116024918_create_realtime_subscription_table.ex:31-43
  *    (+ action_filter 20251120212548:8, + selected_columns 20260527120000:15)
  *  - filter composite: same migration:18-29, negate added 20260626120000_readd_postgrest_filter_ops.ex:47-64
  *  - change records: /root/reference/lib/realtime/adapters/changes.ex:10-64
  */

/** A single predicate from the filter DSL (`col=not.op.value`).
  *
  * `value` is kept as text (the reference stores filter values as text and
  * casts to the column type at compile/validation time, 20260626120000:141-148).
  * For the `in` operator, `values` holds the parsed list instead.
  */
final case class Filter(
    column: String,
    op: String,
    value: String,
    values: Seq[String] = Nil,
    negate: Boolean = false
)

object Filter {
  /** The 13 supported operators (reference: subscriptions.ex:20). */
  val Ops: Set[String] = Set(
    "eq", "neq", "lt", "lte", "gt", "gte", "in",
    "like", "ilike", "is", "match", "imatch", "isdistinct"
  )

  /** Valid RHS keywords for the `is` operator (20260626120000:219-228). */
  val IsKeywords: Set[String] = Set("null", "true", "false", "unknown")

  /** Max cardinality of an `in` list (20260626120000:230-234). */
  val MaxInValues: Int = 100
}

/** A subscription: who wants which changes from which table.
  *
  * `actionFilter` ∈ {"*","INSERT","UPDATE","DELETE"}; `selectedColumns` empty
  * means "all privileged columns".
  */
final case class Subscription(
    subscriptionId: String,
    schema: String,
    table: String,
    filters: Seq[Filter] = Nil,
    claimsRole: String = "authenticated",
    actionFilter: String = "*",
    selectedColumns: Seq[String] = Nil
) {
  /** Canonical form: filters sorted by (column, op, value, negate), selected
    * columns sorted — the dedup identity the reference's
    * subscription_check_filters trigger enforces (20260626120000:289-299). */
  def canonical: Subscription = copy(
    filters = filters.sortBy(f => (f.column, f.op, f.value + f.values.mkString(","), f.negate)),
    selectedColumns = selectedColumns.sorted
  )
}

/** Change types carried on the CDC stream. TRUNCATE rows carry no row
  * data (reference `TruncatedRelation`, changes.ex:61-64, decoded from
  * the wire 'T' message) — they route to `action_filter = "*"` subscribers
  * only, with filters bypassed. */
object ChangeType {
  val Insert = "INSERT"
  val Update = "UPDATE"
  val Delete = "DELETE"
  val Truncate = "TRUNCATE"
  val All = Seq(Insert, Update, Delete, Truncate)
}

/** A message-log row (broadcast / replay), reference messages table:
  * 20241030150047_messages_partitioning.ex:7-18. */
final case class Message(
    id: Long,
    uuid: String,
    topic: String,
    extension: String, // 'broadcast' | 'presence'
    payload: String,   // JSON text
    event: String,
    isPrivate: Boolean, // DF column name "private"; `private` is not encodable
    insertedAt: java.sql.Timestamp
)

/** Presence track/untrack event (input to the presence state machine). */
final case class PresenceEvent(
    topic: String,
    key: String,
    action: String, // 'track' | 'untrack'
    meta: String,   // JSON payload
    ts: java.sql.Timestamp
)

/** Emitted presence diff row. */
final case class PresenceDiff(
    topic: String,
    key: String,
    kind: String, // 'join' | 'leave'
    meta: String
)
