package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-socket read-gating of presence/broadcast fan-out — the reference's
  * message dispatcher (/root/reference/lib/realtime_web/channels/
  * realtime_channel/message_dispatcher.ex:46-110) re-expressed
  * relationally:
  *
  *  - `presence_diff` frames reach a socket only when its
  *    `presence_read` authorization is TRUE; a NULL (not yet authorized —
  *    presence wasn't enabled at join) defers to channel-time
  *    authorization (`status = 'authorize'`, the `:authorize_presence_diff`
  *    route); FALSE withholds silently.
  *  - `broadcast` frames require `broadcast_read = true`, and skip
  *    messages the socket already received via replay
  *    (`already_replayed?`, the per-socket replayed-id set).
  *
  * Scale shape: messages ⨝ sockets is a broadcast hash join on `topic`
  * (sockets are the small dimension; salt hot topics upstream if
  * needed), the gate itself is a codegen'd projection, and the replay
  * exclusion is a **broadcast of per-socket replay-id sets** — the
  * reference caps replay at 25 messages per socket join
  * (lib/realtime/messages.ex:10), so the set side is ≤ 25·|sockets| ids
  * no matter how large the message stream is, and the stream itself
  * never shuffles: gate → exclusion → output is one narrow codegen'd
  * pass. (A pair-wise shuffle join would re-partition every gated
  * message row by (socket, message) — at 100× stream volume that
  * exchange, not the gate, would be the bottleneck.) Withheld rows
  * never materialize past the filter.
  */
object Dispatcher {

  /** Gate messages per socket. `messages`: (topic, message_id, extension ∈
    * 'presence_diff'|'broadcast'|'postgres_changes', …); `sockets`:
    * (socket_id, topic, presence_read: nullable bool, broadcast_read:
    * bool); `replayed` (optional): (socket_id, message_id) pairs already
    * delivered via replay. Returns one row per (message × allowed socket)
    * with `status` 'deliver' or 'authorize'.
    *
    * Only `presence_diff` and `broadcast` frames are read-gated: the
    * dispatcher's withhold arm is `broadcast? and broadcast_read? !=
    * true` (message_dispatcher.ex:93) and `broadcast?` is true only for
    * Broadcast/UserBroadcast structs (:113-118) — a `postgres_changes`
    * row reaching a matched subscriber is delivered (and billed,
    * replication_poller.ex:421) UNCONDITIONALLY, regardless of the
    * socket's broadcast_read policy.
    *
    * With `senderExclusion = true`, `messages`
    * additionally carries `sender_socket_id` and `self_broadcast` and
    * the gate drops the SENDER'S OWN socket from the fan-out unless the
    * push opted into self-delivery — the reference's
    * `pubsub_broadcast_from(self(), …)` vs `pubsub_broadcast` split on
    * the join config's `self` flag (broadcast_handler.ex:120-141) and
    * the dispatcher's `pid == from` skip (message_dispatcher.ex:49,93).
    * The exclusion is one conjunct in the same codegen'd filter. */
  def gate(
      messages: DataFrame,
      sockets: DataFrame,
      replayed: Option[DataFrame] = None,
      senderExclusion: Boolean = false): DataFrame = {
    val base0 = messages.join(sockets, "topic")
    val joined = (if (senderExclusion)
        base0.where(col("self_broadcast") ||
          !(col("socket_id") <=> col("sender_socket_id")))
      else base0)
      .withColumn("status",
        when(col("extension") === "presence_diff",
          when(col("presence_read") <=> true, "deliver")
            .when(col("presence_read").isNull, "authorize")
            .otherwise("withhold"))
        .when(col("extension") === "broadcast",
          when(col("broadcast_read") <=> true, "deliver")
            .otherwise("withhold"))
        // postgres_changes (and any other non-gated extension): the
        // dispatcher's broadcast? guard is false, so no read gate applies
        .otherwise("deliver"))
      .where(col("status") =!= "withhold")
    val unreplayed = replayed match {
      case Some(r) =>
        // broadcast hash join on the (socket, message) pair: the replay
        // side is bounded by the per-socket replay cap, so it broadcasts,
        // and the message stream is probed hash-per-row without ever
        // being re-partitioned (a shuffle join here would exchange every
        // gated message row — the bottleneck at 100× stream volume; a
        // per-socket array set would make the probe linear in set size)
        joined
          .join(broadcast(r.select(col("socket_id"), col("message_id"))
              .withColumn("_replayed", lit(true))),
            Seq("socket_id", "message_id"), "left")
          .where(!(col("extension") === "broadcast" &&
            coalesce(col("_replayed"), lit(false))))
          .drop("_replayed")
      case None => joined
    }
    unreplayed
  }

  /** The dispatcher's presence counter: delivered presence_diff count per
    * topic (increment_presence_counter, message_dispatcher.ex:85). */
  def presenceCounters(gated: DataFrame): DataFrame =
    gated.where(col("extension") === "presence_diff" &&
        col("status") === "deliver")
      .groupBy("topic").agg(count(lit(1)).as("n_presence_delivered"))

  /** The sender-side ACK surface of a broadcast push
    * (broadcast_handler.ex:95-118): after the size check, the handler
    * replies to the SENDER only when the join opted into `ack` —
    * `{:error, :payload_size_exceeded}` if the push was oversize,
    * `:ok` otherwise. WITHOUT ack the handler is `:noreply` in every
    * case — an oversize error is SILENTLY swallowed (the push just
    * doesn't fan out), which is the sharp arm this helper pins. Null
    * reply = no reply frame sent. */
  def ackReplies(pushes: DataFrame, ackCol: String = "ack",
      oversizeCol: String = "oversize"): DataFrame =
    pushes.withColumn("reply",
      when(col(ackCol) && col(oversizeCol), "error_payload_size_exceeded")
        .when(col(ackCol), "ok")
        .otherwise(lit(null).cast("string")))
}
