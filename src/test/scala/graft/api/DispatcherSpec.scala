package graft.api

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Per-socket read-gating: presence_read tri-state, broadcast_read, and
  * the replayed-message exclusion that only applies to broadcasts. */
class DispatcherSpec extends SparkSpec {
  import spark.implicits._

  lazy val messages = Seq(
    ("room1", 1L, "presence_diff"),
    ("room1", 2L, "broadcast"),
    ("room1", 3L, "broadcast")
  ).toDF("topic", "message_id", "extension")

  lazy val sockets = Seq(
    ("sTrue", "room1", Some(true), true),
    ("sFalse", "room1", Some(false), true),
    ("sNull", "room1", None, false)
  ).toDF("socket_id", "topic", "presence_read", "broadcast_read")

  test("presence diffs: true delivers, false withholds, null defers") {
    val out = Dispatcher.gate(messages, sockets)
      .where($"extension" === "presence_diff")
      .select("socket_id", "status").as[(String, String)].collect().toMap
    assert(out == Map("sTrue" -> "deliver", "sNull" -> "authorize"))
  }

  test("broadcasts gated by broadcast_read; replay skips only broadcasts") {
    val replayed = Seq(("sTrue", 2L), ("sTrue", 1L))
      .toDF("socket_id", "message_id")
    val out = Dispatcher.gate(messages, sockets, Some(replayed))
      .select("socket_id", "message_id", "extension")
      .as[(String, Long, String)].collect().toSet
    // sTrue: broadcast 2 replayed → only 3; presence 1 unaffected by the
    // replay entry (replay applies to broadcasts only)
    assert(out.contains(("sTrue", 1L, "presence_diff")))
    assert(!out.contains(("sTrue", 2L, "broadcast")))
    assert(out.contains(("sTrue", 3L, "broadcast")))
    // sNull has broadcast_read=false → no broadcasts at all
    assert(!out.exists(r => r._1 == "sNull" && r._3 == "broadcast"))
    // sFalse receives broadcasts (read=true) but no presence diffs
    assert(out.contains(("sFalse", 2L, "broadcast")))
    assert(!out.exists(r => r._1 == "sFalse" && r._3 == "presence_diff"))
  }

  test("sender exclusion: self=false drops only the sender's socket; " +
      "ack replies pin the silent-oversize arm") {
    val pushes = Seq(
      // sender sTrue, self=false → sTrue excluded, sFalse delivers
      ("room1", 10L, "broadcast", "sTrue", false, true, false),
      // sender sTrue, self=true → both readable sockets deliver
      ("room1", 11L, "broadcast", "sTrue", true, false, false),
      // oversize + ack → error reply; oversize + no ack → silent null
      ("room1", 12L, "broadcast", "sFalse", true, true, true),
      ("room1", 13L, "broadcast", "sFalse", true, false, true)
    ).toDF("topic", "message_id", "extension", "sender_socket_id",
      "self_broadcast", "ack", "oversize")
    val gated = Dispatcher.gate(pushes.where(!$"oversize"), sockets,
        None, senderExclusion = true)
      .where($"extension" === "broadcast")
      .select("message_id", "socket_id").as[(Long, String)]
      .collect().groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    // readable broadcast sockets: sTrue, sFalse (sNull read=false)
    assert(gated(10L) == Set("sFalse"))
    assert(gated(11L) == Set("sTrue", "sFalse"))
    val replies = Dispatcher.ackReplies(pushes)
      .select("message_id", "reply").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) "-" else r.getString(1)))
      .toMap
    assert(replies == Map(10L -> "ok", 11L -> "-",
      12L -> "error_payload_size_exceeded", 13L -> "-"))
  }

  test("presence counter counts delivered diffs per topic") {
    val n = Dispatcher.presenceCounters(Dispatcher.gate(messages, sockets))
      .as[(String, Long)].collect().toMap
    assert(n == Map("room1" -> 1L))
  }

  test("presence-state diffs flow through the per-socket gate end to end") {
    // the reference flow: presence events → latest state → diff frames →
    // per-socket presence_read gating (message_dispatcher.ex:46-85)
    import graft.presence.Presence
    val pe = Seq(
      ("room1", "alice", "track", """{"s":1}""",
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      ("room1", "bob", "track", """{"s":2}""",
        java.sql.Timestamp.valueOf("2024-01-01 00:00:01")),
      ("room1", "bob", "untrack", "",
        java.sql.Timestamp.valueOf("2024-01-01 00:00:02"))
    ).toDF("topic", "key", "action", "meta", "ts")
    val diffs = Presence.latestState(pe)
      .select($"topic", monotonically_increasing_id().as("message_id"),
        lit("presence_diff").as("extension"), $"key")
    val out = Dispatcher.gate(diffs, sockets)
      .select("socket_id", "key", "status")
      .as[(String, String, String)].collect().toSet
    // only alice survives the untrack; only sTrue delivers, sNull defers
    assert(out == Set(("sTrue", "alice", "deliver"),
      ("sNull", "alice", "authorize")))
  }
}
