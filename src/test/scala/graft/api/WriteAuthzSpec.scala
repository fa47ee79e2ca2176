package graft.api

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Broadcast write-path authorization: the rolled-back insert probe as a
  * policy-view join (authorization.ex:273-341), silent denied drops with
  * no rate-counter increment, the post-authz oversize guard, and the
  * end-to-end ingest → write-gate → dispatcher read-gate composition
  * (broadcast_handler.ex:25-88 → message_dispatcher.ex:46-110). */
class WriteAuthzSpec extends SparkSpec {
  import spark.implicits._

  // (topic, role, private, payload_bytes)
  private lazy val ingest = Seq(
    ("open", "anon", false, 4L),        // public: always allowed
    ("open", "anon", false, 99L),       // public but oversize
    ("locked", "service", true, 4L),    // private, policy row → allowed
    ("locked", "service", true, 99L),   // private allowed but oversize
    ("locked", "anon", true, 4L),       // private, no policy row → denied
    ("locked", "anon", true, 99L),      // denied wins over oversize
    ("other", "service", true, 4L)      // private, no policy row → denied
  ).toDF("topic", "role", "private", "payload_bytes")

  private lazy val policies =
    Seq(("service", "locked")).toDF("role", "topic")

  private def checked = WriteAuthz.check(ingest, policies, maxPayloadBytes = 8)

  test("public skips the probe; private is fail-closed on the policy view") {
    val st = checked
      .select($"topic", $"role", $"payload_bytes", $"status")
      .as[(String, String, Long, String)].collect().toSet
    assert(st == Set(
      ("open", "anon", 4L, "deliver"),
      ("open", "anon", 99L, "oversize"),
      ("locked", "service", 4L, "deliver"),
      ("locked", "service", 99L, "oversize"),
      ("locked", "anon", 4L, "denied"),
      ("locked", "anon", 99L, "denied"),
      ("other", "service", 4L, "denied")))
  }

  test("denied pushes do not increment the rate counter; all others do") {
    val counted = checked.where($"rate_counted")
      .select($"topic", $"role", $"payload_bytes")
      .as[(String, String, Long)].collect().toSet
    // oversize still counts (the reference increments before the size
    // check); only write-denied rows are excluded
    assert(counted == Set(
      ("open", "anon", 4L), ("open", "anon", 99L),
      ("locked", "service", 4L), ("locked", "service", 99L)))
  }

  test("plan shape: two broadcast joins, ingest never shuffle-joined") {
    val plan = checked.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"policy probe and decision re-join must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the ingest stream must not be exchanged for a pair join:\n$plan")
  }

  test("ingest → write gate → dispatcher read gate composes end to end") {
    // authorized deliveries become the dispatcher's message stream; a
    // denied push must never reach any socket, read-side gating intact
    val msgs = checked.where($"status" === "deliver")
      .select($"topic", monotonically_increasing_id().as("message_id"),
        lit("broadcast").as("extension"))
    val sockets = Seq(
      ("sOpen", "open", Some(true), true),
      ("sLocked", "locked", Some(true), true),
      ("sNoRead", "locked", Some(true), false)
    ).toDF("socket_id", "topic", "presence_read", "broadcast_read")
    val gated = Dispatcher.gate(msgs, sockets)
      .select($"socket_id", $"topic").as[(String, String)].collect().toSeq
    // one authorized public push → sOpen; one authorized private push →
    // sLocked only (sNoRead lacks broadcast_read); denied pushes gone
    assert(gated.sorted == Seq(("sLocked", "locked"), ("sOpen", "open")))
  }
}
