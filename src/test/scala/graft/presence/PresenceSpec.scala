package graft.presence

import graft.SparkSpec
import graft.model.{PresenceDiff, PresenceEvent}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

class PresenceSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("latestState: last writer wins, untrack removes") {
    val pe = Seq(
      PresenceEvent("room1", "u1", "track", "m1", t("2024-01-01 10:00:00")),
      PresenceEvent("room1", "u1", "untrack", "", t("2024-01-01 10:00:05")),
      PresenceEvent("room1", "u2", "track", "m2", t("2024-01-01 10:00:01")),
      PresenceEvent("room1", "u2", "track", "m2b", t("2024-01-01 10:00:06")),
      PresenceEvent("room2", "u1", "track", "m3", t("2024-01-01 10:00:02"))
    ).toDF()
    val got = Presence.latestState(pe)
      .select("topic", "key", "meta").as[(String, String, String)]
      .collect().toSet
    assert(got == Set(("room1", "u2", "m2b"), ("room2", "u1", "m3")))
  }

  test("stateSync groups presences per topic") {
    val state = Seq(
      ("room1", "u1", "m1", t("2024-01-01 10:00:00")),
      ("room1", "u2", "m2", t("2024-01-01 10:00:01"))
    ).toDF("topic", "key", "meta", "ts")
    val got = Presence.stateSync(state)
      .select("topic", "presences.key").as[(String, Seq[String])]
      .collect().toMap
    assert(got("room1") == Seq("u1", "u2"))
  }

  test("ORSWOT merge: both orderings converge; add wins; observed-remove wins") {
    // replica A's log: tracks u1 (clock 1), tracks u2 (3), untracks u2 (5)
    val evA = Seq(
      ("room", "u1", "track", "m1", 1L),
      ("room", "u2", "track", "m2", 3L),
      ("room", "u2", "untrack", "", 5L)
    ).toDF("topic", "key", "action", "meta", "seq")
    // replica B's log: tracks u3 (2), tracks u4 (6)
    val evB = Seq(
      ("room", "u3", "track", "m3", 2L),
      ("room", "u4", "track", "m4", 6L)
    ).toDF("topic", "key", "action", "meta", "seq")
    // A synced B's state at clock 2 (holds u3, observed rB→2); B synced
    // A's state at clock 3 (holds u1 AND the now-dead u2, observed rA→3)
    val a = Presence.mergeTrackers(
      Presence.trackerFromEvents(evA, "rA"),
      Presence.trackerFromEvents(evB.where($"seq" <= 2), "rB"))
    val b = Presence.mergeTrackers(
      Presence.trackerFromEvents(evB, "rB"),
      Presence.trackerFromEvents(evA.where($"seq" <= 3), "rA"))
    def rows(st: Presence.TrackerState) = st.entries
      .select("topic", "key", "meta", "replica", "clock")
      .as[(String, String, String, String, Long)].collect().toSet
    val ab = Presence.mergeTrackers(a, b)
    // u1: shared dot, stays. u2: B holds a copy but A OBSERVED the dot
    // and removed it — remove wins, no resurrection. u3: shared. u4: in
    // B only with clock 6 > A's observed rB→2 — concurrent add wins.
    val expected = Set(
      ("room", "u1", "m1", "rA", 1L),
      ("room", "u3", "m3", "rB", 2L),
      ("room", "u4", "m4", "rB", 6L))
    assert(rows(ab) == expected)
    // commutative and idempotent (CRDT join laws)
    assert(rows(Presence.mergeTrackers(b, a)) == expected)
    assert(rows(Presence.mergeTrackers(ab, ab)) == rows(ab))
    assert(rows(Presence.mergeTrackers(ab, a)) == expected)
    // merged vv is the pointwise max
    val vv = ab.vv.as[(String, Long)].collect().toMap
    assert(vv == Map("rA" -> 5L, "rB" -> 6L))
    // re-track with new meta: the newer dot replaces the stale copy
    val evA2 = evA.union(Seq(("room", "u1", "track", "m1b", 7L))
      .toDF("topic", "key", "action", "meta", "seq"))
    val a2 = Presence.trackerFromEvents(evA2, "rA")
    val merged2 = Presence.mergeTrackers(a2, ab)
    assert(rows(merged2).contains(("room", "u1", "m1b", "rA", 7L)) &&
      !rows(merged2).exists(r => r._2 == "u1" && r._3 == "m1"))
  }

  test("ORSWOT merge: CRDT join laws on randomized three-replica logs") {
    // deterministic pseudo-random logs: tracks/untracks over shared keys
    // with unique per-replica clocks, plus stale cross-syncs — the lattice
    // laws (commutative, associative, idempotent) must hold for ANY such
    // states, and any merge order must converge to one state
    for (seed <- Seq(7, 23, 91)) {
      val rnd = new scala.util.Random(seed)
      val keys = Seq("k1", "k2", "k3", "k4")
      def log(replica: Int): org.apache.spark.sql.DataFrame = {
        val n = 6 + rnd.nextInt(6)
        (1 to n).map { i =>
          val action = if (rnd.nextInt(3) == 0) "untrack" else "track"
          ("room", keys(rnd.nextInt(keys.size)), action,
            s"m$replica-$i", replica * 1000L + i)
        }.toDF("topic", "key", "action", "meta", "seq")
      }
      val (la, lb, lc) = (log(1), log(2), log(3))
      def cutoff(df: org.apache.spark.sql.DataFrame) =
        df.where($"seq" % 1000 <= 3 + rnd.nextInt(3))
      // each tracker: own log + a stale snapshot of one peer
      val a = Presence.mergeTrackers(
        Presence.trackerFromEvents(la, "rA"),
        Presence.trackerFromEvents(cutoff(lb), "rB"))
      val b = Presence.mergeTrackers(
        Presence.trackerFromEvents(lb, "rB"),
        Presence.trackerFromEvents(cutoff(lc), "rC"))
      val c = Presence.mergeTrackers(
        Presence.trackerFromEvents(lc, "rC"),
        Presence.trackerFromEvents(cutoff(la), "rA"))
      def rows(st: Presence.TrackerState) = st.entries
        .select("topic", "key", "meta", "replica", "clock")
        .as[(String, String, String, String, Long)].collect().toSet
      val m = Presence.mergeTrackers _
      val abc = rows(m(m(a, b), c))
      assert(abc == rows(m(a, m(b, c))), s"associative (seed $seed)")
      assert(abc == rows(m(m(a, c), b)), s"order-free (seed $seed)")
      assert(abc == rows(m(m(b, a), c)), s"commutative (seed $seed)")
      assert(rows(m(m(a, b), m(a, b))) == rows(m(a, b)),
        s"idempotent (seed $seed)")
      // the N-way fold: one-shuffle mergeAll == any pairwise fold order
      assert(rows(Presence.mergeAll(Seq(a, b, c))) == abc,
        s"mergeAll == pairwise fold (seed $seed)")
      assert(rows(Presence.mergeAll(Seq(c, a, b))) == abc,
        s"mergeAll permutation-free (seed $seed)")
      assert(rows(Presence.mergeAll(Seq(a, b, c, b))) == abc,
        s"mergeAll duplicate-state idempotent (seed $seed)")
      // the pure in-memory snapshot merge (the streaming sync path's
      // engine) agrees with the relational merge pointwise
      def snap(st: Presence.TrackerState): Presence.Snapshot =
        Presence.Snapshot(
          st.entries.select("key", "meta", "replica", "clock")
            .as[(String, String, String, Long)].collect()
            .map(r => Presence.Dot(r._1, r._2, r._3, r._4)).toSet,
          st.vv.as[(String, Long)].collect().toMap)
      val pure = Presence.mergeSnapshots(
        Presence.mergeSnapshots(snap(a), snap(b)), snap(c))
      assert(pure.entries.map(d =>
          ("room", d.key, d.meta, d.replica, d.clock)) == abc,
        s"mergeSnapshots == mergeTrackers (seed $seed)")
    }
  }

  test("diffStreamSync: three replicas, interleaved mid-stream syncs, " +
      "stale re-sync does not resurrect; converges to mergeAll") {
    implicit val s = spark
    import Presence.{Dot, ReplicaOp}
    val input = MemoryStream[ReplicaOp](spark)
    val q = Presence.diffStreamSync(input.toDS())
      .writeStream.format("memory").queryName("psync")
      .outputMode(OutputMode.Append).start()
    def diffs = spark.table("psync").as[PresenceDiff].collect().toSet
    try {
      // batch 1: local tracker rA tracks u1, u2
      input.addData(
        ReplicaOp.track("room", 1L, "u1", "m1", "rA", 1L),
        ReplicaOp.track("room", 2L, "u2", "m2", "rA", 2L))
      q.processAllAvailable()
      val b1 = diffs
      assert(b1 == Set(
        PresenceDiff("room", "u1", "join", "m1"),
        PresenceDiff("room", "u2", "join", "m2")))
      // batch 2: replica rB's snapshot syncs in mid-stream — u2 gains a
      // second presence (a distinct dot, Phoenix metas-list semantics),
      // u3 joins
      input.addData(ReplicaOp.sync("room", 3L,
        Seq(Dot("u2", "mB", "rB", 11L), Dot("u3", "mB3", "rB", 12L)),
        Map("rB" -> 12L)))
      q.processAllAvailable()
      val b2 = diffs -- b1
      assert(b2 == Set(
        PresenceDiff("room", "u2", "join", "mB"),
        PresenceDiff("room", "u3", "join", "mB3")))
      // batch 3: local untrack of u1, then a LATE replica rC syncs its
      // own u1 presence — the untrack removed rA's dot only, rC's dot is
      // unobserved and joins
      input.addData(
        ReplicaOp.untrack("room", 4L, "u1", "rA", 3L),
        ReplicaOp.sync("room", 5L,
          Seq(Dot("u1", "mC", "rC", 21L)), Map("rC" -> 21L)))
      q.processAllAvailable()
      val b3 = diffs -- b1 -- b2
      assert(b3 == Set(
        PresenceDiff("room", "u1", "leave", "m1"),
        PresenceDiff("room", "u1", "join", "mC")))
      // batch 4: a STALE rB re-sync still carrying rA's long-removed u1
      // dot (observed ⇒ no resurrection) and missing nothing new — the
      // merge must be a no-op
      input.addData(ReplicaOp.sync("room", 6L,
        Seq(Dot("u2", "mB", "rB", 11L), Dot("u3", "mB3", "rB", 12L),
          Dot("u1", "m1", "rA", 1L)),
        Map("rB" -> 11L, "rA" -> 1L)))
      q.processAllAvailable()
      assert((diffs -- b1 -- b2 -- b3).isEmpty,
        "stale snapshot must not resurrect observed-removed dots")
      // the streamed state == the batch N-way merge of the three
      // replicas' tracker states
      val logA = Seq(
        ("room", "u1", "track", "m1", 1L), ("room", "u2", "track", "m2", 2L),
        ("room", "u1", "untrack", "", 3L))
        .toDF("topic", "key", "action", "meta", "seq")
      val stB = Presence.TrackerState(
        Seq(("room", "u2", "mB", "rB", 11L), ("room", "u3", "mB3", "rB", 12L))
          .toDF("topic", "key", "meta", "replica", "clock"),
        Seq(("rB", 12L)).toDF("replica", "clock"))
      val stC = Presence.TrackerState(
        Seq(("room", "u1", "mC", "rC", 21L))
          .toDF("topic", "key", "meta", "replica", "clock"),
        Seq(("rC", 21L)).toDF("replica", "clock"))
      val merged = Presence.mergeAll(Seq(
          Presence.trackerFromEvents(logA, "rA"), stB, stC))
        .entries.select("key", "meta").as[(String, String)].collect().toSet
      // .iterator before collect: a Map's collect over pair results
      // rebuilds a Map keyed by km._1 and silently drops same-key metas
      val streamed = diffs.groupBy(d => (d.key, d.meta)).iterator.collect {
        case (km, ds)
          if ds.count(_.kind == "join") > ds.count(_.kind == "leave") => km
      }.toSet
      assert(merged == Set(
        ("u2", "m2"), ("u2", "mB"), ("u3", "mB3"), ("u1", "mC")),
        s"batch mergeAll state: $merged")
      assert(streamed == merged,
        s"streamed net state $streamed != merged $merged")
    } finally q.stop()
  }

  test("diffStream emits joins, meta-update joins, and leaves across batches") {
    implicit val s = spark
    val input = MemoryStream[PresenceEvent](spark)
    val q = Presence.diffStream(input.toDS())
      .writeStream.format("memory").queryName("pdiff")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        PresenceEvent("room1", "u1", "track", "m1", t("2024-01-01 10:00:00")),
        PresenceEvent("room1", "u2", "track", "m2", t("2024-01-01 10:00:01")))
      q.processAllAvailable()
      val b1 = spark.table("pdiff").as[PresenceDiff].collect().toSet
      assert(b1 == Set(
        PresenceDiff("room1", "u1", "join", "m1"),
        PresenceDiff("room1", "u2", "join", "m2")))

      input.addData(
        PresenceEvent("room1", "u1", "untrack", "", t("2024-01-01 10:01:00")),
        PresenceEvent("room1", "u2", "track", "m2b", t("2024-01-01 10:01:01")),
        PresenceEvent("room1", "u2", "track", "m2b", t("2024-01-01 10:01:02")))
      q.processAllAvailable()
      val b2 = spark.table("pdiff").as[PresenceDiff].collect().toSet -- b1
      // leave for u1 with its tracked meta; u2's meta change is an
      // already_tracked UPDATE — leave(old) + join(new) in one diff
      // (presence_handler.ex:162-170); the duplicate re-track of
      // identical meta is a :no_payload_change no-op
      assert(b2 == Set(
        PresenceDiff("room1", "u1", "leave", "m1"),
        PresenceDiff("room1", "u2", "leave", "m2"),
        PresenceDiff("room1", "u2", "join", "m2b")))
    } finally q.stop()
  }

  test("diffStream idle reap: the reaped topic emits leaves, re-track joins fresh") {
    implicit val s = spark
    val input = MemoryStream[PresenceEvent](spark)
    val q = Presence.diffStream(input.toDS(), timeoutMs = 100L)
      .writeStream.format("memory").queryName("pdiff_reap")
      .outputMode(OutputMode.Append).start()
    // sequence via SparkSpec's sink-polling awaitRows
    // (processAllAvailable hangs under ProcessingTimeTimeout)
    try {
      input.addData(
        PresenceEvent("room1", "u1", "track", "m1", t("2024-01-01 10:00:00")),
        PresenceEvent("room1", "u2", "track", "m2", t("2024-01-01 10:00:01")))
      awaitRows("pdiff_reap", 2L) // two joins
      Thread.sleep(600L) // idle → the reap emits a leave per present key
      awaitRows("pdiff_reap", 4L)
      val afterReap = spark.table("pdiff_reap").as[PresenceDiff].collect()
      assert(afterReap.count(d => d.kind == "leave") == 2,
        s"reap must emit one leave per present key: ${afterReap.toSeq}")
      // a returning key is a fresh join (state was removed, not a
      // meta-update leave+join pair — which would carry the OLD meta m1)
      input.addData(
        PresenceEvent("room1", "u1", "track", "m1b", t("2024-01-01 10:20:00")))
      awaitRows("pdiff_reap", 5L)
      val last = spark.table("pdiff_reap").as[PresenceDiff].collect()
        .diff(afterReap)
      assert(last.contains(PresenceDiff("room1", "u1", "join", "m1b")),
        s"got ${last.toSeq}")
      assert(!last.contains(PresenceDiff("room1", "u1", "leave", "m1")),
        s"must not replay the pre-reap meta as an update pair: ${last.toSeq}")
      // (a trailing leave(m1b) may appear if the 100 ms reap fires again
      // before the collect — the query is still live; that's the reap
      // doing its job, not a semantic defect)
    } finally q.stop()
  }

  test("already_tracked: update diff ordering is leave(old) then join(new)") {
    implicit val s = spark
    val input = MemoryStream[PresenceEvent](spark)
    val q = Presence.diffStream(input.toDS())
      .writeStream.format("memory").queryName("pdiff_upd")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        PresenceEvent("r", "u", "track", "a", t("2024-01-01 10:00:00")),
        PresenceEvent("r", "u", "track", "a", t("2024-01-01 10:00:01")),
        PresenceEvent("r", "u", "track", "b", t("2024-01-01 10:00:02")))
      q.processAllAvailable()
      val got = spark.table("pdiff_upd").as[PresenceDiff].collect().toSeq
      // join(a); re-track(a) no-op; re-track(b) → leave(a) + join(b)
      assert(got == Seq(
        PresenceDiff("r", "u", "join", "a"),
        PresenceDiff("r", "u", "leave", "a"),
        PresenceDiff("r", "u", "join", "b")))
    } finally q.stop()
  }
}
