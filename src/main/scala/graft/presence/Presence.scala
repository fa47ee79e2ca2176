package graft.presence

import graft.model.{PresenceDiff, PresenceEvent}
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Presence: shared per-topic state with join/leave diffs — the Spark
  * re-expression of Phoenix.Tracker's ORSWOT CRDT
  * (/root/reference/lib/realtime_web/channels/presence.ex:8-12, state read
  * /root/reference/lib/realtime_web/channels/realtime_channel/presence_handler.ex:193-200).
  *
  * Spark holds the state in `flatMapGroupsWithState` keyed by topic — a
  * single authoritative partition per topic replaces CRDT merge (Spark's
  * shuffle already gives each key one owner, so there is no multi-writer
  * conflict to resolve; at 1000 executors topics hash-spread evenly).
  * Diffs (joins/leaves) are the emitted rows; full state sync is a
  * `collect_list` over the state store.
  */
object Presence {

  /** Batch view: the final presence state implied by a track/untrack event
    * log — last writer per (topic, key) wins, present iff last action is
    * 'track' (mirrors tracker semantics incl. the `already_tracked` update
    * path, presence_handler.ex:162-170). One shuffle on (topic, key). */
  def latestState(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("topic", "key")
      .orderBy(col("ts").desc, col("meta").desc)
    events
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1 && col("action") === "track")
      .select("topic", "key", "meta", "ts")
  }

  /** Full-state sync shape: {topic → [(key, meta)…]} as one row per topic
    * (the `presence_state` push, presence_handler.ex:28-53). */
  def stateSync(state: DataFrame): DataFrame =
    state.groupBy("topic")
      .agg(sort_array(collect_list(struct(col("key"), col("meta")))).as("presences"))

  /** One tracker's ORSWOT state (observed-remove set without tombstones —
    * the CRDT under Phoenix.Tracker, presence.ex:8-12): `entries` are the
    * live presences, each tagged with its add DOT (origin `replica`, that
    * replica's monotone `clock` at the add); `vv` is the tracker's version
    * vector — the highest clock it has OBSERVED per replica, including
    * clocks whose entries it has since removed. The vv is what lets the
    * merge distinguish "removed" from "never seen" without tombstones. */
  final case class TrackerState(entries: DataFrame, vv: DataFrame)

  /** Build a tracker's state from its OWN event log: the latest `track`
    * per (topic, key) not superseded by an `untrack` survives, dotted at
    * its own `seqCol`; the vv is the max seq ingested (untracks advance
    * it — that is the observed-remove memory). A sync snapshot of a PEER
    * tracker is the same function over the peer's log up to the sync
    * point, merged in with [[mergeTrackers]]. */
  def trackerFromEvents(events: DataFrame, replica: String,
      seqCol: String = "seq"): TrackerState = {
    val w = Window.partitionBy("topic", "key").orderBy(col(seqCol).desc)
    val entries = events
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1 && col("action") === "track")
      .select(col("topic"), col("key"), col("meta"),
        lit(replica).as("replica"), col(seqCol).cast("long").as("clock"))
    val vv = events.agg(max(col(seqCol)).cast("long").as("clock"))
      .where(col("clock").isNotNull) // empty log observed nothing
      .select(lit(replica).as("replica"), col("clock"))
    TrackerState(entries, vv)
  }

  /** ORSWOT join of two trackers' states — the cross-tracker merge the
    * reference performs when Phoenix.Tracker replicas gossip
    * (presence.ex:8-12). Dot identity is (topic, key, replica, clock);
    * meta rides as payload. Per ORSWOT rules an entry survives iff:
    *  - it is in BOTH states (same dot), or
    *  - it is in one state only and the OTHER side has not observed its
    *    dot (clock > that side's vv[replica]) — a new add wins over an
    *    older concurrent remove;
    * an entry present in one side whose dot the other side HAS observed
    * was removed there — observed-remove wins, and it does not
    * resurrect. The merged vv is the pointwise max. Commutative,
    * associative, idempotent (PresenceSpec asserts both orderings
    * converge).
    *
    * Scale shape: the semi/anti joins co-partition both entry sets on
    * the dot — one shuffle each; the vv is replica-count-sized and
    * broadcast. Nothing presence-sized reaches the driver. */
  def mergeTrackers(a: TrackerState, b: TrackerState): TrackerState = {
    val dot = Seq("topic", "key", "replica", "clock")
    val both = a.entries.join(b.entries, dot, "left_semi")
    def unseenOnly(mine: DataFrame, theirs: DataFrame,
        theirVv: DataFrame): DataFrame =
      mine.join(theirs, dot, "left_anti")
        .join(broadcast(theirVv.withColumnRenamed("clock", "_seen")),
          Seq("replica"), "left")
        .where(col("_seen").isNull || col("clock") > col("_seen"))
        .drop("_seen")
    val entries = both
      .unionByName(unseenOnly(a.entries, b.entries, b.vv))
      .unionByName(unseenOnly(b.entries, a.entries, a.vv))
    val vv = a.vv.unionByName(b.vv)
      .groupBy("replica").agg(max("clock").as("clock"))
    TrackerState(entries, vv)
  }

  /** N-replica ORSWOT join — the lattice fold over ANY number of tracker
    * states (Phoenix.Tracker gossip converges every replica to this,
    * presence.ex:8-12). Semantics: a dot survives iff every state that
    * does NOT hold it has also NOT observed it (clock > that state's
    * vv[replica]); the merged vv is the pointwise max. Equal by
    * construction to any fold of pairwise [[mergeTrackers]] in any
    * association/order (PresenceSpec asserts this on randomized logs).
    *
    * Scale shape: ONE shuffle (the groupBy on the dot) no matter how
    * many replicas — a pairwise fold would pay N−1 semi/anti join
    * rounds — and the version vectors stay replica-count-sized and
    * broadcast.
    *
    * PRECONDITION (meta consistency): the owners grouping keys on
    * (topic, key, replica, clock, meta) while pairwise [[mergeTrackers]]
    * matches dots on (topic, key, replica, clock) alone — if two input
    * states carried the SAME dot with DIVERGENT meta, mergeAll would
    * emit both rows where the pairwise fold keeps one. That state is
    * unreachable under the ORSWOT contract this module implements: a
    * dot (replica, clock) names one unique causal event, and every
    * state's copy of it carries the meta written at that event
    * (states here all derive from one event log). PresenceSpec's
    * randomized fold-equality property generates dots under exactly
    * that invariant. */
  def mergeAll(states: Seq[TrackerState]): TrackerState = {
    require(states.nonEmpty, "mergeAll of zero tracker states")
    if (states.sizeIs == 1) states.head
    else {
      val tagged = states.zipWithIndex.map { case (s, i) =>
        s.entries.withColumn("_src", lit(i)) }.reduce(_ unionByName _)
      val vvTagged = states.zipWithIndex.map { case (s, i) =>
        s.vv.withColumn("_src", lit(i)) }.reduce(_ unionByName _)
      // per replica: which state observed up to which clock (N·|replicas|
      // rows — broadcast dimension)
      val vvByReplica = vvTagged.groupBy("replica")
        .agg(collect_list(struct(col("_src").as("src"),
          col("clock").as("seen"))).as("_seen_by"))
      val owners = tagged
        .groupBy("topic", "key", "replica", "clock", "meta")
        .agg(collect_set(col("_src")).as("_owners"))
      val entries = owners.join(broadcast(vvByReplica), Seq("replica"), "left")
        .where(coalesce(
          forall(filter(col("_seen_by"),
              s => !array_contains(col("_owners"), s.getField("src"))),
            s => col("clock") > s.getField("seen")),
          lit(true))) // no state has a vv for this replica ⇒ unobserved
        .select("topic", "key", "meta", "replica", "clock")
      val vv = vvTagged.groupBy("replica").agg(max("clock").as("clock"))
      TrackerState(entries, vv)
    }
  }

  /** One dotted presence entry of a topic snapshot (the in-memory twin of
    * a [[TrackerState]] entries row, minus the topic). */
  final case class Dot(key: String, meta: String, replica: String,
      clock: Long)

  /** In-memory per-topic ORSWOT state: live dotted entries + the version
    * vector. This is the streaming state-store representation — per
    * TOPIC sized, the same granularity [[diffStream]] already holds. */
  final case class Snapshot(entries: Set[Dot], vv: Map[String, Long]) {
    def observed(d: Dot): Boolean = vv.get(d.replica).exists(_ >= d.clock)
  }

  object Snapshot { val empty: Snapshot = Snapshot(Set.empty, Map.empty) }

  /** Pure ORSWOT join of two topic snapshots — the same rules as
    * [[mergeTrackers]] (PresenceSpec proves them pointwise equal on
    * randomized states); runs executor-side inside the streaming state
    * function, where the operands are single-topic-sized. */
  def mergeSnapshots(a: Snapshot, b: Snapshot): Snapshot = {
    val both = a.entries.intersect(b.entries)
    val aOnly = a.entries.diff(b.entries).filterNot(b.observed)
    val bOnly = b.entries.diff(a.entries).filterNot(a.observed)
    val vv = (a.vv.keySet ++ b.vv.keySet).map { r =>
      r -> math.max(a.vv.getOrElse(r, Long.MinValue),
        b.vv.getOrElse(r, Long.MinValue))
    }.toMap
    Snapshot(both ++ aOnly ++ bOnly, vv)
  }

  /** One input op of the replicated streaming tracker: a LOCAL `track`/
    * `untrack` (dotted at `clock` by `replica`), or a `sync` carrying a
    * PEER's full topic snapshot (`syncEntries` + `syncVv`) — the gossip
    * message Phoenix.Tracker replicas exchange. */
  final case class ReplicaOp(topic: String, seq: Long, op: String,
      key: String, meta: String, replica: String, clock: Long,
      syncEntries: Seq[Dot], syncVv: Map[String, Long])

  object ReplicaOp {
    def track(topic: String, seq: Long, key: String, meta: String,
        replica: String, clock: Long): ReplicaOp =
      ReplicaOp(topic, seq, "track", key, meta, replica, clock, Nil, Map.empty)
    def untrack(topic: String, seq: Long, key: String, replica: String,
        clock: Long): ReplicaOp =
      ReplicaOp(topic, seq, "untrack", key, null, replica, clock, Nil, Map.empty)
    def sync(topic: String, seq: Long, entries: Seq[Dot],
        vv: Map[String, Long]): ReplicaOp =
      ReplicaOp(topic, seq, "sync", null, null, null, -1L, entries, vv)
  }

  /** Streaming tracker WITH the replica sync path: local track/untrack
    * ops mutate the topic's ORSWOT state; a `sync` op ORSWOT-merges a
    * late replica's snapshot mid-stream — removed dots emit leaves,
    * new dots emit joins, exactly the diff Phoenix broadcasts after a
    * gossip merge. Multiple presences of one key (one per replica) are
    * distinct dots, as in Phoenix Presence's metas list.
    *
    * The per-topic state is the same single-owner-partition model as
    * [[diffStream]] — Spark's shuffle gives each topic one authoritative
    * state; `sync` is how ANOTHER tracker's view of the same topic folds
    * in, which is the reference's N-replica composition.
    *
    * Deliberately NO idle reap here (unlike [[diffStream]] and the
    * admission twins): the version vector is what makes removals win —
    * reaping an idle topic's ORSWOT state and later receiving a `sync`
    * carrying old dots would RESURRECT every untracked presence the
    * lost vv had observed-removed. State only clears when it is
    * provably empty (no entries, no vv), below. Topic cardinality is
    * tenant-bounded, the same bound as the reference's one Tracker
    * state per topic. */
  def diffStreamSync(ops: Dataset[ReplicaOp])(
      implicit spark: SparkSession): Dataset[PresenceDiff] = {
    import spark.implicits._
    ops
      .groupByKey(_.topic)
      .flatMapGroupsWithState[Snapshot, PresenceDiff](
        OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (topic: String, evs: Iterator[ReplicaOp], state: GroupState[Snapshot]) =>
          var st = state.getOption.getOrElse(Snapshot.empty)
          val out = Seq.newBuilder[PresenceDiff]
          def emit(before: Snapshot, after: Snapshot): Unit = {
            (before.entries -- after.entries).toSeq.sortBy(_.clock).foreach(
              d => out += PresenceDiff(topic, d.key, "leave", d.meta))
            (after.entries -- before.entries).toSeq.sortBy(_.clock).foreach(
              d => out += PresenceDiff(topic, d.key, "join", d.meta))
          }
          evs.toSeq.sortBy(_.seq).foreach { e =>
            e.op match {
              case "track" =>
                // a newer dot from the same (key, replica) supersedes the
                // old one (the already_tracked update path): the old dot
                // is observed-removed, identical meta is a no-op
                val prev = st.entries.find(d =>
                  d.key == e.key && d.replica == e.replica)
                val vv2 = st.vv.updated(e.replica,
                  math.max(st.vv.getOrElse(e.replica, Long.MinValue), e.clock))
                if (!prev.exists(_.meta == e.meta)) {
                  val after = Snapshot(
                    st.entries -- prev + Dot(e.key, e.meta, e.replica, e.clock),
                    vv2)
                  emit(st, after)
                  st = after
                } else st = Snapshot(st.entries, vv2)
              case "untrack" =>
                val gone = st.entries.filter(d =>
                  d.key == e.key && d.replica == e.replica)
                val after = Snapshot(st.entries -- gone,
                  st.vv.updated(e.replica,
                    math.max(st.vv.getOrElse(e.replica, Long.MinValue), e.clock)))
                emit(st, after)
                st = after
              case "sync" =>
                val after = mergeSnapshots(st,
                  Snapshot(e.syncEntries.toSet, e.syncVv))
                emit(st, after)
                st = after
              case _ => ()
            }
          }
          if (st.entries.isEmpty && st.vv.isEmpty) state.remove()
          else state.update(st)
          out.result().iterator
      }
  }

  /** Streaming: per-topic state machine emitting presence_diff rows.
    * State = Map[key → meta]; a track of a new key emits a join, an untrack
    * of a present key emits a leave. A re-track of a LIVE key follows the
    * reference's `already_tracked` path (presence_handler.ex:160-170):
    * unchanged payload is a no-op (`:no_payload_change`), a changed
    * payload becomes a Tracker.update — which Phoenix broadcasts as an
    * update diff carrying the key in BOTH leaves (old meta) and joins
    * (new meta), never as a bare join.
    * With `timeoutMs > 0`, idle topics are reaped via processing-time timeout
    * (the analog of the reference's idle shutdown) — note that enabling it
    * makes the engine schedule periodic empty micro-batches to fire timeouts,
    * so it's opt-in for production streams, off for synchronous tests. */
  def diffStream(
      events: Dataset[PresenceEvent],
      timeoutMs: Long = 0)(
      implicit spark: SparkSession): Dataset[PresenceDiff] = {
    import spark.implicits._
    val timeoutConf =
      if (timeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.topic)
      .flatMapGroupsWithState[Map[String, String], PresenceDiff](
        OutputMode.Append, timeoutConf) {
        (topic: String, evs: Iterator[PresenceEvent],
         state: GroupState[Map[String, String]]) =>
          if (state.hasTimedOut) {
            val leaves = state.getOption.getOrElse(Map.empty).toSeq.map {
              case (k, m) => PresenceDiff(topic, k, "leave", m)
            }
            state.remove()
            leaves.iterator
          } else {
            var st = state.getOption.getOrElse(Map.empty)
            val out = Seq.newBuilder[PresenceDiff]
            evs.toSeq.sortBy(e => (e.ts.getTime, e.meta)).foreach { e =>
              e.action match {
                case "track" =>
                  st.get(e.key) match {
                    case Some(old) if old == e.meta => // :no_payload_change
                    case Some(old) => // already_tracked → update diff
                      out += PresenceDiff(topic, e.key, "leave", old)
                      out += PresenceDiff(topic, e.key, "join", e.meta)
                    case None =>
                      out += PresenceDiff(topic, e.key, "join", e.meta)
                  }
                  st = st.updated(e.key, e.meta)
                case "untrack" =>
                  st.get(e.key).foreach { m =>
                    out += PresenceDiff(topic, e.key, "leave", m)
                  }
                  st = st.removed(e.key)
                case _ => ()
              }
            }
            if (st.isEmpty) state.remove()
            else {
              state.update(st)
              if (timeoutMs > 0) state.setTimeoutDuration(timeoutMs)
            }
            out.result().iterator
          }
      }
  }

  /** Per-socket TRACK admission replay — the `track`/`untrack` arms of
    * `PresenceHandler.handle_presence_event` + `track` +
    * `check_track_payload` (presence_handler.ex:122-193), the
    * wire-visible dedup in front of the tracker:
    *
    *  - a track whose payload is NOT a map is `invalid_payload`
    *    (checked FIRST — and the socket's remembered payload does NOT
    *    update, the error return leaves assigns untouched);
    *  - a track whose payload EQUALS the socket's last applied track
    *    payload is `no_change` — a silent no-op that skips the size
    *    check AND the rate counter entirely (check_track_payload runs
    *    before both), so idempotent client re-tracks cost nothing and
    *    produce no presence_diff churn;
    *  - `untrack` RESETS the memory (`presence_track_payload ← nil`,
    *    :130-134): track(p) → untrack → track(p) re-tracks, the third
    *    event is NOT a no-op;
    *  - an oversize payload (the shared kb·1000+500 formula) is
    *    `payload_too_large`, checked after the dedup, before the rate;
    *  - everything else is `tracked` — the only decision that reaches
    *    the rate counter ([[graft.rates.Rates.presenceRateAdmission]]
    *    models that gate; untrack never consults it).
    *
    * Composition boundary: the rate gate sits BETWEEN the size check
    * and the tracker apply, and a rate-DENIED track does not update
    * the memory either — this replay assumes the gate admits, so when
    * composing with the ring, filter rate-limited tracks out upstream
    * (they are invisible to the dedup, exactly like oversize ones).
    *
    * The memory is expressible as ONE window: each event's memory
    * CONTRIBUTION is its payload for a valid in-size track (a
    * `no_change` track contributes its payload too — it EQUALS the
    * memory, so the fold is unaffected), a reset sentinel for untrack,
    * and null (no update) for invalid/oversize tracks whose error
    * return precedes the assign. `last(_, ignoreNulls)` over the
    * growing [unbounded preceding, -1] frame replays the fold without
    * a sequential iterator — one socket-keyed shuffle, one window
    * pass, PlanAudit-safe (growing frame). The untrack sentinel starts
    * with a space, which no JSON-object payload text can. */
  def trackDedup(events: DataFrame, socketCol: String, tsCol: String,
      tieCol: String, eventCol: String, payloadCol: String,
      payloadIsMapCol: String, payloadBytesCol: String,
      maxPayloadKb: Column): DataFrame = {
    val Reset = " untracked"
    val isTrack = col(eventCol) === "track"
    val oversize = coalesce(col(payloadBytesCol), lit(0L)) >
      maxPayloadKb.cast("long") * 1000L + 500L
    // contribution of THIS event to the running memory (null = no
    // update): invalid and oversize tracks error before the assign
    val contrib = when(col(eventCol) === "untrack", lit(Reset))
      .when(isTrack && col(payloadIsMapCol) && !oversize, col(payloadCol))
    val w = Window.partitionBy(socketCol)
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val mem = last(contrib, ignoreNulls = true).over(w)
    val decision =
      when(col(eventCol) === "untrack", "untracked")
        .when(!col(payloadIsMapCol), "invalid_payload")
        .when(col(payloadCol) <=> nullif(mem, lit(Reset)), "no_change")
        .when(oversize, "payload_too_large")
        .otherwise("tracked")
    events.withColumn("decision", decision)
      .withColumn("rate_counted", col("decision") === "tracked")
  }

  final case class TrackPipeRow(socket: String, us: Long, tie: Long,
      event: String, payload: String, isMap: Boolean, bytes: Long)
  final case class TrackPipeOut(socket: String, tie: Long,
      decision: String)

  /** The per-SOCKET presence message pipeline — `PresenceHandler
    * .handle` composed with its track arms (presence_handler.ex:69-78 +
    * 122-193): `limit_client_presence_event` runs FIRST on EVERY client
    * presence message, so the anchored window is consumed by untracks
    * and by would-be no-op re-tracks alike (a client idempotently
    * re-tracking still burns its 5-per-30s budget — the sharp
    * cross-operator arm this composition exists to pin), and a
    * window-denied message never reaches the dedup: the remembered
    * payload does NOT change under `client_rate_limited`.
    *
    * Window semantics are [[graft.rates.Rates.clientWindowLimit]]'s
    * exactly (anchor at first call or first call strictly past expiry;
    * calls 2..maxCalls pass; beyond denied WITHOUT consuming; expiry
    * resets on contact); dedup arms are [[trackDedup]]'s exactly. The
    * memory here is a plain nullable value — initial nil and
    * untrack-nil coincide, as in the reference's assigns. The
    * tenant-level ring (`limit_presence_event`, between the size check
    * and the apply) composes separately ([[graft.rates.Rates
    * .presenceRateAdmission]]); a `tracked` decision here means the
    * message REACHED that gate.
    *
    * One socket-keyed shuffle, O(1) state (anchor, counter, memory),
    * streaming group iterator. */
  def trackPipeline(events: DataFrame, socketCol: String, tsCol: String,
      tieCol: String, eventCol: String, payloadCol: String,
      isMapCol: String, bytesCol: String, maxPayloadKb: Int,
      maxCalls: Int, windowMs: Long): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val limit = maxPayloadKb.toLong * 1000L + 500L
    val windowUs = windowMs * 1000L
    val typed = events.select(col(socketCol).cast("string").as("socket"),
        unix_micros(col(tsCol)).as("us"),
        col(tieCol).cast("long").as("tie"),
        col(eventCol).cast("string").as("event"),
        col(payloadCol).cast("string").as("payload"),
        col(isMapCol).cast("boolean").as("isMap"),
        col(bytesCol).cast("long").as("bytes"))
      .as[TrackPipeRow]
    typed.groupByKey(_.socket)
      .flatMapSortedGroups($"us", $"tie") { (socket, it) =>
        var resetAt = Long.MinValue
        var counter = 0L
        var mem: Option[String] = None
        it.map { e =>
          val decision =
            if (resetAt != Long.MinValue && e.us <= resetAt &&
                counter >= maxCalls) "client_rate_limited"
            else {
              if (resetAt == Long.MinValue || e.us > resetAt) {
                counter = 1L; resetAt = e.us + windowUs
              } else counter += 1L
              if (e.event == "untrack") { mem = None; "untracked" }
              else if (!e.isMap) "invalid_payload"
              else if (mem.contains(e.payload)) "no_change"
              else if (e.bytes > limit) "payload_too_large"
              else { mem = Some(e.payload); "tracked" }
            }
          TrackPipeOut(socket, e.tie, decision)
        }
      }.toDF("socket", "tie", "decision")
  }

  final case class TrackEvent(socket: String, us: Long, tie: Long,
      event: String, payload: String, isMap: Boolean, bytes: Long)
  final case class TrackDecisionRow(socket: String, tie: Long,
      decision: String, rate_counted: Boolean)
  final case class TrackMemory(payload: Option[String])

  /** Streaming twin of [[trackDedup]] — the LIVE per-socket dedup: the
    * remembered payload is keyed state carried across micro-batches
    * (the reference keeps it in the socket process's assigns), so an
    * idempotent re-track in a LATER batch is still a `no_change` no-op.
    * Decision arms and their order are the batch twin's exactly
    * (spec-pinned parity). `idleTimeoutMs > 0` opts into the idle reap
    * — semantically the socket process dying: the memory resets, and a
    * re-track after the reap applies (exactly as a reconnecting client
    * re-tracks). */
  def trackDedupStream(events: Dataset[TrackEvent], maxPayloadKb: Int,
      idleTimeoutMs: Long = 0L)(
      implicit spark: SparkSession): Dataset[TrackDecisionRow] = {
    import spark.implicits._
    val limit = maxPayloadKb.toLong * 1000L + 500L
    events.groupByKey(_.socket)
      .flatMapGroupsWithState[TrackMemory, TrackDecisionRow](
        OutputMode.Append,
        if (idleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
        else GroupStateTimeout.NoTimeout()) {
        (socket: String, evs: Iterator[TrackEvent],
            state: GroupState[TrackMemory]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var mem = state.getOption.getOrElse(TrackMemory(None)).payload
            val out = Seq.newBuilder[TrackDecisionRow]
            evs.toSeq.sortBy(e => (e.us, e.tie)).foreach { e =>
              val (decision, counted) =
                if (e.event == "untrack") { mem = None; ("untracked", false) }
                else if (!e.isMap) ("invalid_payload", false)
                else if (mem.contains(e.payload)) ("no_change", false)
                else if (e.bytes > limit) ("payload_too_large", false)
                else { mem = Some(e.payload); ("tracked", true) }
              out += TrackDecisionRow(socket, e.tie, decision, counted)
            }
            state.update(TrackMemory(mem))
            if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
            out.result().iterator
          }
      }
  }
}
