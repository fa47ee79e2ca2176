package graft.presence

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The live half of [[Muster.claimDebounce]]: the shard claim state
  * machine as a keyed stream over membership deltas, with the vacancy
  * cooldown as a real EVENT-TIME TIMER
  * (forum/lib/forum/muster/shard.ex:312-334 `enter_cooldown`, :470-505
  * the `:cooldown` reclaim branch, :637-651 `handle_vacancy_expired`).
  * Per (group, node) key:
  *
  *  - a join that takes the member count 0→1 with NO pending vacancy
  *    emits `occupied` (the nil / post-vacant reclaim branches — the
  *    router must learn);
  *  - the LAST member leaving arms a pending vacancy (cooldown) but
  *    emits NOTHING;
  *  - a re-join while the vacancy is pending cancels it silently — the
  *    reference's `:cooldown` reclaim, claim churn the router never
  *    sees;
  *  - a vacancy that survives `cooldownMs` emits `vacant`, stamped at
  *    the EXPIRY instant, driven by whichever comes first: the key's
  *    next event (event-driven expiry inside a batch) or the event-time
  *    timeout when the watermark passes the expiry (the idle-key case a
  *    batch-end flush would get wrong — more events may still come).
  *
  * Determinism contract (same class as [[CensusStream]]): the machine
  * is order-sensitive, so events are sorted `(ts, delta)` within each
  * micro-batch invocation and equality with the batch operator assumes
  * per-key event-time-ordered arrival across batches (the CDC replay
  * case) — under ANY batch slicing of an in-order feed that never
  * splits an event-time tie across batches the output equals
  * [[Muster.claimDebounce]] over the same events (pinned in
  * ClaimStreamSpec, including the timer leg via watermark advance).
  * The tie caveat is the engine's, not this operator's: with event-time
  * timeouts Spark drops input rows AT or before the current watermark
  * (`numRowsDroppedByWatermark`), so a row equal to the previous
  * batch's max event time never reaches the machine. Input must be
  * well-formed (every leave matches a live member), like the
  * reference's monitored membership guarantees.
  *
  * Scale: one ~24-byte state entry per (group, node) key with at most
  * one armed timer each — the reference's `cooldown_timers` map,
  * hash-spread across executors. */
object ClaimStream {

  /** One membership delta: `delta` +1 (join) / -1 (leave) at event
    * time `ts`. */
  final case class Event(grp: String, node: String,
      ts: java.sql.Timestamp, delta: Int)

  /** One router-visible claim: `claim` ∈ {occupied, vacant} effective
    * at `emitMs` (a survived vacancy is stamped at its expiry). */
  final case class Emit(grp: String, node: String, claim: String,
      emitMs: Long)

  /** Keyed claim state (public: the state Encoder's generated code
    * constructs it): live member count, what the router believes, and
    * the pending-vacancy arm time (the cooldown timer). */
  final case class St(cnt: Long, routerOccupied: Boolean,
      pendingVacMs: Option[Long])

  def apply(events: Dataset[Event], cooldownMs: Long,
      watermarkDelay: String = "0 seconds")(
      implicit spark: SparkSession): Dataset[Emit] = {
    import spark.implicits._
    require(cooldownMs > 0, "cooldownMs must be positive")
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(e => (e.grp, e.node))
      .flatMapGroupsWithState[St, Emit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (String, String), evs: Iterator[Event], state: GroupState[St]) =>
          val (grp, node) = key
          val out = Seq.newBuilder[Emit]
          var st = state.getOption.getOrElse(St(0L, false, None))
          def expirePending(): Unit = st.pendingVacMs.foreach { pv =>
            out += Emit(grp, node, "vacant", pv + cooldownMs)
            st = st.copy(routerOccupied = false, pendingVacMs = None)
          }
          if (state.hasTimedOut) {
            // the watermark passed the pending expiry with no events —
            // the reference's `{:vacancy_expired, group}` message
            expirePending()
          } else {
            // order-sensitive machine: sort within the invocation;
            // leave-before-join at an equal instant matches the batch
            // operator's (ts, delta) order
            evs.toSeq.sortBy(e => (e.ts.getTime, e.delta)).foreach { e =>
              val tsMs = e.ts.getTime
              // event-driven expiry: the timer fired strictly before
              // this event (a re-join exactly AT expiry counts as after
              // it — vacant emitted, occupied re-emitted)
              st.pendingVacMs.foreach { pv =>
                if (tsMs - pv >= cooldownMs) expirePending()
              }
              if (e.delta > 0) {
                st = st.copy(cnt = st.cnt + 1)
                if (st.cnt == 1L) {
                  if (st.pendingVacMs.isDefined)
                    // :cooldown reclaim — cancel the timer, NO router
                    // traffic (the router still believes occupied)
                    st = st.copy(pendingVacMs = None)
                  else if (!st.routerOccupied) {
                    out += Emit(grp, node, "occupied", tsMs)
                    st = st.copy(routerOccupied = true)
                  }
                }
              } else {
                st = st.copy(cnt = st.cnt - 1)
                if (st.cnt == 0L) st = st.copy(pendingVacMs = Some(tsMs))
              }
            }
          }
          // a pending vacancy whose expiry the CURRENT watermark has
          // already passed can never get a timer (timers must sit in
          // the watermark's future) — flush it now
          st.pendingVacMs.foreach { pv =>
            if (state.getCurrentWatermarkMs() >= pv + cooldownMs)
              expirePending()
          }
          state.update(st)
          st.pendingVacMs.foreach(pv =>
            state.setTimeoutTimestamp(pv + cooldownMs))
          out.result().iterator
      }
  }
}
