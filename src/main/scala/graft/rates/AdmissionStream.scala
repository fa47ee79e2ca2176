package graft.rates

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[Rates.joinAdmission]] — the reference's LIVE
  * `check_tenant` gate (tenant_rate_limiters.ex:12-43): connection slots
  * claimed by first-attempt order, then the joins-per-second ring
  * consulted BEFORE counting, admitted joins only
  * (realtime_channel.ex:649-653). Keyed state per tenant carries the
  * O(windowTicks) tick ring plus the claimed-slot user set across
  * micro-batches, so a burst in one batch gates attempts arriving in the
  * next — the cross-batch behavior the batch replay can't show.
  *
  * Slot state is O(users-per-tenant), the same bound as the reference's
  * UsersCounter ETS table; the ring is O(windowTicks). Ticks come from
  * event time (deterministic replay). Same ordering caveat as every
  * keyed-state op here: per-tenant FIFO arrival across batches (within a
  * batch attempts sort by (epochSec, tie)); a cross-batch out-of-order
  * attempt would consult the newer ring.
  *
  * Decision parity with the batch twin on an identically-ordered log is
  * spec-pinned (AdmissionStreamSpec). */
object AdmissionStream {

  final case class Attempt(tenant: String, user: Long, epochSec: Long, tie: Long)

  final case class Decision(tenant: String, tie: Long, status: String)

  final case class GateState(
      ring: Map[Long, Long],   // tick → admitted joins, last windowTicks kept
      firstTick: Long,         // counter creation (first eligible attempt)
      slots: Set[Long])        // users holding connection slots, first-N

  final case class ShutdownState(
      ring: Map[Long, Long],   // tick → counted deliveries
      firstTick: Long,
      dead: Set[Long])         // terminally shut-down sockets

  /** A timestamped batch with its message count (`us` = event-time µs). */
  final case class SizedAttempt(tenant: String, us: Long, tie: Long, n: Long)

  /** A timestamped call on a composite key (`us` = event-time µs). */
  final case class Call(key: String, us: Long, tie: Long)

  final case class RingState(ring: Map[Long, Long], firstTick: Long)

  final case class WindowState(resetAt: Long, counter: Long)

  /** The shared ring-window arithmetic every gate kernel — streaming
    * twin AND batch replay — performs per event: prune buckets older
    * than the window, resolve the counter-creation tick, and read
    * length (completed ticks since creation, capped at the window) and
    * sum (completed-tick counts only, `t < tick`). One copy, so the
    * twins cannot drift. */
  private[rates] final case class RingView(
      ring: Map[Long, Long], first: Long, len: Long, sum: Long)

  private[rates] def ringView(ring: Map[Long, Long], firstTick: Long, tick: Long,
      windowTicks: Int): RingView = {
    val first = if (firstTick == Long.MinValue) tick else firstTick
    val pruned = ring.filter { case (t, _) => t >= tick - windowTicks }
    val len = math.min(windowTicks.toLong, tick - first)
    val sum = pruned.collect { case (t, c) if t < tick => c }.sum
    RingView(pruned, first, len, sum)
  }

  /** Streaming twin of [[Rates.batchAdmission]] — the LIVE
    * `check_rate_limit` gate (batch_broadcast.ex:58-59,170-184): the two
    * 429 modes in reference cond order (`avg > max` → rate_limited,
    * `size + avg > max` → batch_too_large), admitted batches counting
    * every message (batch-WEIGHTED admitted-only ring). The ring carries
    * across micro-batches, so an admitted burst in one batch can push a
    * later batch's avg over either check — the cross-batch feedback the
    * batch replay can't show. Arithmetic is the batch twin's exact
    * integer form (`sum·den > num·L`, `n·L·den + sum·den > num·L` with
    * L = max(len,1)·tick), so parity is bit-identical (spec-pinned).
    *
    * `idleTimeoutMs > 0` opts into the idle reap: a pure rate counter, so
    * a reaped tenant's state is REMOVED outright — recreation on next
    * contact is a fresh counter (creation tick admits), the reference's
    * idle-RateCounter shutdown-and-recreate. */
  def batchStream(
      batches: Dataset[SizedAttempt],
      limitNum: Long,
      limitDen: Long,
      tickSec: Long = 5L,
      windowTicks: Int = 12,
      idleTimeoutMs: Long = 0L)(
      implicit spark: SparkSession): Dataset[Decision] = {
    import spark.implicits._
    batches
      .groupByKey(_.tenant)
      .flatMapGroupsWithState[RingState, Decision](
        OutputMode.Append,
        if (idleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
        else GroupStateTimeout.NoTimeout()) {
        (tenant: String, evs: Iterator[SizedAttempt], state: GroupState[RingState]) =>
          if (state.hasTimedOut) {
            state.remove() // idle counter shut down; next contact recreates
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(RingState(Map.empty, Long.MinValue))
            val out = Seq.newBuilder[Decision]
            evs.toSeq.sortBy(b => (b.us, b.tie)).foreach { b =>
              val tick = b.us / 1000000L / tickSec
              val v = ringView(st.ring, st.firstTick, tick, windowTicks)
              val l = math.max(v.len, 1L) * tickSec
              if (v.sum * limitDen > limitNum * l) {
                st = RingState(v.ring, v.first)
                out += Decision(tenant, b.tie, "rate_limited")
              } else if (b.n * l * limitDen + v.sum * limitDen > limitNum * l) {
                st = RingState(v.ring, v.first)
                out += Decision(tenant, b.tie, "batch_too_large")
              } else {
                st = RingState(
                  v.ring.updated(tick, v.ring.getOrElse(tick, 0L) + b.n), v.first)
                out += Decision(tenant, b.tie, "ok")
              }
            }
            state.update(st)
            if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
            out.result().iterator
          }
      }
  }

  final case class PollAttempt(tenant: String, us: Long, tie: Long,
      n: Long, weight: Long)

  /** Streaming twin of [[Rates.pollShed]] — the LIVE poller shed:
    * whole-poll drop under the triggered flag (`>=` on the
    * tick-snapshot avg), fan-out-WEIGHTED counting of delivered polls,
    * empty polls never shed; the ring carries across micro-batches so
    * a heavy poll in one batch sheds the next batch's polls. Arithmetic
    * is the batch twin's exactly (spec-pinned parity). */
  def pollShedStream(
      polls: Dataset[PollAttempt],
      limitNum: Long,
      limitDen: Long,
      tickSec: Long = 5L,
      windowTicks: Int = 12,
      idleTimeoutMs: Long = 0L)(
      implicit spark: SparkSession): Dataset[Decision] = {
    import spark.implicits._
    polls
      .groupByKey(_.tenant)
      .flatMapGroupsWithState[RingState, Decision](
        OutputMode.Append,
        if (idleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
        else GroupStateTimeout.NoTimeout()) {
        (tenant: String, evs: Iterator[PollAttempt],
            state: GroupState[RingState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(
              RingState(Map.empty, Long.MinValue))
            val out = Seq.newBuilder[Decision]
            evs.toSeq.sortBy(p => (p.us, p.tie)).foreach { p =>
              val tick = p.us / 1000000L / tickSec
              val v = ringView(st.ring, st.firstTick, tick, windowTicks)
              val l = math.max(v.len, 1L) * tickSec
              if (v.sum * limitDen >= limitNum * l) {
                st = RingState(v.ring, v.first)
                out += Decision(tenant, p.tie,
                  if (p.n > 0) "shed" else "ok")
              } else {
                st = RingState(
                  v.ring.updated(tick, v.ring.getOrElse(tick, 0L) + p.weight),
                  v.first)
                out += Decision(tenant, p.tie, "ok")
              }
            }
            state.update(st)
            if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
            out.result().iterator
          }
      }
  }

  final case class SingleAttempt(tenant: String, us: Long, tie: Long,
      suspend: Boolean, valid: Boolean, writeAllowed: Boolean)

  /** Streaming twin of [[Rates.singleAdmission]] — the LIVE
    * single-broadcast gate chain (single_broadcast.ex:64-82) in the
    * reference's clause order: suspension, changeset validity, the
    * `avg >= max` rate gate (the endpoint's `>=`, not batch's `>`),
    * write authorization, then unit counting for `ok` only. The
    * row-local booleans arrive pre-computed exactly as in the batch
    * replay (the policy probe and changeset are stateless projections —
    * they belong on the ingest frame, not in keyed state); the ring is
    * the shared [[ringView]], so twin parity is bit-identical
    * (spec-pinned). Every request advances the counter clock; only
    * admitted ones count.
    *
    * `idleTimeoutMs > 0` opts into the idle reap, with the same
    * fresh-counter-on-recreation semantics as [[batchStream]]. */
  def singleStream(
      requests: Dataset[SingleAttempt],
      limitNum: Long,
      limitDen: Long,
      tickSec: Long = 5L,
      windowTicks: Int = 12,
      idleTimeoutMs: Long = 0L)(
      implicit spark: SparkSession): Dataset[Decision] = {
    import spark.implicits._
    requests
      .groupByKey(_.tenant)
      .flatMapGroupsWithState[RingState, Decision](
        OutputMode.Append,
        if (idleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
        else GroupStateTimeout.NoTimeout()) {
        (tenant: String, evs: Iterator[SingleAttempt],
            state: GroupState[RingState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(
              RingState(Map.empty, Long.MinValue))
            val out = Seq.newBuilder[Decision]
            evs.toSeq.sortBy(r => (r.us, r.tie)).foreach { r =>
              val tick = r.us / 1000000L / tickSec
              val v = ringView(st.ring, st.firstTick, tick, windowTicks)
              val l = math.max(v.len, 1L) * tickSec
              if (r.suspend) {
                st = RingState(v.ring, v.first)
                out += Decision(tenant, r.tie, "forbidden_suspended")
              } else if (!r.valid) {
                st = RingState(v.ring, v.first)
                out += Decision(tenant, r.tie, "invalid")
              } else if (v.sum * limitDen >= limitNum * l) {
                st = RingState(v.ring, v.first)
                out += Decision(tenant, r.tie, "rate_limited")
              } else if (!r.writeAllowed) {
                st = RingState(v.ring, v.first)
                out += Decision(tenant, r.tie, "forbidden")
              } else {
                st = RingState(
                  v.ring.updated(tick, v.ring.getOrElse(tick, 0L) + 1L),
                  v.first)
                out += Decision(tenant, r.tie, "ok")
              }
            }
            state.update(st)
            if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
            out.result().iterator
          }
      }
  }

  /** Streaming twin of [[Rates.clientWindowLimit]] — the LIVE
    * `limit_client_presence_event` anchored window
    * (presence_handler.ex:214-236). State is two scalars per key (anchor
    * expiry + counter): calls 2..maxCalls inside the anchored window
    * pass, calls beyond are denied WITHOUT consuming, an expired window
    * resets on contact. The anchor CHAIN crosses micro-batch boundaries
    * — a window opened in one batch still gates calls arriving in the
    * next, and a boundary-exact call (`us == resetAt`) stays inside the
    * window (strict `>` reset, the batch twin's boundary).
    *
    * `idleTimeoutMs > 0` opts into the idle reap — ESSENTIAL here at
    * scale: the key space is per-CLIENT (unbounded cardinality, unlike
    * the tenant-keyed ring gates). An absent state and an expired window
    * decide identically (both re-anchor fresh on contact), so with
    * `idleTimeoutMs > windowMs` the reap is decision-invariant whenever
    * processing time keeps pace with event time — STRICTLY greater: a
    * boundary-exact call (`us == resetAt`) is still INSIDE a kept window
    * but would re-anchor against reaped state, so an idle timeout equal
    * to the window can flip exactly that call. The reference's limiter
    * state lives in the (wall-clock-reaped) socket process anyway. */
  def clientWindowStream(
      calls: Dataset[Call],
      maxCalls: Int,
      windowMs: Long,
      idleTimeoutMs: Long = 0L)(
      implicit spark: SparkSession): Dataset[Decision] = {
    import spark.implicits._
    val windowUs = windowMs * 1000L
    calls
      .groupByKey(_.key)
      .flatMapGroupsWithState[WindowState, Decision](
        OutputMode.Append,
        if (idleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
        else GroupStateTimeout.NoTimeout()) {
        (key: String, evs: Iterator[Call], state: GroupState[WindowState]) =>
          if (state.hasTimedOut) {
            state.remove() // idle client reaped; next contact re-anchors
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(WindowState(Long.MinValue, 0L))
            val out = Seq.newBuilder[Decision]
            evs.toSeq.sortBy(c => (c.us, c.tie)).foreach { c =>
              val status =
                if (st.resetAt == Long.MinValue || c.us > st.resetAt) {
                  st = WindowState(c.us + windowUs, 1L); "ok"
                } else if (st.counter >= maxCalls) "rate_limited"
                else { st = st.copy(counter = st.counter + 1L); "ok" }
              out += Decision(key, c.tie, status)
            }
            state.update(st)
            if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
            out.result().iterator
          }
      }
  }

  /** Streaming twin of [[Rates.presenceRateAdmission]] — the LIVE
    * `limit_presence_event` gate (presence_handler.ex:201-212):
    * check-before-count with admitted-only increments, but STRICT
    * `avg > max` (a window sitting exactly AT the limit still admits —
    * the boundary the batch spec pins against the joins gate's `>=`).
    * Ring carries across micro-batches; parity spec-pinned.
    *
    * `idleTimeoutMs > 0` opts into the idle reap (pure rate counter ⇒
    * full removal, fresh counter on next contact — see [[batchStream]]). */
  def presenceRateStream(
      ops: Dataset[Call],
      limitNum: Long,
      limitDen: Long,
      tickSec: Long = 5L,
      windowTicks: Int = 12,
      idleTimeoutMs: Long = 0L)(
      implicit spark: SparkSession): Dataset[Decision] = {
    import spark.implicits._
    ops
      .groupByKey(_.key)
      .flatMapGroupsWithState[RingState, Decision](
        OutputMode.Append,
        if (idleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
        else GroupStateTimeout.NoTimeout()) {
        (tenant: String, evs: Iterator[Call], state: GroupState[RingState]) =>
          if (state.hasTimedOut) {
            state.remove() // idle counter shut down; next contact recreates
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(RingState(Map.empty, Long.MinValue))
            val out = Seq.newBuilder[Decision]
            evs.toSeq.sortBy(a => (a.us, a.tie)).foreach { a =>
              val tick = a.us / 1000000L / tickSec
              val v = ringView(st.ring, st.firstTick, tick, windowTicks)
              if (v.len > 0 && v.sum * limitDen > limitNum * v.len * tickSec) {
                st = RingState(v.ring, v.first)
                out += Decision(tenant, a.tie, "rate_limited")
              } else {
                st = RingState(
                  v.ring.updated(tick, v.ring.getOrElse(tick, 0L) + 1L), v.first)
                out += Decision(tenant, a.tie, "ok")
              }
            }
            state.update(st)
            if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
            out.result().iterator
          }
      }
  }

  /** Streaming twin of [[Rates.messageRateShutdown]]: the live
    * count-then-check kill path (realtime_channel.ex:291-302). The dead
    * set is ABSORBING state — a socket shut down in one micro-batch
    * stays dead for every later batch, the semantics that make this a
    * keyed-state op rather than a window: no watermark ever retires a
    * death. Ring + dead set carry across batches; same ordering caveat
    * as [[apply]]. Parity with the batch replay is spec-pinned.
    *
    * `idleTimeoutMs > 0` opts into the idle reap ([[RateCounterStream]]'s
    * contract, the reference's wall-clock idle-counter sweep): an idle
    * tenant's RING is dropped — a reaped window is all-zero anyway — but
    * the dead set survives (deaths are terminal, never rate state), so
    * reaped state shrinks to the O(dead-sockets) bound. */
  def shutdownStream(
      messages: Dataset[Attempt],
      limitNum: Long,
      limitDen: Long,
      tickSec: Long = 5L,
      windowTicks: Int = 12,
      idleTimeoutMs: Long = 0L)(
      implicit spark: SparkSession): Dataset[Decision] = {
    import spark.implicits._
    messages
      .groupByKey(_.tenant)
      .flatMapGroupsWithState[ShutdownState, Decision](
        OutputMode.Append,
        if (idleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
        else GroupStateTimeout.NoTimeout()) {
        (tenant: String, evs: Iterator[Attempt], state: GroupState[ShutdownState]) =>
          if (state.hasTimedOut) {
            // idle reap: ring drops (all-zero window), dead set survives
            val kept = state.get.dead
            if (kept.isEmpty) state.remove()
            else state.update(ShutdownState(Map.empty, Long.MinValue, kept))
            Iterator.empty
          } else {
            var st = state.getOption
              .getOrElse(ShutdownState(Map.empty, Long.MinValue, Set.empty))
            val out = Seq.newBuilder[Decision]
            evs.toSeq.sortBy(a => (a.epochSec, a.tie)).foreach { m =>
              val tick = m.epochSec / tickSec
              val first = if (st.firstTick == Long.MinValue) tick else st.firstTick
              if (st.dead.contains(m.user)) {
                st = st.copy(firstTick = first)
                out += Decision(tenant, m.tie, "dropped")
              } else {
                val v = ringView(st.ring, st.firstTick, tick, windowTicks)
                val counted =
                  v.ring.updated(tick, v.ring.getOrElse(tick, 0L) + 1L)
                if (v.len > 0 && v.sum * limitDen >= limitNum * v.len * tickSec) {
                  st = ShutdownState(counted, v.first, st.dead + m.user)
                  out += Decision(tenant, m.tie, "shutdown")
                } else {
                  st = ShutdownState(counted, v.first, st.dead)
                  out += Decision(tenant, m.tie, "ok")
                }
              }
            }
            state.update(st)
            if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
            out.result().iterator
          }
      }
  }

  /** `idleTimeoutMs > 0` opts into the idle reap: the joins RING is
    * dropped (idle RateCounter shutdown; recreation on next contact is a
    * fresh counter), but the SLOT set survives — connection slots are
    * UsersCounter state, held while sockets stay connected, never
    * rate-counter state — so reaped state shrinks to the
    * O(users-per-tenant) bound. */
  def apply(
      attempts: Dataset[Attempt],
      maxConcurrent: Int,
      limitNum: Long,
      limitDen: Long,
      tickSec: Long = 5L,
      windowTicks: Int = 12,
      idleTimeoutMs: Long = 0L)(
      implicit spark: SparkSession): Dataset[Decision] = {
    import spark.implicits._
    attempts
      .groupByKey(_.tenant)
      .flatMapGroupsWithState[GateState, Decision](
        OutputMode.Append,
        if (idleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
        else GroupStateTimeout.NoTimeout()) {
        (tenant: String, evs: Iterator[Attempt], state: GroupState[GateState]) =>
          if (state.hasTimedOut) {
            // idle reap: ring drops, claimed slots survive (UsersCounter
            // state — sockets are still connected while the tenant idles)
            val kept = state.get.slots
            if (kept.isEmpty) state.remove()
            else state.update(GateState(Map.empty, Long.MinValue, kept))
            Iterator.empty
          } else {
            var st = state.getOption
              .getOrElse(GateState(Map.empty, Long.MinValue, Set.empty))
            val out = Seq.newBuilder[Decision]
            evs.toSeq.sortBy(a => (a.epochSec, a.tie)).foreach { a =>
              val overCap = !st.slots.contains(a.user) && st.slots.size >= maxConcurrent
              if (overCap) out += Decision(tenant, a.tie, "too_many_connections")
              else {
                val slots = st.slots + a.user // first attempt claims the slot
                val tick = a.epochSec / tickSec
                val v = ringView(st.ring, st.firstTick, tick, windowTicks)
                if (v.len > 0 && v.sum * limitDen >= limitNum * v.len * tickSec) {
                  st = GateState(v.ring, v.first, slots)
                  out += Decision(tenant, a.tie, "too_many_joins")
                } else {
                  st = GateState(
                    v.ring.updated(tick, v.ring.getOrElse(tick, 0L) + 1L),
                    v.first, slots)
                  out += Decision(tenant, a.tie, "ok")
                }
              }
            }
            state.update(st)
            if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
            out.result().iterator
          }
      }
  }
}
