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

  /** Streaming twin of [[Rates.messageRateShutdown]]: the live
    * count-then-check kill path (realtime_channel.ex:291-302). The dead
    * set is ABSORBING state — a socket shut down in one micro-batch
    * stays dead for every later batch, the semantics that make this a
    * keyed-state op rather than a window: no watermark ever retires a
    * death. Ring + dead set carry across batches; same ordering caveat
    * as [[apply]]. Parity with the batch replay is spec-pinned. */
  def shutdownStream(
      messages: Dataset[Attempt],
      limitNum: Long,
      limitDen: Long,
      tickSec: Long = 5L,
      windowTicks: Int = 12)(
      implicit spark: SparkSession): Dataset[Decision] = {
    import spark.implicits._
    messages
      .groupByKey(_.tenant)
      .flatMapGroupsWithState[ShutdownState, Decision](
        OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (tenant: String, evs: Iterator[Attempt], state: GroupState[ShutdownState]) =>
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
              val ring = st.ring.filter { case (t, _) => t >= tick - windowTicks }
              val len = math.min(windowTicks.toLong, tick - first)
              val sum = ring.collect { case (t, c) if t < tick => c }.sum
              val counted = ring.updated(tick, ring.getOrElse(tick, 0L) + 1L)
              if (len > 0 && sum * limitDen >= limitNum * len * tickSec) {
                st = ShutdownState(counted, first, st.dead + m.user)
                out += Decision(tenant, m.tie, "shutdown")
              } else {
                st = ShutdownState(counted, first, st.dead)
                out += Decision(tenant, m.tie, "ok")
              }
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  def apply(
      attempts: Dataset[Attempt],
      maxConcurrent: Int,
      limitNum: Long,
      limitDen: Long,
      tickSec: Long = 5L,
      windowTicks: Int = 12)(
      implicit spark: SparkSession): Dataset[Decision] = {
    import spark.implicits._
    attempts
      .groupByKey(_.tenant)
      .flatMapGroupsWithState[GateState, Decision](
        OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (tenant: String, evs: Iterator[Attempt], state: GroupState[GateState]) =>
          var st = state.getOption
            .getOrElse(GateState(Map.empty, Long.MinValue, Set.empty))
          val out = Seq.newBuilder[Decision]
          evs.toSeq.sortBy(a => (a.epochSec, a.tie)).foreach { a =>
            val overCap = !st.slots.contains(a.user) && st.slots.size >= maxConcurrent
            if (overCap) out += Decision(tenant, a.tie, "too_many_connections")
            else {
              val slots = st.slots + a.user // first attempt claims the slot
              val tick = a.epochSec / tickSec
              val first = if (st.firstTick == Long.MinValue) tick else st.firstTick
              val ring = st.ring.filter { case (t, _) => t >= tick - windowTicks }
              val len = math.min(windowTicks.toLong, tick - first)
              val sum = ring.collect { case (t, c) if t < tick => c }.sum
              if (len > 0 && sum * limitDen >= limitNum * len * tickSec) {
                st = GateState(ring, first, slots)
                out += Decision(tenant, a.tie, "too_many_joins")
              } else {
                st = GateState(ring.updated(tick, ring.getOrElse(tick, 0L) + 1L),
                  first, slots)
                out += Decision(tenant, a.tie, "ok")
              }
            }
          }
          state.update(st)
          out.result().iterator
      }
  }
}
