package graft.rates

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The reference RateCounter as a keyed streaming state machine: per key, a
  * ring of the last `windowTicks` 1-second buckets; every observed tick
  * emits the ring sum, `avg = sum / windowTicks`, and whether the rate
  * limit tripped — including the reference's behavior that the trigger
  * holds until the average falls back under the limit
  * (/root/reference/lib/realtime/rate_counter/rate_counter.ex:25-35,
  * 197-224,259-279). Ticks come from event time (deterministic replay)
  * rather than wall-clock timers.
  *
  * Scale: one state entry per key (a 60-slot ring, ~1 KB); keys hash-spread
  * across executors; each micro-batch touches only keys with new events.
  * Idle-key reaping (the reference's 5-min zero shutdown) maps to state
  * timeouts, opt-in for the same reason documented on
  * [[graft.presence.Presence.diffStream]].
  */
object RateCounterStream {

  final case class Event(key: String, epochSec: Long)

  final case class RateTick(
      key: String, tickSec: Long, sum: Long, avg: Double, triggered: Boolean)

  final case class RingState(
      buckets: Map[Long, Long], // tickSec → count, only last windowTicks kept
      firstTick: Long,          // ring length grows until windowTicks (ref :210-214)
      triggered: Boolean)

  /** @param idleTimeoutMs > 0 enables the opt-in idle reap: a key with no
    *        events for that span has its ring REMOVED via processing-time
    *        timeout — the reference's 5-min zero shutdown
    *        (rate_counter.ex:25,226-234). A returning key restarts from an
    *        empty ring, like the reference's counter restart. Opt-in
    *        because enabling timeouts makes the engine schedule periodic
    *        empty micro-batches (see [[graft.presence.Presence.diffStream]]). */
  def apply(
      events: Dataset[Event],
      limitAvg: Double,
      windowTicks: Int = 60,
      idleTimeoutMs: Long = 0L)(
      implicit spark: SparkSession): Dataset[RateTick] = {
    import spark.implicits._
    val timeoutConf =
      if (idleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[RingState, RateTick](
        OutputMode.Append, timeoutConf) {
        (key: String, evs: Iterator[Event], state: GroupState[RingState]) =>
          if (state.hasTimedOut) {
            state.remove() // idle ring reaped; no emission (all-zero window)
            Iterator.empty
          } else {
          var st = state.getOption
            .getOrElse(RingState(Map.empty, Long.MinValue, triggered = false))
          val out = Seq.newBuilder[RateTick]
          evs.toSeq.sortBy(_.epochSec).groupBy(_.epochSec).toSeq.sortBy(_._1)
            .foreach { case (tick, batch) =>
              val pruned = st.buckets.filter { case (t, _) => t > tick - windowTicks }
              val buckets = pruned.updated(tick, pruned.getOrElse(tick, 0L) + batch.size)
              val first = if (st.firstTick == Long.MinValue) tick else st.firstTick
              // ring length = seconds covered so far, capped at the window
              // (gap seconds count as zero buckets, like the 1 s timer ticks)
              val len = math.min(windowTicks.toLong, tick - first + 1)
              val sum = buckets.values.sum
              val avg = sum.toDouble / len
              // sticky trigger: trips at avg ≥ limit, releases when it falls
              // under (ref maybe_trigger_limit) — same threshold both ways,
              // so the per-tick value reduces to the comparison itself
              val triggered = avg >= limitAvg
              st = RingState(buckets, first, triggered)
              out += RateTick(key, tick, sum, math.rint(avg * 1e6) / 1e6, triggered)
            }
          state.update(st)
          if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
          out.result().iterator
          }
      }
  }
}
