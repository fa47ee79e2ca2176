package graft.presence

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The live half of [[Census]]: each node's per-group count GOSSIP as a
  * keyed streaming state machine. [[Census.memberCounts]] is the batch
  * read model (what any reader derives from the stamped broadcasts);
  * this operator PRODUCES those broadcasts from the join stream — one
  * state entry per (node, group), one broadcast row per interval tick
  * between a key's first and latest activity, including unchanged-count
  * gap ticks (the reference gossips on a fixed timer whether or not
  * membership moved — forum/lib/forum/census/scope.ex
  * `:broadcast_counts`), so a reader's freshest-snapshot table has no
  * holes inside a key's active span; past the latest tick the last
  * broadcast simply stays the freshest snapshot, which is what a Census
  * reader uses anyway.
  *
  * Ticks come from event time (deterministic replay, like
  * [[graft.rates.RateCounterStream]]); joins whose ticks are at or
  * before the key's last broadcast fold into the count and show from
  * the NEXT broadcast — exactly a gossiper's behavior for a join that
  * lands while a sync is already in flight. All such late ticks of one
  * invocation fold into a SINGLE next-interval gossip, so the stamp
  * advance is bounded at one interval per micro-batch regardless of how
  * many late ticks arrived. Equality with the batch [[Census]] table
  * therefore assumes per-key in-order arrival (the CDC replay case);
  * under out-of-order input the stream stays count-correct but stamps
  * late joins on the next interval rather than their event tick.
  *
  * Scale: one ~16-byte state entry per (node, group); keys hash-spread
  * across executors; each micro-batch touches only keys with traffic. */
object CensusStream {

  final case class Join(node: String, grp: String, epochSec: Long)

  /** One gossip broadcast: `node`'s count for `grp` as of `tickSec`. */
  final case class Broadcast(node: String, grp: String, tickSec: Long,
      count: Long)

  /** Keyed gossip state (public: the state Encoder's generated code
    * constructs it). */
  final case class St(cum: Long, lastTick: Long)

  def apply(joins: Dataset[Join], intervalSec: Long)(
      implicit spark: SparkSession): Dataset[Broadcast] = {
    import spark.implicits._
    require(intervalSec > 0)
    def ceilTick(s: Long): Long =
      ((s + intervalSec - 1) / intervalSec) * intervalSec
    joins
      .groupByKey(j => (j.node, j.grp))
      .flatMapGroupsWithState[St, Broadcast](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (String, String), evs: Iterator[Join], state: GroupState[St]) =>
          val (node, grp) = key
          var st = state.getOption.getOrElse(St(0L, Long.MinValue))
          val out = Seq.newBuilder[Broadcast]
          val byTick = evs.toSeq.groupBy(j => ceilTick(j.epochSec))
            .toSeq.sortBy(_._1)
          // ALL late ticks of this invocation (at or before the key's
          // last broadcast) fold into ONE next-interval gossip: a sync
          // was already in flight for those ticks, so the joins fold
          // into the count and the NEXT interval's broadcast carries
          // them — emitted NOW (lastTick advances once), because with
          // no wall timer a silent fold would never surface if the key
          // saw no further traffic, permanently under-reporting vs the
          // timer-driven reference gossiper. Folding (rather than one
          // synthetic tick PER late tick-group) bounds the advance to
          // one interval per invocation: repeated out-of-order joins
          // can no longer push broadcast stamps arbitrarily ahead of
          // event time.
          val (late, inOrder) = byTick.partition(_._1 <= st.lastTick)
          if (late.nonEmpty) {
            st = St(st.cum + late.map(_._2.size.toLong).sum,
              st.lastTick + intervalSec)
            out += Broadcast(node, grp, st.lastTick, st.cum)
          }
          inOrder.foreach { case (tick, batch) =>
            if (tick <= st.lastTick) {
              // overtaken by the late fold's single advance: same
              // in-flight rule, one more interval
              st = St(st.cum + batch.size, st.lastTick + intervalSec)
              out += Broadcast(node, grp, st.lastTick, st.cum)
            } else {
              // the timer fired for every interval in between — emit
              // the unchanged-count gossip for the gap ticks
              if (st.lastTick != Long.MinValue) {
                var t = st.lastTick + intervalSec
                while (t < tick) {
                  out += Broadcast(node, grp, t, st.cum)
                  t += intervalSec
                }
              }
              st = St(st.cum + batch.size, tick)
              out += Broadcast(node, grp, tick, st.cum)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }
}
