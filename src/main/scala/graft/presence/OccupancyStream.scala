package graft.presence

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The live half of [[Muster.occupancyMerge]]: occupancy CLAIMS as a
  * keyed streaming state machine. At the reference, occupancy rows are
  * not a batch table — they are `:occupied` / `:vacant_batch` claims
  * arriving at the router over time
  * (/root/reference/forum/lib/forum/muster/scope.ex:326-413), each
  * seq-guarded into the register by `upsert_if_newer` /
  * `tombstone_if_newer` (:228-236). This operator runs the identical
  * guard per (group, node) key in `flatMapGroupsWithState` and emits a
  * register row whenever the key's winner CHANGES — the stream of
  * upserts a downstream read model (occupancy set, router table)
  * consumes.
  *
  * The merge is the same composite-order-key LWW as the batch operator
  * — `(seq, is_tombstone, created_at)`, tombstone winning an equal seq
  * — which makes the register a JOIN-SEMILATTICE: merging is
  * commutative, associative, and idempotent, so the stream's final
  * state equals [[Muster.occupancyMerge]] over the same claims under
  * ANY arrival order and any micro-batch slicing (pinned in
  * OccupancyStreamSpec — a strictly stronger equality than
  * [[CensusStream]]'s, which needs per-key in-order replay because its
  * stamps are time-derived).
  *
  * Scale: one ~32-byte state entry per live (group, node) pair — the
  * same cardinality the reference's ETS register holds on one router,
  * here hash-spread across executors; each micro-batch touches only
  * keys with claims. Tombstone GC stays a batch sweep over the emitted
  * register ([[Muster.tombstoneSweep]]), mirroring the reference's
  * periodic `:sweep_tombstones` tick rather than per-event state.
  */
object OccupancyStream {

  /** One occupied/vacant claim; `createdAt` rides only on vacancies
    * (the tombstone GC stamp — the reference stores `:present` in that
    * slot for occupied rows). */
  final case class Claim(grp: String, node: String, seq: Long,
      present: Boolean, createdAt: Option[Long])

  /** A register update: the key's new winning row. */
  final case class Update(grp: String, node: String, seq: Long,
      present: Boolean, createdAt: Option[Long])

  /** Keyed register state (public: the state Encoder's generated code
    * constructs it). */
  final case class St(seq: Long, present: Boolean, createdAt: Option[Long])

  /** The seq-guard: does candidate `c` overwrite incumbent `i`?
    * Strictly-newer seq always; at EQUAL seq a tombstone overwrites a
    * present row (the reference's `:lt` present guard vs `:lte`
    * tombstone guard), and between two tombstones at equal seq the
    * larger created_at wins (matching the batch operator's struct-max,
    * where null orders lowest) — the total order that makes the
    * register a semilattice. */
  private[presence] def beats(c: St, i: St): Boolean = {
    if (c.seq != i.seq) c.seq > i.seq
    else if (c.present != i.present) !c.present
    else c.createdAt.getOrElse(Long.MinValue) >
      i.createdAt.getOrElse(Long.MinValue)
  }

  def apply(claims: Dataset[Claim])(
      implicit spark: SparkSession): Dataset[Update] = {
    import spark.implicits._
    claims
      .groupByKey(c => (c.grp, c.node))
      .flatMapGroupsWithState[St, Update](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (String, String), evs: Iterator[Claim], state: GroupState[St]) =>
          val (grp, node) = key
          val before = state.getOption
          var st = before.orNull
          evs.foreach { c =>
            // normalize like the batch operator: a present row carries
            // no GC stamp (the reference stores :present in that slot),
            // so a dirty claim's stamp is dropped rather than letting
            // it skew the equal-seq tiebreak
            val cand = St(c.seq, c.present,
              if (c.present) None else c.createdAt)
            if (st == null || beats(cand, st)) st = cand
          }
          if (st != null && !before.contains(st)) {
            state.update(st)
            Iterator.single(Update(grp, node, st.seq, st.present,
              st.createdAt))
          } else Iterator.empty
      }
  }
}
