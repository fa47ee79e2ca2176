package graft.presence

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Forum.Census — eventually-consistent distributed membership counts —
  * as a batch query semantic.
  *
  * Reference (/root/reference/forum/README.md, forum/lib/forum/census.ex:
  * 92-104, forum/lib/forum/census/scope.ex:12-34): each node holds exact
  * LOCAL membership and broadcasts its per-group counts to every peer on
  * a fixed interval; a read on a node aggregates its local count plus the
  * most recent counts received from each peer, so the view is eventually
  * consistent with staleness bounded by one broadcast interval ("a join
  * is reflected on remote nodes after at most one broadcast interval").
  *
  * Batch model: membership joins are an event table `(node, group, ts)`;
  * broadcasts happen on the interval grid; a read on node N at grid time
  * T sees
  *   - `n_local`  = N's exact joins with `ts <= T` (local reads are
  *     always exact — census.ex:102-104 adds `local_member_count` to the
  *     peer table), and
  *   - `n_remote` = Σ over peers P≠N of P's count as broadcast at
  *     `T - interval` — the freshest snapshot a reader holds at T, since
  *     the snapshot stamped T is still in flight (delivery costs up to
  *     one interval; the README's staleness bound).
  * Joins landing inside `(T - interval, T]` on a peer are exactly the
  * reads' staleness window, which [[graft.presence]]'s spec pins.
  *
  * Scale shape: ONE corpus-sized aggregation (events → per-(node, group,
  * tick) counts); everything after runs on the broadcast grid — nodes ×
  * each group's OWN active tick span plus one convergence tick (not the
  * global horizon: groups are pubsub topics and number in the millions
  * at scale, most touching a sliver of the horizon, so a global-span
  * grid would materialize billions of zero rows) — with windows
  * partitioned by (node, group) and the peer sum keyed by (group,
  * tick). No global window, no driver loop.
  */
object Census {

  /** Eventually-consistent member counts for every (read node, group,
    * broadcast tick) in the events' horizon: `(read_node, read_ts, grp,
    * n_local, n_remote, n_total)`. `intervalSec` is the reference's
    * `broadcast_interval_in_ms` (default 5 s there; pass what the
    * deployment uses). */
  def memberCounts(events: DataFrame, nodeCol: String, groupCol: String,
      tsCol: String, intervalSec: Long): DataFrame = {
    val stepUs = intervalSec * 1000000L
    // an event at ts is first countable at the smallest tick >= ts —
    // pure integer ceiling-division (epoch micros are positive) so the
    // bucketing is exact and byte-portable to the SQL oracle
    val e = events.select(
      col(nodeCol).as("node"), col(groupCol).as("grp"),
      (expr(s"(unix_micros(`$tsCol`) + ${stepUs - 1}) div $stepUs")
        * stepUs).as("tick_us"))
    val hourly = e.groupBy("node", "grp", "tick_us")
      .agg(count(lit(1)).as("c"))
    // dense broadcast grid, bounded to each GROUP's own active span
    // PLUS ONE interval: nodes × Σ_g [min tick of g, max tick of g +
    // interval]. The lag(1) below is only "the previous broadcast" if
    // no tick inside a group's span is missing, and a group's
    // informative ticks are exactly its active span plus the one
    // CONVERGENCE tick after it — at t1 the broadcasts carrying the
    // final interval's joins are still in flight, so the t1+interval
    // read is the first (and last) one where remote readers see them;
    // beyond it every read repeats that converged row. The r11 shape
    // used the GLOBAL [min, max] span for every group, which at census
    // scale — groups are pubsub topics, millions of them, most active
    // for a sliver of the horizon — materializes nodes × groups ×
    // full-horizon ticks (≈72B rows at 1M groups × 100 nodes × 720
    // ticks), almost all zeros; per-group spans collapse that to rows
    // proportional to the events' own spread. The span agg is
    // metadata-sized (one row per group); the tick explode stays
    // broadcastable.
    val spans = e.groupBy("grp")
      .agg(min("tick_us").as("t0"),
        (max("tick_us") + stepUs).as("t1"))
    val gticks = spans.select(col("grp"), explode(
      sequence(col("t0"), col("t1"), lit(stepUs))).as("tick_us"))
    val grid = e.select("node").distinct()
      .crossJoin(broadcast(gticks))
    val byNode = Window.partitionBy("node", "grp").orderBy("tick_us")
    val cums = grid.join(hourly, Seq("node", "grp", "tick_us"), "left")
      .select(col("node"), col("grp"), col("tick_us"),
        coalesce(col("c"), lit(0L)).as("c"))
      .withColumn("cum", sum("c").over(byNode))
      .withColumn("cum_prev", coalesce(lag("cum", 1).over(byNode), lit(0L)))
    // what every node broadcast at the PREVIOUS tick, summed per group —
    // a reader subtracts its own contribution to get the peer sum
    val sPrev = cums.groupBy("grp", "tick_us")
      .agg(sum("cum_prev").as("s_prev"))
    cums.join(sPrev, Seq("grp", "tick_us"))
      .select(col("node").as("read_node"),
        timestamp_micros(col("tick_us")).as("read_ts"),
        col("grp"),
        col("cum").as("n_local"),
        (col("s_prev") - col("cum_prev")).as("n_remote"),
        (col("cum") + col("s_prev") - col("cum_prev")).as("n_total"))
  }
}
