package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge lists the pipeline already produces (kNN
  * graphs, near-dup pair sets): centrality scores for picking
  * representative documents out of similarity clusters.
  *
  * All rank arithmetic is EXACT integer micros — damping, the uniform
  * base term, and every per-edge contribution use integral floor
  * division, so a fixed iteration count yields bit-identical ranks on
  * any engine and any partitioning (no float accumulation anywhere). */
object Graph {

  /** PageRank with a fixed iteration count over a directed edge list.
    *
    * Ranks are PER-NODE micros — the stationary mass scaled by N·10^6,
    * so the uniform rank is 10^6 regardless of graph size:
    *
    * r_0(v) = 10^6;
    * r_{t+1}(v) = (10^6 − damp) +
    *              Σ_{u→v} floor₂(damp · r_t(u) / (10^6 · outdeg(u))),
    * where floor₂ is the overflow-safe two-term evaluation below.
    *
    * Why per-node units (GraphProbe, r16): the earlier TOTAL-mass law
    * (`r_0 = 10^6 div N`, base `(10^6 − damp) div N`) floors the base
    * term to ZERO for N > 150 000 and the initial rank to zero for
    * N > 10^6 — at 10M edges every rank collapsed to 0 (the probe's
    * `rank_sum` checksum caught it). Per-node units keep full micro
    * resolution at ANY graph size; relative order and ratios are the
    * same mathematical PageRank (the measure is scale-invariant).
    *
    * Overflow bound: the per-edge contribution is evaluated as
    * `damp·(r div (10^6·outdeg)) + (damp·((r mod (10^6·outdeg)) div
    * outdeg)) div 10^6` — every intermediate stays under damp·N·10^6 ≈
    * 8.5×10^5·N, safe in a signed 64-bit long to N ≈ 10^13 nodes
    * (the naive `damp·r` product overflows as soon as one node holds
    * ~10^7 average nodes' worth of mass). Floor composition loses ≤2
    * micros per term vs ≤1 for the naive order — the same
    * derandomization price class; dangling mass is dropped (nodes
    * here always have out-edges when fed a kNN edge list).
    *
    * Scale shape: the classic Pregel loop as relational ops — per
    * iteration ONE join of ranks to edges (both shuffled on the node
    * id; co-partitioned after the first exchange) and one partial-agg
    * groupBy on dst. Edges+outdeg are computed once and persisted;
    * ranks stay distributed (nothing driver-sized). The plan chain is
    * linear in `iters` — for iteration counts beyond ~20, checkpoint
    * every few rounds to cut lineage. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, dampMicros: Long = 850000L,
      prePartition: Boolean = true,
      checkpointEvery: Int = 1): DataFrame = {
    require(checkpointEvery >= 1, "checkpointEvery must be >= 1")
    require(iters >= 1 && dampMicros >= 0L && dampMicros <= 1000000L)
    // cache the node set HASH-PARTITIONED on id (r16 optimization, guide
    // §2.4 — share one exchange): every iteration's reintroduction join
    // (`nodes ⟕ contrib`) reads `nodes` from the cache with its
    // partitioning already satisfied, so only the contrib side exchanges;
    // unpartitioned, the cached scan partitioning forced a nodes shuffle
    // per iteration. The repartition carries an explicit count (the
    // Spread rationale: a column-only exchange is AQE-coalescible).
    val shufflePartitions =
      edges.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val nodes = edges.select(col(srcCol).as("id"))
      .union(edges.select(col(dstCol).as("id"))).distinct()
      .repartition(shufflePartitions, col("id")).persist()
    val n = nodes.count()
    // empty graph (e.g. textRank where no bigram reaches minPairCount):
    // an empty (id, rank_micros) frame, not a divide-by-zero
    if (n == 0L)
      return nodes.select(col("id"), lit(0L).as("rank_micros"))
    val base = 1000000L - dampMicros
    val deg = edges.groupBy(col(srcCol).as("_s"))
      .agg(count(lit(1)).as("outdeg"))
    // prePartition: cache the edge table HASH-PARTITIONED on _src so
    // every iteration's rank join satisfies its distribution from the
    // cache and only the (smaller) rank side shuffles. When the
    // deg join runs as SMJ the output is already _src-partitioned and
    // the explicit exchange is redundant — but when deg BROADCASTS
    // (small graphs, or a cluster raising the broadcast threshold) the
    // cached table inherits the scan's partitioning and every
    // iteration re-shuffles ALL EDGES; one build-time exchange pins
    // the invariant either way. Default ON — GraphProbe A/B: 12.5 →
    // 8.2 s at 1M edges ×10 iters, 18.6 → 15.4 s at 10M (the delta is
    // the per-iteration edge shuffle the cache partitioning elides).
    val e0 = edges.select(col(srcCol).as("_src"), col(dstCol).as("_dst"))
      .join(deg, col("_src") === col("_s"))
      .select(col("_src"), col("_dst"), col("outdeg"))
    val e = (if (prePartition) e0.repartition(col("_src")) else e0)
      .persist()
    var r = nodes.select(col("id"), lit(1000000L).as("rank_micros"))
    for (i <- 1 to iters) {
      val contrib = e.join(r, col("_src") === col("id"))
        .select(col("_dst"),
          expr(s"${dampMicros}L * (rank_micros div (1000000L * outdeg))" +
            s" + (${dampMicros}L * ((rank_micros % (1000000L * outdeg))" +
            " div outdeg)) div 1000000L")
            .as("_c"))
        .groupBy(col("_dst")).agg(sum(col("_c")).as("_sum"))
      r = nodes.join(contrib, col("id") === col("_dst"), "left")
        .select(col("id"),
          (lit(base) + coalesce(col("_sum"), lit(0L))).as("rank_micros"))
      // truncate the lineage every `checkpointEvery` iterations
      // (round-13 introduced the per-iteration reset): without any reset
      // the final plan nests `iters` join rounds — Catalyst re-plans a
      // doubling tree and the one mega-stage re-derives every earlier
      // iteration's shuffles (text_textrank spent ~3 s of its 4.6 s
      // warm here). r16 measured stride 1 vs 2 interleaved at sf0.1/32
      // (4 reps each): 2.35 vs 2.38 s min — indistinguishable, so the
      // default stays 1 (the r13 shape) and the stride is a caller knob
      // for iteration counts ≫ 5 where the materialization jobs
      // dominate. localCheckpoint keeps the rank table DISTRIBUTED (a
      // driver collect would cap the node set at driver memory — wrong
      // for a 100M-word vocabulary); the reset is skipped on the last
      // pass so the returned frame still ends in the final join
      // (composable lineage).
      if (i < iters && i % checkpointEvery == 0) r = r.localCheckpoint()
    }
    r
  }
}
