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
    * r_0(v) = 10^6 div N;
    * r_{t+1}(v) = (10^6 − damp) div N +
    *              Σ_{u→v} (damp · r_t(u)) div (10^6 · outdeg(u)).
    *
    * Floor division loses ≤1 micro per term — the standard price for
    * derandomized integer PageRank; dangling mass is dropped (nodes
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
      iters: Int, dampMicros: Long = 850000L): DataFrame = {
    require(iters >= 1 && dampMicros >= 0L && dampMicros <= 1000000L)
    val nodes = edges.select(col(srcCol).as("id"))
      .union(edges.select(col(dstCol).as("id"))).distinct().persist()
    val n = nodes.count()
    // empty graph (e.g. textRank where no bigram reaches minPairCount):
    // an empty (id, rank_micros) frame, not a divide-by-zero
    if (n == 0L)
      return nodes.select(col("id"), lit(0L).as("rank_micros"))
    val base = (1000000L - dampMicros) / n
    val deg = edges.groupBy(col(srcCol).as("_s"))
      .agg(count(lit(1)).as("outdeg"))
    val e = edges.select(col(srcCol).as("_src"), col(dstCol).as("_dst"))
      .join(deg, col("_src") === col("_s"))
      .select(col("_src"), col("_dst"), col("outdeg")).persist()
    var r = nodes.select(col("id"), lit(1000000L / n).as("rank_micros"))
    for (i <- 1 to iters) {
      val contrib = e.join(r, col("_src") === col("id"))
        .select(col("_dst"),
          expr(s"(${dampMicros}L * rank_micros) div (1000000L * outdeg)")
            .as("_c"))
        .groupBy(col("_dst")).agg(sum(col("_c")).as("_sum"))
      r = nodes.join(contrib, col("id") === col("_dst"), "left")
        .select(col("id"),
          (lit(base) + coalesce(col("_sum"), lit(0L))).as("rank_micros"))
      // truncate the lineage each iteration (round-13): without this
      // the final plan nests `iters` join rounds — Catalyst re-plans a
      // doubling tree and the one mega-stage re-derives every earlier
      // iteration's shuffles (text_textrank spent ~3 s of its 4.6 s
      // warm here). localCheckpoint keeps the rank table DISTRIBUTED
      // (unlike a driver collect, which would cap the node set at
      // driver memory — wrong for a 100M-word vocabulary), costs one
      // executor-storage materialization of a (id, long) table per
      // iteration, and is skipped on the last pass so the returned
      // frame still ends in the final join (composable lineage).
      if (i < iters) r = r.localCheckpoint()
    }
    r
  }
}
