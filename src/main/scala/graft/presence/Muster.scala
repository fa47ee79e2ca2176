package graft.presence

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Forum.Muster — group-routed fan-out — as a batch query semantic: for
  * every group, WHICH nodes hold local members (the occupancy set a
  * broadcast must reach) and WHICH single node is the group's router.
  *
  * Reference (/root/reference/forum/README.md "The router node";
  * forum/lib/forum/muster.ex): the router is chosen by consistent
  * hashing over the cluster's member-node list (128 vnodes per node),
  * computed independently and identically on every node — no consensus,
  * and a node joining/leaving a cluster of size N moves only ~1/N of
  * the groups' routers. The router owns the `{group, node}` occupancy
  * table fed by `:occupied`/`:vacant_batch` claims.
  *
  * The hash ring here is md5-based (node:vnode position keys, group
  * keyed by md5(group), router = owner of the first vnode clockwise
  * from the group's position): same algorithm family and the same
  * rebalance property (spec-measured: one node added to four moves
  * ~1/5 of routers), chosen over the reference's exact `ex_hash_ring`
  * function because md5 is portable to the SQL oracle — the routing
  * CONTRACT (deterministic, observer-independent, minimal movement) is
  * the semantics; the hash constant is not.
  *
  * Scale shape: occupancy is one distinct + one group-by over the
  * membership set; the ring is nodes × 128 rows (metadata-sized,
  * broadcast); router selection is groups ⨯ broadcast(ring) → one hash
  * aggregation. No shuffle grows past the membership set itself. */
object Muster {

  /** Per-group routing table: `(grp, occupancy, router)` where
    * `occupancy` is the sorted comma-joined node set holding members
    * (the fan-out targets) and `router` the consistent-hash owner.
    *
    * The ring lookup is [[graft.plans.RingOwner]] — a binary search
    * over the sorted ring carried into codegen as a reference object —
    * not a crossJoin fan: the relational `groups ⨯ broadcast(ring) →
    * min(h >= gh) → join back` shape evaluates |ring| md5 comparisons
    * per group (measured r12: 156 s for 1M groups × 896 vnodes on 32
    * cores, superlinear) where the kernel pays O(log |ring|) in the
    * same narrow projection as the occupancy aggregate. The ring is
    * cluster-membership-sized metadata: |nodes| comes from one bounded
    * collect (the same class as IVF centroids), and the vnode hashes
    * are computed driver-side with byte parity to Spark's `md5()`. */
  def routerAssignments(members: DataFrame, groupCol: String,
      nodeCol: String, vnodes: Int = 128): DataFrame = {
    val m = members
      .select(col(groupCol).as("grp"), col(nodeCol).as("node")).distinct()
    // cluster membership — bounded, hundreds of nodes at scale
    val nodeList = m.select("node").distinct()
      .collect().map(_.getString(0)).sorted
    val occ = m.groupBy("grp")
      .agg(array_join(sort_array(collect_set(col("node"))), ",")
        .as("occupancy"))
    if (nodeList.isEmpty)
      return occ.withColumn("router", lit(null).cast("string"))
    val ring = nodeList.toSeq.flatMap(n =>
      (0 until vnodes).map(i => (md5Hex(s"$n:$i"), n)))
    occ.withColumn("router",
      graft.plans.RingOwner.of(md5(col("grp")), ring))
  }

  /** Lowercase-hex MD5 — byte parity with Spark SQL's `md5()` (same
    * digest over UTF-8 bytes, same rendering), asserted in MusterSpec. */
  private[presence] def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /** Power-of-two-choices tenant placement + the rebalance sweep —
    * `Realtime.Nodes.launch_node` / `Realtime.Operations.rebalance`
    * (/root/reference/lib/realtime/nodes.ex:117-185,
    * lib/realtime/operations.ex:10-28): pick two deterministic
    * pseudo-random candidate nodes per tenant, place on the less loaded
    * (ties → the first candidate, the reference's `load1 <= load2`
    * branch), and the sweep flags tenants whose CURRENT node differs
    * from the placement.
    *
    * Candidate draws here are rendezvous-hash top-2 (the two smallest
    * `md5(tenant:node)` ranks) rather than the reference's seeded exsss
    * RNG — same contract (two deterministic, uniform, distinct
    * candidates per tenant, identically computable by every observer;
    * the Erlang RNG stream itself is not portable to any other engine,
    * including the SQL oracle), and rendezvous ranking additionally
    * gives the minimal-movement property on node-set change.
    *
    * Scale shape: tenants × broadcast(nodes) → one (tenant)-partitioned
    * rank; the node dimension (with loads) is metadata-sized. */
  def twoChoicePlacement(tenants: DataFrame, tenantCol: String,
      nodes: DataFrame, nodeCol: String, loadCol: String,
      currentCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = tenants.select(col(tenantCol).as("tenant"),
      col(currentCol).as("current")).distinct()
    val n = nodes.select(col(nodeCol).as("node"), col(loadCol).as("load"))
    // partition by (tenant, current), not tenant alone: rows are distinct
    // on the pair, so a tenant appearing under two current nodes (a
    // mid-extract move, dirty input) would otherwise fold both copies
    // into ONE ranking where the duplicate md5 keys tie arbitrarily —
    // each live placement record gets its own deterministic draw instead
    val w = Window.partitionBy("tenant", "current")
      .orderBy(md5(concat(col("tenant"), lit(":"), col("node"))))
    val ranked = t.crossJoin(broadcast(n))
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= 2)
    val picks = ranked.groupBy("tenant", "current").agg(
      min(when(col("_rn") === 1, col("node"))).as("node1"),
      min(when(col("_rn") === 1, col("load"))).as("load1"),
      min(when(col("_rn") === 2, col("node"))).as("node2"),
      min(when(col("_rn") === 2, col("load"))).as("load2"))
    picks.select(col("tenant"), col("node1"), col("node2"),
        when(col("load1") <= coalesce(col("load2"), col("load1")),
          col("node1")).otherwise(col("node2")).as("assigned"),
        col("current"))
      .withColumn("moved", col("assigned") =!= col("current"))
  }
}
