package graft.presence

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Bounded-metadata guard for the node-dimension collects (r12
    * advice): the ring / load dimension is cluster membership —
    * hundreds of nodes at a realtime deployment's scale — but nothing
    * structural enforces that, and a dirty members table whose node
    * column is actually high-cardinality (user ids, say) would turn a
    * previously distributed query into a driver OOM. The collect is
    * therefore capped three orders of magnitude above any real cluster
    * and fails loudly instead of dying quietly, matching how the other
    * bounded-collect paths (IVF centroids, vocab) are size-bounded. */
  private[presence] val MaxNodes = 100000

  private def boundedCollect(df: DataFrame,
      what: String): Array[org.apache.spark.sql.Row] = {
    val rows = df.limit(MaxNodes + 1).collect()
    require(rows.length <= MaxNodes,
      s"$what has over $MaxNodes distinct nodes — not a " +
        "cluster-membership dimension; refusing the driver-side collect")
    rows
  }

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
    val nodeList = boundedCollect(m.select("node").distinct(),
      "router ring node set").map(_.getString(0)).sorted
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

  /** The occupancy REGISTER's merge semantics — the seq-versioned
    * last-writer-wins table the router reads
    * (/root/reference/forum/lib/forum/muster/scope.ex:195-236
    * `upsert_if_newer` / `tombstone_if_newer`): rows are keyed
    * `(group, node)`, each claim carries a per-source-unique `seq`, and
    * the register keeps the winning claim per key under these rules:
    *
    *   - higher seq always wins (LWW by seq, never by arrival order);
    *   - at EQUAL seq a tombstone (vacancy) beats a present claim — the
    *     reference guards presents with strict `<` but tombstones with
    *     `=<` (scope.ex:228-236), so a vacancy at the stored seq still
    *     sticks while a re-claim needs a strictly newer seq;
    *   - tombstones are KEPT, not deleted (they carry `created_at` for
    *     the GC sweep): the seq high-water mark is what stops a stale,
    *     orphaned-RPC present claim from resurrecting a vacated group.
    *
    * The read model (`occupancy/2`) returns only present rows — a
    * tombstone reads as absent — so consumers filter `present`.
    *
    * Shape: ONE aggregation over the composite order key `(seq,
    * is_tombstone, created_at)` via a struct max — partial map-side
    * combine before the single (group, node) exchange, so a long claim
    * history collapses per mapper before it shuffles. (Catalyst plans a
    * struct max as SortAggregate — the struct buffer is immutable — so
    * each map partition sorts by key first; claims are control-plane
    * volume (groups × nodes × churn), and the alternative window-rank
    * formulation pays the same sort WITHOUT the map-side collapse, so
    * this is the cheaper shape at every scale.) Equivalent to (and
    * oracled as) `row_number() over (partition by grp, node order by
    * seq desc, present asc, created_at desc)` rn=1.
    *
    * `createdAtCol` is the tombstone GC stamp (router-local ms in the
    * reference); present claims carry none, and a present WINNER is
    * emitted with a null created_at — the reference stores the atom
    * `:present` in that slot. */
  def occupancyMerge(claims: DataFrame, grpCol: String, nodeCol: String,
      seqCol: String, presentCol: String, createdAtCol: String)
      : DataFrame = {
    val winner = max(struct(
      col(seqCol).cast("long").as("seq"),
      (!col(presentCol)).as("vacant"),
      when(col(presentCol), lit(null).cast("long"))
        .otherwise(col(createdAtCol).cast("long")).as("created_at")))
    claims
      .groupBy(col(grpCol).as("grp"), col(nodeCol).as("node"))
      .agg(winner.as("w"))
      .select(col("grp"), col("node"), col("w.seq").as("seq"),
        (!col("w.vacant")).as("present"),
        col("w.created_at").as("created_at"))
  }

  /** The tombstone GC sweep over a merged register
    * (scope.ex:1117-1127 `sweep_tombstones` → :1827 `reap_tombstones`):
    * drop tombstones whose `created_at` is older than `nowMs -
    * windowMs`; present rows are never reaped, and a tombstone inside
    * the window survives (it may still need to absorb an in-flight
    * stale claim — the window is a multiple of the RPC timeout, the
    * longest an orphaned `:occupied` can still land). Correctness does
    * not depend on sweep promptness: an over-kept tombstone is merely
    * an absent row; the sweep only bounds register memory. */
  def tombstoneSweep(register: DataFrame, nowMs: Long, windowMs: Long)
      : DataFrame =
    register.where(col("present") ||
      col("created_at") >= lit(nowMs - windowMs))

  /** The rebalance delta — which groups' routers MOVE under a
    * membership change (scope.ex:1143-1163 `member_delta` /
    * `do_rebalance`, and :1460-1490 `drop_stale_router_entries`, where
    * routers judge rows against the NEW ring): per group, the
    * consistent-hash owner under the old member set vs the new one.
    * Consistent hashing bounds the moved fraction to ~|changed|/|new|
    * (spec-measured on [[routerAssignments]]'s ring), which is exactly
    * what this query exposes — the set of groups whose occupancy rows
    * the sweep will re-judge, and the fan-out a coordinator must
    * re-snapshot.
    *
    * Both rings are cluster-membership metadata (caller-supplied node
    * lists, like the reference's `members` state); the double lookup is
    * two [[graft.plans.RingOwner]] binary-search kernels in one narrow
    * projection — no crossJoin fan, flat in group count. */
  def rebalanceDelta(groups: DataFrame, groupCol: String,
      oldNodes: Seq[String], newNodes: Seq[String], vnodes: Int = 128)
      : DataFrame = {
    def ring(nodes: Seq[String]) = nodes.sorted.flatMap(n =>
      (0 until vnodes).map(i => (md5Hex(s"$n:$i"), n)))
    val g = groups.select(col(groupCol).as("grp")).distinct()
    val withOld =
      if (oldNodes.isEmpty) g.withColumn("router_old", lit(null).cast("string"))
      else g.withColumn("router_old",
        graft.plans.RingOwner.of(md5(col("grp")), ring(oldNodes)))
    val both =
      if (newNodes.isEmpty)
        withOld.withColumn("router_new", lit(null).cast("string"))
      else withOld.withColumn("router_new",
        graft.plans.RingOwner.of(md5(col("grp")), ring(newNodes)))
    both.withColumn("moved",
      !(col("router_old") <=> col("router_new")))
  }

  /** The stale-router downgrade set — which REGISTER rows a rebalance
    * orphans (scope.ex:1460-1490 `drop_stale_router_entries`): after a
    * membership change, a router holds present rows for groups the NEW
    * ring routes elsewhere; those rows must be downgraded to tombstones
    * (never hard-deleted — the seq watermark must survive to repel
    * late claims, see [[occupancyMerge]]; only `:present` rows are
    * judged, a tombstone is left untouched so its GC clock keeps
    * running). As a global read model: present rows of groups whose
    * router MOVED between the old and new rings — the old router is
    * where the row lives, the move is why it no longer belongs there.
    *
    * Shape: the TWO ring lookups run per register row in one narrow
    * projection — NOT a join against [[rebalanceDelta]]: a DataFrame
    * used on both sides of a join is recomputed per side (Catalyst has
    * no common-subplan reuse), so the join form paid the register
    * merge TWICE plus a distinct and a broadcast (measured at 10M
    * claims / 1M keys: 22.1 s join form, 2.6 s this form). The
    * [[graft.plans.RingOwner]] kernel is O(log ring) per row — cheaper
    * than re-deriving its input. */
  def staleRouterRows(register: DataFrame, oldNodes: Seq[String],
      newNodes: Seq[String], vnodes: Int = 128): DataFrame = {
    def ring(nodes: Seq[String]) = nodes.sorted.flatMap(n =>
      (0 until vnodes).map(i => (md5Hex(s"$n:$i"), n)))
    // EvalOnce fence: the moved-filter below otherwise pushes beneath
    // this projection and re-evaluates BOTH ring kernels (and the md5)
    // per row in the Filter — caught by DupExprScan on this query's
    // first cut, the same pushdown-duplication family as the r12 CDC
    // fences. Bound via withColumn, so downstream composition sees a
    // plain attribute (no nondeterministic-whitelist trap).
    def router(out: String, nodes: Seq[String])(df: DataFrame) =
      if (nodes.isEmpty) df.withColumn(out, lit(null).cast("string"))
      else df.withColumn(out, graft.plans.EvalOnce.of(
        graft.plans.RingOwner.of(md5(col("grp")), ring(nodes))))
    register.where(col("present"))
      .transform(router("router_old", oldNodes))
      .transform(router("router_new", newNodes))
      .where(!(col("router_old") <=> col("router_new")))
      .select(col("grp"), col("node"), col("seq"),
        col("router_old"), col("router_new"))
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
    * Scale shape: the node dimension (with loads) is cluster-membership
    * metadata — one bounded collect, like [[routerAssignments]]'s ring —
    * and the draw is [[graft.plans.TwoChoicePick]], a running-top-2
    * digest sweep in a narrow projection over the distinct tenant set.
    * The relational alternative (tenants ⨯ broadcast(nodes) →
    * per-tenant rank window → re-aggregate) materializes
    * |tenants|·|nodes| rows through a sort: measured r12 at 111.8 s for
    * 1M tenants × 300 nodes on 32 cores, vs O(|nodes|) digests per
    * tenant with no extra rows here. The kernel byte-matches the
    * windowed formula (differential spec in MusterSpec), which remains
    * the SQL oracle. */
  def twoChoicePlacement(tenants: DataFrame, tenantCol: String,
      nodes: DataFrame, nodeCol: String, loadCol: String,
      currentCol: String): DataFrame = {
    // distinct on the (tenant, current) pair, not tenant alone: a tenant
    // appearing under two current nodes (a mid-extract move, dirty
    // input) keeps one deterministic draw per live placement record
    val t = tenants.select(col(tenantCol).as("tenant"),
      col(currentCol).as("current")).distinct()
    // cluster membership + loads — bounded, hundreds of nodes at scale.
    // Null node names (dirty metadata) are dropped; loads compare as
    // doubles (exact for any realistic integral load).
    val nodeMeta = boundedCollect(nodes
      .select(col(nodeCol).cast("string").as("node"),
        col(loadCol).cast("double").as("load")),
      "two-choice node/load table").filter(!_.isNullAt(0))
      .map(r => (r.getString(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    if (nodeMeta.isEmpty)
      return t.where(lit(false))
        .select(col("tenant"), lit(null).cast("string").as("node1"),
          lit(null).cast("string").as("node2"),
          lit(null).cast("string").as("assigned"), col("current"))
        .withColumn("moved", col("assigned") =!= col("current"))
    t.withColumn("_pick",
        graft.plans.TwoChoicePick.of(col("tenant"), nodeMeta.toSeq))
      .select(col("tenant"), col("_pick.node1").as("node1"),
        col("_pick.node2").as("node2"),
        col("_pick.assigned").as("assigned"), col("current"))
      .withColumn("moved", col("assigned") =!= col("current"))
  }

  /** `Realtime.Nodes.default_region_mapping` (nodes.ex:40-62): platform
    * region → closest serving region. The REGION_MAPPING env override is
    * deployment config, not semantics; unmapped regions translate to
    * null (the reference's `_ -> nil`). */
  val DefaultRegionMapping: Map[String, String] = Map(
    "ap-east-1" -> "ap-southeast-1", "ap-northeast-1" -> "ap-southeast-1",
    "ap-northeast-2" -> "ap-southeast-1", "ap-south-1" -> "ap-southeast-1",
    "ap-southeast-1" -> "ap-southeast-1",
    "ap-southeast-2" -> "ap-southeast-2",
    "ca-central-1" -> "us-east-1",
    "eu-central-1" -> "eu-west-2", "eu-central-2" -> "eu-west-2",
    "eu-north-1" -> "eu-west-2", "eu-west-1" -> "eu-west-2",
    "eu-west-2" -> "eu-west-2", "eu-west-3" -> "eu-west-2",
    "sa-east-1" -> "us-east-1", "us-east-1" -> "us-east-1",
    "us-east-2" -> "us-east-1", "us-west-1" -> "us-west-1",
    "us-west-2" -> "us-west-1")

  /** `platform_region_translator` as a Column (one codegen'd CASE). */
  def platformRegionTranslator(platformRegion: Column): Column =
    DefaultRegionMapping.toSeq.sortBy(_._1).foldLeft(
      lit(null).cast("string")) { case (acc, (from, to)) =>
      when(platformRegion === from, to).otherwise(acc)
    }

  /** The REGION leg of tenant placement —
    * `Realtime.Nodes.get_node_for_tenant` → `platform_region_translator`
    * → `launch_node` (nodes.ex:12-135): the candidate set RESTRICTS to
    * the translated region's nodes, then
    *   - zero region nodes → the caller's DEFAULT node (the reference
    *     logs a warning and launches locally — `launch_node`'s `[]` arm);
    *   - exactly one → that node, no draw;
    *   - otherwise the same two-choice pick as [[twoChoicePlacement]],
    *     over the REGION's nodes only.
    * An unmapped/null platform region has no region nodes by definition
    * (`region_nodes(nil) → []`) and takes the default arm.
    *
    * Shape: node metadata (node, load, region) is one bounded collect;
    * the per-region arms chain into ONE CASE over per-region
    * [[graft.plans.TwoChoicePick]] kernels (regions are a handful), and
    * the struct is bound once via withColumn — a narrow projection over
    * the distinct tenant set, no joins. */
  def regionPlacement(tenants: DataFrame, tenantCol: String,
      platformRegionCol: String, nodes: DataFrame, nodeCol: String,
      loadCol: String, nodeRegionCol: String, defaultNode: String)
      : DataFrame = {
    val t = tenants.select(col(tenantCol).as("tenant"),
      col(platformRegionCol).as("platform_region")).distinct()
      .withColumn("region", platformRegionTranslator(col("platform_region")))
    val nodeMeta = boundedCollect(nodes
      .select(col(nodeCol).cast("string").as("node"),
        col(loadCol).cast("double").as("load"),
        col(nodeRegionCol).cast("string").as("region")),
      "region-placement node table").filter(!_.isNullAt(0))
      .map(r => (r.getString(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)),
        if (r.isNullAt(2)) null else r.getString(2)))
    val byRegion = nodeMeta.filter(_._3 != null).groupBy(_._3)
    def pickStruct(node1: Column, node2: Column, assigned: Column) =
      struct(node1.cast("string").as("node1"),
        node2.cast("string").as("node2"),
        assigned.cast("string").as("assigned"))
    val defaultArm = pickStruct(lit(null), lit(null), lit(defaultNode))
    val pick = byRegion.toSeq.sortBy(_._1).foldLeft(defaultArm) {
      case (acc, (rg, nm)) =>
        val arm =
          if (nm.length == 1)
            pickStruct(lit(nm.head._1), lit(null), lit(nm.head._1))
          else graft.plans.TwoChoicePick.of(col("tenant"),
            nm.map(n => (n._1, n._2)).toSeq.sortBy(_._1))
        when(col("region") === rg, arm).otherwise(acc)
    }
    t.withColumn("_pick", pick)
      .select(col("tenant"), col("platform_region"), col("region"),
        col("_pick.node1").as("node1"), col("_pick.node2").as("node2"),
        col("_pick.assigned").as("assigned"))
  }

  /** The stability-gated WRONG-REGION check —
    * `Realtime.Tenants.Rebalancer.check`
    * (lib/realtime/tenants/rebalancer.ex:8-31): a tenant's Connect
    * process asks, on a cadence, whether it is running in the region
    * [[regionPlacement]] would put it in today. Three reference arms,
    * all modeled:
    *   - the CLUSTER-STABILITY gate: the check only fires when the node
    *     set observed now equals the node set observed last time
    *     (MapSet equality — membership churn means the cluster is "not
    *     stable enough to rebalance"), so an unstable pair verdicts
    *     every tenant `ok`;
    *   - on a stable pair, expected region = the same
    *     `platform_region_translator` CASE as placement; `wrong_region`
    *     iff the hosting region differs. An UNMAPPED platform region
    *     translates to null, and the reference compares the (binary)
    *     hosting region against nil with plain `==` — false — so an
    *     unmapped tenant hosted anywhere is ALWAYS flagged
    *     (rebalancer.ex:17-22: only the app-region binding is guarded,
    *     not the expected region). Preserved as-is, documented here
    *     because it looks like a bug and is in fact the live behavior;
    *   - a tenant whose hosting region is unknown (the
    *     `Application.get_env` non-binary arm) verdicts `ok`.
    *
    * Shape: the node snapshots are cluster-membership dimensions (a
    * handful of rows), taken as driver-side Seqs exactly like
    * [[regionPlacement]]'s `defaultNode`; the verdict itself is one
    * codegen'd CASE over the tenant projection — no joins, no shuffles
    * beyond the caller's own tenant distinct. */
  def regionRebalance(tenants: DataFrame, tenantCol: String,
      platformRegionCol: String, currentRegionCol: String,
      prevNodes: Seq[String], curNodes: Seq[String]): DataFrame = {
    val stable = prevNodes.toSet == curNodes.toSet
    val t = tenants.select(col(tenantCol).as("tenant"),
      col(platformRegionCol).as("platform_region"),
      col(currentRegionCol).cast("string").as("current_region"))
    val verdict =
      if (!stable) lit("ok")
      else when(col("current_region").isNull, "ok")
        .when(col("current_region") <=> col("expected_region"), "ok")
        .otherwise("wrong_region")
    t.withColumn("expected_region",
        platformRegionTranslator(col("platform_region")))
      .withColumn("verdict", verdict)
  }

  /** The shard claim state machine's FLAP SUPPRESSION — which
    * membership transitions actually reach the router
    * (forum/lib/forum/muster/shard.ex:312-334 `enter_cooldown`,
    * :470-505 the `:cooldown` reclaim branch, :637-651
    * `handle_vacancy_expired`): when a group's LAST local member
    * leaves, the shard does NOT retract the router row — it enters
    * `:cooldown` for `vacancy_cooldown_ms` (default 30 s). A re-join
    * inside the window cancels the timer and reclaims the group with NO
    * router traffic ("claim churn ≠ register churn"); only a vacancy
    * that SURVIVES the window becomes `:vacant_queued` and emits the
    * retraction, and only a join after a survived vacancy re-emits
    * `:occupied`. Each fresh vacancy re-arms the timer (shard.ex:312-317
    * re-enters cooldown from `:cooldown` too).
    *
    * Input: membership delta events `(grp, node, tsMs, delta ∈ {+1,-1},
    * tie)` — well-formed (every leave matches a live member), totally
    * ordered per key by `(tsMs, delta, tie)`. Output: the router-visible
    * claim stream `(grp, node, claim ∈ {occupied, vacant}, emit_ms)`,
    * with a survived vacancy stamped at its timer EXPIRY
    * (`vacancy_ms + cooldownMs` — the reference then queues it for the
    * next periodic flush; the flush cadence is transmission batching,
    * not claim semantics, so the expiry is the modeled emit time). A
    * re-join exactly AT expiry counts as after it (the timer fired
    * first): vacant emitted, occupied re-emitted.
    *
    * Shape: one exchange on (grp, node), then three window passes over
    * the SAME sort order (running member count; last-preceding
    * vacancy-start; next EVENT) — Spark reuses the sort — and every row
    * emits at most one claim, so the result is a single filtered
    * projection: no union, no self-join, no recompute. The
    * vacancy-survival probe is `lead(ts, 1)` — in well-formed input the
    * event after a vacancy-start is NECESSARILY the next join (the
    * count is 0; another leave would be unmatched) — and the offset
    * frame matters at scale: the equivalent `min(join ts) OVER (1
    * FOLLOWING, UNBOUNDED FOLLOWING)` formulation is a SHRINKING frame,
    * which Spark recomputes from scratch per row — O(rows²) per key,
    * measured 100+ CPU-minutes stuck on a 1M-delta hot key in the 10M
    * RegisterProbe leg, vs seconds with the offset frame. [[ClaimStream]]
    * is the live twin (the same machine as flatMapGroupsWithState +
    * event-time timers — and it, too, expires a pending vacancy against
    * the NEXT EVENT's time), stream==batch pinned in ClaimStreamSpec. */
  def claimDebounce(events: DataFrame, grpCol: String, nodeCol: String,
      tsMsCol: String, deltaCol: String, tieCol: String,
      cooldownMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(cooldownMs > 0, "cooldownMs must be positive")
    val w = Window.partitionBy("grp", "node")
      .orderBy(col("ts_ms"), col("delta"), col("tie"))
    val counted = events.select(
        col(grpCol).as("grp"), col(nodeCol).as("node"),
        col(tsMsCol).cast("long").as("ts_ms"),
        col(deltaCol).cast("int").as("delta"), col(tieCol).as("tie"))
      .withColumn("cnt", sum(col("delta")).over(w))
      .withColumn("occ_start", col("delta") === 1 && col("cnt") === 1)
      .withColumn("vac_start", col("delta") === -1 && col("cnt") === 0)
    val prevVac = max(when(col("vac_start"), col("ts_ms")))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    // next EVENT, not min-of-following-joins: identical on well-formed
    // input (see scaladoc) and an incremental offset frame instead of a
    // quadratic shrinking one
    val nextEv = lead(col("ts_ms"), 1).over(w)
    val emitOcc = col("occ_start") && (col("prev_vac_ms").isNull ||
      col("ts_ms") - col("prev_vac_ms") >= cooldownMs)
    val emitVac = col("vac_start") && (col("next_join_ms").isNull ||
      col("next_join_ms") - col("ts_ms") >= cooldownMs)
    counted
      .withColumn("prev_vac_ms", prevVac)
      .withColumn("next_join_ms", nextEv)
      .select(col("grp"), col("node"),
        when(emitOcc, "occupied").when(emitVac, "vacant").as("claim"),
        when(emitOcc, col("ts_ms"))
          .when(emitVac, col("ts_ms") + cooldownMs).as("emit_ms"))
      .where(col("claim").isNotNull)
  }
}
