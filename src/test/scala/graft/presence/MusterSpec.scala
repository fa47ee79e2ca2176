package graft.presence

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Forum.Muster routing table: occupancy = the member node set,
  * router = consistent-hash owner — deterministic, observer-independent,
  * and minimal-movement under cluster membership change (the property
  * consistent hashing exists for: forum/README.md "The router node"). */
class MusterSpec extends SparkSpec {
  import spark.implicits._

  private def routers(groups: Seq[String], nodes: Seq[String])
      : Map[String, String] = {
    // membership assignment is irrelevant to routing (the ring is built
    // from the node SET); spread groups across nodes round-robin
    val members = groups.zipWithIndex
      .map { case (g, i) => (g, nodes(i % nodes.length)) }
      .toDF("grp", "node")
    Muster.routerAssignments(members, "grp", "node")
      .select("grp", "router").as[(String, String)].collect().toMap
  }

  test("deterministic routing; occupancy is exactly the member node set; " +
      "router is a cluster node") {
    val members = Seq(
      ("room1", "nA"), ("room1", "nC"), ("room1", "nA"), // dup membership
      ("room2", "nB"), ("room3", "nC"))
      .toDF("grp", "node")
    val out = Muster.routerAssignments(members, "grp", "node")
      .collect().map(r => r.getAs[String]("grp") ->
        ((r.getAs[String]("occupancy"), r.getAs[String]("router")))).toMap
    assert(out("room1")._1 == "nA,nC")
    assert(out("room2")._1 == "nB")
    assert(out("room3")._1 == "nC")
    val allNodes = Set("nA", "nB", "nC")
    assert(out.values.forall(v => allNodes.contains(v._2)))
    // every observer computes the same table from the same input
    val again = Muster.routerAssignments(members, "grp", "node")
      .collect().map(r => r.getAs[String]("grp") ->
        r.getAs[String]("router")).toMap
    assert(again == out.map { case (k, v) => k -> v._2 })
  }

  test("rebalance: one node added to four moves ~1/5 of routers; a node " +
      "removed moves EXACTLY its own groups") {
    val groups = (0 until 400).map(i => s"topic-$i")
    val r4 = routers(groups, Seq("n0", "n1", "n2", "n3"))
    val r5 = routers(groups, Seq("n0", "n1", "n2", "n3", "n4"))
    // consistent hashing's removal guarantee is exact: dropping n4's
    // vnodes only re-homes positions n4 owned — every other group keeps
    // its router bit-for-bit
    groups.foreach { g =>
      if (r5(g) != "n4")
        assert(r4(g) == r5(g), s"$g moved although its router survived")
      else assert(r4(g) != "n4")
    }
    // and the addition moves ~1/5 of groups (the ~1/N property; generous
    // band for 128-vnode variance at 400 groups)
    val moved = groups.count(g => r4(g) != r5(g)).toDouble / groups.size
    assert(moved > 0.05 && moved < 0.45,
      s"expected ~0.2 of routers to move on n4 join, got $moved")
    // the new node actually took ownership of what moved
    assert(groups.forall(g => r4(g) == r5(g) || r5(g) == "n4"))
  }

  test("two-choice placement: less-loaded candidate wins, tie prefers " +
      "the first draw, single-node degenerates, sweep flags movers") {
    import org.apache.spark.sql.DataFrame
    def place(nodes: Seq[(String, Int)], tenants: Seq[(String, String)])
        : Map[String, (String, String, String, Boolean)] = {
      val n: DataFrame = nodes.toDF("node", "load")
      val t: DataFrame = tenants.toDF("tenant", "current")
      Muster.twoChoicePlacement(t, "tenant", n, "node", "load", "current")
        .collect().map(r => r.getAs[String]("tenant") ->
          ((r.getAs[String]("node1"), r.getAs[String]("node2"),
            r.getAs[String]("assigned"), r.getAs[Boolean]("moved")))).toMap
    }
    // many tenants over unequal loads: every assignment is the less
    // loaded of ITS OWN two candidates, and a tie goes to node1
    val nodes = Seq(("nA", 5), ("nB", 1), ("nC", 5), ("nD", 3))
    val loads = nodes.toMap
    val tenants = (0 until 100).map(i => (s"t$i", "nA"))
    val out = place(nodes, tenants)
    out.foreach { case (t, (n1, n2, assigned, moved)) =>
      assert(n1 != n2, s"$t drew the same candidate twice")
      val expect =
        if (loads(n1) <= loads(n2)) n1 else n2
      assert(assigned == expect, s"$t placed $assigned, expected $expect")
      assert(moved == (assigned != "nA"))
    }
    // both candidates vary across tenants (the draws are per-tenant
    // pseudo-random, not a global favourite)
    assert(out.values.map(_._1).toSet.size >= 3)
    // single-node region: placement degenerates to that node
    val one = place(Seq(("only", 9)), Seq(("t", "only"), ("u", "other")))
    assert(one("t") == (("only", null, "only", false)))
    assert(one("u")._3 == "only" && one("u")._4)
  }

  test("RingOwner kernel == the relational ring formula (differential): " +
      "same owner for every group, including wrap-past-last-vnode keys; " +
      "driver-side md5Hex has byte parity with Spark md5()") {
    val nodes = Seq("nA", "nB", "nC", "nD", "nE")
    val groups = (0 until 500).map(i => s"topic-$i")
    val members = groups.zipWithIndex
      .map { case (g, i) => (g, nodes(i % nodes.length)) }
      .toDF("grp", "node")
    // the kernel path (production)
    val got = Muster.routerAssignments(members, "grp", "node")
      .select("grp", "router").as[(String, String)].collect().toMap
    // the relational formula it replaced, inline: groups x ring ->
    // min(h >= gh) else global min -> owner
    val ring = members.select("node").distinct()
      .select(col("node"), explode(sequence(lit(0), lit(127))).as("i"))
      .select(col("node"),
        md5(concat(col("node"), lit(":"), col("i").cast("string"))).as("h"))
    val sel = members.select("grp").distinct()
      .withColumn("gh", md5(col("grp")))
      .crossJoin(broadcast(ring))
      .groupBy("grp", "gh")
      .agg(min(when(col("h") >= col("gh"), col("h"))).as("above"),
        min(col("h")).as("wrapmin"))
      .select(col("grp"), coalesce(col("above"), col("wrapmin")).as("rh"))
    val want = sel.join(broadcast(ring), col("rh") === col("h"))
      .select(col("grp"), col("node")).as[(String, String)].collect().toMap
    assert(got.size == groups.size && want.size == groups.size)
    got.foreach { case (g, r) =>
      assert(want(g) == r, s"kernel/formula split at $g: $r vs ${want(g)}")
    }
    // md5Hex parity with Spark's md5() on the ring position keys
    val sparkMd5 = Seq("nA:0", "nA:127", "topic-7").toDF("s")
      .select(col("s"), md5(col("s"))).as[(String, String)].collect()
    sparkMd5.foreach { case (s, h) => assert(Muster.md5Hex(s) == h) }
  }

  test("TwoChoicePick kernel == the crossJoin+window formula " +
      "(differential): same node1/node2/assigned/moved for every " +
      "tenant across node counts, null loads, load ties, and a tenant " +
      "under two current nodes") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.expressions.Window
    // the windowed relational formula the kernel replaced (also the
    // shape of the j8 SQL oracle), inline
    def windowed(t: DataFrame, n: DataFrame): DataFrame = {
      val w = Window.partitionBy("tenant", "current")
        .orderBy(md5(concat(col("tenant"), lit(":"), col("node"))))
      val ranked = t.distinct().crossJoin(broadcast(n))
        .withColumn("_rn", row_number().over(w))
        .where(col("_rn") <= 2)
      ranked.groupBy("tenant", "current").agg(
          min(when(col("_rn") === 1, col("node"))).as("node1"),
          min(when(col("_rn") === 1, col("load"))).as("load1"),
          min(when(col("_rn") === 2, col("node"))).as("node2"),
          min(when(col("_rn") === 2, col("load"))).as("load2"))
        .select(col("tenant"), col("node1"), col("node2"),
          when(col("load1") <= coalesce(col("load2"), col("load1")),
            col("node1")).otherwise(col("node2")).as("assigned"),
          col("current"))
        .withColumn("moved", col("assigned") =!= col("current"))
    }
    def rows(df: DataFrame): Set[(String, String, String, String, String, Any)] =
      df.collect().map(r => (r.getAs[String]("tenant"),
        r.getAs[String]("node1"), r.getAs[String]("node2"),
        r.getAs[String]("assigned"), r.getAs[String]("current"),
        r.getAs[Any]("moved"))).toSet
    for (nNodes <- Seq(1, 2, 7, 64)) {
      // load pattern mixes ties (i % 3) and a null load every 5th node
      val nodes = (0 until nNodes).map(i =>
        (s"n$i", if (i % 5 == 4) None else Some(i % 3))).toDF("node", "load")
      val tenants = (0 until 300).map(i => (s"t$i", s"n${i % nNodes}"))
        // one tenant under two current nodes: a draw per pair
        .prepended(("t0", "elsewhere")).toDF("tenant", "current")
      val got = rows(Muster.twoChoicePlacement(
        tenants, "tenant", nodes, "node", "load", "current"))
      val want = rows(windowed(
        tenants.select(col("tenant"), col("current")),
        nodes.select(col("node"), col("load"))))
      assert(got == want,
        s"kernel/formula split at $nNodes nodes: " +
          s"only-kernel=${(got -- want).take(3)} only-formula=${(want -- got).take(3)}")
    }
    // empty node list: empty result, same schema
    val none = Muster.twoChoicePlacement(
      Seq(("t", "n0")).toDF("tenant", "current"), "tenant",
      Seq.empty[(String, Int)].toDF("node", "load"), "node", "load",
      "current")
    assert(none.isEmpty && none.columns.toSeq ==
      Seq("tenant", "node1", "node2", "assigned", "current", "moved"))
    // null tenant: a null struct, not an arbitrary ranking
    val nt = Muster.twoChoicePlacement(
      Seq((null: String, "n0")).toDF("tenant", "current"), "tenant",
      Seq(("n0", 1), ("n1", 2)).toDF("node", "load"), "node", "load",
      "current").collect()
    assert(nt.length == 1 && nt(0).getAs[String]("assigned") == null)
  }

  test("occupancy register merge pins scope.ex's upsert_if_newer / " +
      "tombstone_if_newer rules: LWW by seq, tombstone wins EQUAL seq, " +
      "stale present cannot resurrect a vacated group, strictly-newer " +
      "re-claim wins, tombstones keep their created_at stamp") {
    // (grp, node, seq, present, created_at) — created_at only on
    // tombstone claims, like the reference's meta slot
    val claims = Seq(
      // k1: plain LWW — present@1 then present@5: the higher seq wins
      ("g1", "nA", 1L, true, None),
      ("g1", "nA", 5L, true, None),
      // k2: tombstone at EQUAL seq beats present (the :lte vs :lt
      // guard split, scope.ex:228-236)
      ("g2", "nA", 7L, true, None),
      ("g2", "nA", 7L, false, Some(70L)),
      // k3: a STALE lower-seq present (orphaned RPC landing late) must
      // not resurrect the vacated group — the tombstone's seq guard
      ("g3", "nA", 9L, false, Some(90L)),
      ("g3", "nA", 4L, true, None),
      // k4: a strictly-newer present re-claim DOES win the tombstone
      ("g4", "nA", 3L, false, Some(30L)),
      ("g4", "nA", 8L, true, None),
      // k5: two tombstones, the newer (by seq) keeps ITS created_at
      ("g5", "nA", 2L, false, Some(20L)),
      ("g5", "nA", 6L, false, Some(60L))
    ).map { case (g, n, s2, p, c) =>
        (g, n, s2, p, c.map(java.lang.Long.valueOf).orNull) }
      .toDF("grp", "node", "seq", "present", "created_at")
    val got = Muster.occupancyMerge(claims,
        "grp", "node", "seq", "present", "created_at")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getBoolean(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap
    assert(got("g1") == ((5L, true, None)))
    assert(got("g2") == ((7L, false, Some(70L))), "equal-seq tombstone lost")
    assert(got("g3") == ((9L, false, Some(90L))), "stale present resurrected")
    assert(got("g4") == ((8L, true, None)), "re-claim lost to tombstone")
    assert(got("g5") == ((6L, false, Some(60L))))
    // the READ model: occupancy returns only present rows
    val visible = Muster.occupancyMerge(claims,
        "grp", "node", "seq", "present", "created_at")
      .where(col("present")).select("grp").as[String].collect().toSet
    assert(visible == Set("g1", "g4"))
  }

  test("tombstone sweep reaps only out-of-window tombstones: present " +
      "rows never reaped, in-window tombstones survive") {
    val claims = Seq(
      ("g1", "nA", 1L, true, null.asInstanceOf[java.lang.Long]),
      ("g2", "nA", 1L, false, java.lang.Long.valueOf(100L)), // old
      ("g3", "nA", 1L, false, java.lang.Long.valueOf(900L))  // young
    ).toDF("grp", "node", "seq", "present", "created_at")
    val reg = Muster.occupancyMerge(claims,
      "grp", "node", "seq", "present", "created_at")
    // now=1000, window=500 -> cutoff 500: g2's stamp 100 reaps, g3's
    // 900 survives, g1 (present, null stamp) is untouchable
    val swept = Muster.tombstoneSweep(reg, nowMs = 1000L, windowMs = 500L)
      .select("grp").as[String].collect().toSet
    assert(swept == Set("g1", "g3"))
  }

  test("rebalance delta: router recomputed under old vs new ring, " +
      "moved fraction bounded by the consistent-hash property") {
    val groups = spark.range(2000)
      .selectExpr("concat('g', id) as grp")
    val oldNodes = (0 until 4).map(i => s"n$i")
    // one removed, two added — both delta directions at once, like
    // recompute_members rederiving the whole set
    val newNodes = Seq("n0", "n2", "n3", "n4", "n5")
    val delta = Muster.rebalanceDelta(groups, "grp", oldNodes, newNodes)
      .collect()
    assert(delta.length == 2000)
    // every old router is an old node; every new router a new node
    assert(delta.forall(r => oldNodes.contains(r.getAs[String]("router_old"))))
    assert(delta.forall(r => newNodes.contains(r.getAs[String]("router_new"))))
    // groups routed to the removed node n1 MUST move
    assert(delta.filter(_.getAs[String]("router_old") == "n1")
      .forall(_.getAs[Boolean]("moved")))
    // consistent hashing: the moved fraction is near |changed|/|new| —
    // n1's share (~1/4) plus what n4+n5 claim (~2/5), far below a
    // rehash-everything's ~4/5. Generous band, deterministic data.
    val moved = delta.count(_.getAs[Boolean]("moved")).toDouble / 2000
    assert(moved > 0.3 && moved < 0.75, s"moved fraction $moved")
    // identity change: nothing moves
    val same = Muster.rebalanceDelta(groups, "grp", oldNodes, oldNodes)
    assert(same.where(col("moved")).isEmpty)
  }

  test("stale-router drop judges only PRESENT rows: a tombstone of a " +
      "moved group is left untouched (its GC clock must keep running), " +
      "and unmoved groups' rows are never downgraded") {
    val claims = Seq(
      ("gA", "n0", 1L, true, null.asInstanceOf[java.lang.Long]),
      ("gB", "n0", 2L, false, java.lang.Long.valueOf(20L)), // tombstone
      ("gC", "n0", 3L, true, null.asInstanceOf[java.lang.Long])
    ).toDF("grp", "node", "seq", "present", "created_at")
    val reg = Muster.occupancyMerge(claims,
      "grp", "node", "seq", "present", "created_at")
    val oldNodes = (0 until 4).map(i => s"n$i")
    // removing every node a group could route to forces ALL groups to
    // move — so the only thing keeping gB out of the output is its
    // tombstone state, which is exactly the rule under test
    val dropped = Muster.staleRouterRows(reg, oldNodes, Seq("n9"))
      .select("grp").as[String].collect().toSet
    assert(dropped == Set("gA", "gC"),
      s"tombstone judged or present missed: $dropped")
    // identity membership: no group moves, nothing is downgraded
    assert(Muster.staleRouterRows(reg, oldNodes, oldNodes).isEmpty)
  }

  test("the node-dimension collects are capped: a high-cardinality " +
      "node column fails loudly instead of a driver-side OOM") {
    // a members table whose "node" column is actually per-row unique —
    // the dirty-input shape the bounded-metadata convention can't see
    val dirty = spark.range(Muster.MaxNodes + 1L)
      .selectExpr("concat('g', id % 10) as grp", "concat('u', id) as node")
    val e1 = intercept[IllegalArgumentException] {
      Muster.routerAssignments(dirty, "grp", "node").collect()
    }
    assert(e1.getMessage.contains("distinct nodes"))
    val dirtyNodes = spark.range(Muster.MaxNodes + 1L)
      .selectExpr("concat('u', id) as node", "cast(id % 3 as int) as load")
    val e2 = intercept[IllegalArgumentException] {
      Muster.twoChoicePlacement(
        Seq(("t", "n0")).toDF("tenant", "current"), "tenant",
        dirtyNodes, "node", "load", "current").collect()
    }
    assert(e2.getMessage.contains("distinct nodes"))
  }

  test("region placement: translation through the default mapping, then " +
      "the launch_node arms — two-choice per multi-node region, the " +
      "single node verbatim, the default for empty/unmapped regions") {
    // mapping spot-checks against nodes.ex:40-62
    val tr = spark.range(1).select(
      Muster.platformRegionTranslator(lit("ca-central-1")).as("a"),
      Muster.platformRegionTranslator(lit("eu-north-1")).as("b"),
      Muster.platformRegionTranslator(lit("nope-0")).as("c")).head
    assert(tr.getString(0) == "us-east-1" && tr.getString(1) == "eu-west-2"
      && tr.isNullAt(2))
    val tenants = Seq(
      ("tA", "us-east-2"),       // → us-east-1 (two nodes) → two-choice
      ("tB", "us-west-2"),       // → us-west-1 (single node)
      ("tC", "ap-southeast-2"),  // mapped region, zero nodes → default
      ("tD", "xx"))              // unmapped → default
      .toDF("tenant", "platform_region")
    val nodes = Seq(
      ("n0", 5, "us-east-1"), ("n1", 1, "us-east-1"),
      ("n2", 9, "us-west-1"))
      .toDF("node", "load", "region")
    val out = Muster.regionPlacement(tenants, "tenant", "platform_region",
        nodes, "node", "load", "region", defaultNode = "n-local")
      .collect().map(r => r.getString(0) ->
        ((r.getString(3), r.getString(4), r.getString(5)))).toMap
    // two-choice over exactly two candidates: lower load (n1) wins
    assert(out("tA")._3 == "n1", s"got ${out("tA")}")
    assert(Set(out("tA")._1, out("tA")._2) == Set("n0", "n1"))
    assert(out("tB") == (("n2", null, "n2")))
    assert(out("tC") == ((null, null, "n-local")))
    assert(out("tD") == ((null, null, "n-local")))
  }

  test("region rebalance: set-equal snapshots gate the check; mismatch " +
      "flags wrong_region, unmapped is ALWAYS flagged, null hosting and " +
      "unstable pairs are ok (rebalancer.ex:8-31)") {
    val tenants = Seq(
      ("tA", "us-east-2", "us-east-1"),  // expected us-east-1, match → ok
      ("tB", "us-east-2", "eu-west-2"),  // mismatch → wrong_region
      ("tC", "xx-unknown", "us-east-1"), // unmapped: nil != binary → wrong
      ("tD", "us-west-2", null))         // hosting unknown → ok
      .toDF("tenant", "platform_region", "current_region")
    // stable: same SET, different order (MapSet equality)
    val stable = Muster.regionRebalance(tenants, "tenant",
        "platform_region", "current_region",
        prevNodes = Seq("a", "b"), curNodes = Seq("b", "a"))
      .collect().map(r => r.getString(0) -> r.getString(4)).toMap
    assert(stable == Map("tA" -> "ok", "tB" -> "wrong_region",
      "tC" -> "wrong_region", "tD" -> "ok"))
    // unstable: membership churn verdicts everything ok
    val unstable = Muster.regionRebalance(tenants, "tenant",
        "platform_region", "current_region",
        prevNodes = Seq("a", "b"), curNodes = Seq("a", "b", "c"))
      .collect().map(_.getString(4)).toSet
    assert(unstable == Set("ok"))
  }
}
