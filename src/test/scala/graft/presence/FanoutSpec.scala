package graft.presence

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** GenRpcPubSub two-tier fan-out plan (gen_rpc/pub_sub.ex:47-126):
  * exactly-once per node, hop partition per region, gateway/channel
  * consistency per sender, and the single-node-region arm. */
class FanoutSpec extends SparkSpec {
  import spark.implicits._

  // 3 regions: r0 = {0,3,6}, r1 = {1,4}, r2 = {2} (single-node)
  private val nodes = Seq((0, 0), (3, 0), (6, 0), (1, 1), (4, 1), (2, 2))

  private def plan(msgs: Seq[(Long, Long, Int)]) =
    Fanout.hopPlan(msgs.toDF("msg_id", "sender", "origin"),
      "sender", "origin", nodes, 5)

  test("every node receives exactly once; hops partition the cluster") {
    val out = plan(Seq((10L, 7L, 0), (11L, 8L, 4), (12L, 7L, 2)))
      .collect()
    // one delivery row per (msg, node)
    assert(out.length == 3 * nodes.length)
    assert(out.groupBy(r => (r.getAs[Long]("msg_id"), r.getAs[Int]("node")))
      .forall(_._2.length == 1))
    out.groupBy(_.getAs[Long]("msg_id")).foreach { case (_, rows) =>
      val byHop = rows.groupBy(_.getAs[String]("hop"))
        .view.mapValues(_.map(_.getAs[Int]("node")).toSet).toMap
      val origin = rows.head.getAs[Int]("origin")
      val originRegion = nodes.toMap.apply(origin)
      val regionMates = nodes.filter(_._2 == originRegion).map(_._1).toSet
      // local = the origin; ftl = the rest of its region
      assert(byHop("local") == Set(origin))
      assert(byHop.getOrElse("ftl", Set.empty) == regionMates - origin)
      // each OTHER region contributes exactly one ftr gateway, and
      // ftr ∪ ftl_relay partitions that region
      val others = nodes.filterNot(_._2 == originRegion)
      val ftr = byHop.getOrElse("ftr", Set.empty)
      val relay = byHop.getOrElse("ftl_relay", Set.empty)
      others.groupBy(_._2).foreach { case (_, members) =>
        val ids = members.map(_._1).toSet
        assert((ftr & ids).size == 1)
        assert((relay & ids) == ids -- ftr)
      }
    }
  }

  test("single-node region: its only node is the gateway, no relay leg") {
    val out = plan(Seq((1L, 42L, 0))).collect()
    val n2 = out.find(_.getAs[Int]("node") == 2).get
    assert(n2.getAs[String]("hop") == "ftr")
    assert(!out.exists(r => r.getAs[Int]("region") == 2 &&
      r.getAs[String]("hop") == "ftl_relay"))
  }

  test("gateway and channel are sticky per sender, vary across senders") {
    val senders = (0L until 40L).map(s => (s, s, 0))
    val out = plan(senders).collect()
    // channel: ONE value per sender across all its delivery rows
    // (gen_rpc.ex:242 — the key picks the client, not the target node)
    val chans = out.groupBy(_.getAs[Long]("sender"))
      .map { case (s, rows) =>
        val cs = rows.map(_.getAs[Int]("channel")).toSet
        assert(cs.size == 1, s"sender $s channels $cs"); cs.head
      }.toSet
    assert(chans.size > 1 && chans.subsetOf((1 to 5).toSet))
    // gateway per (sender, region): re-running the plan picks the same
    // gateway; different senders spread across region members
    val gw = out.filter(_.getAs[String]("hop") == "ftr")
      .groupBy(r => (r.getAs[Long]("sender"), r.getAs[Int]("region")))
      .view.mapValues(_.map(_.getAs[Int]("node")).toSet).toMap
    assert(gw.values.forall(_.size == 1))
    val again = plan(senders).collect()
      .filter(_.getAs[String]("hop") == "ftr")
      .groupBy(r => (r.getAs[Long]("sender"), r.getAs[Int]("region")))
      .view.mapValues(_.map(_.getAs[Int]("node")).toSet).toMap
    assert(again == gw)
    val r1Gateways = gw.collect { case ((_, 1), ns) => ns.head }.toSet
    assert(r1Gateways.size > 1, "40 senders should spread over region 1")
  }

  test("extra input columns pass through") {
    val msgs = Seq((1L, 2L, 3, "t9")).toDF("msg_id", "sender", "origin",
      "tenant")
    val out = Fanout.hopPlan(msgs, "sender", "origin", nodes, 1)
    assert(out.columns.contains("tenant"))
    assert(out.select("tenant").distinct().as[String].collect()
      .toSeq == Seq("t9"))
    assert(out.select("channel").distinct().as[Int].collect()
      .toSeq == Seq(1))
  }
}
