package graft.presence

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Forum.Census batch model: local reads exact, remote visibility
  * bounded by one broadcast interval (forum/README.md staleness
  * contract; census.ex:92-104 read path). */
class CensusSpec extends SparkSpec {

  test("local joins are visible immediately; a peer's join is invisible " +
      "within its broadcast interval and visible after — staleness " +
      "bounded by exactly one interval") {
    import spark.implicits._
    // interval 60 s; joins: nA@10s, nB@30s (both in (0,60]), nA@70s
    val events = Seq(("nA", "g", 10L), ("nB", "g", 30L), ("nA", "g", 70L))
      .toDF("node", "grp", "sec")
      .select(col("node"), col("grp"),
        timestamp_micros(col("sec") * 1000000L).as("ts"))
    val got = Census.memberCounts(events, "node", "grp", "ts", 60L)
      .select(col("read_node"), unix_micros(col("read_ts")) / 1000000L,
        col("n_local"), col("n_remote"), col("n_total"))
      .as[(String, Double, Long, Long, Long)].collect()
      .map(r => (r._1, r._2.toLong) -> ((r._3, r._4, r._5))).toMap
    // tick 60: each node sees its OWN joins (local exact) but not the
    // peer's — the broadcast stamped 60 is still in flight
    assert(got(("nA", 60L)) == ((1L, 0L, 1L)))
    assert(got(("nB", 60L)) == ((1L, 0L, 1L)))
    // tick 120: the tick-60 broadcasts have landed — nA now sees nB's
    // 30 s join (remote 1) plus its own two; nB sees nA's 10 s join but
    // NOT the 70 s one (inside the last interval): n_total 2, not 3
    assert(got(("nA", 120L)) == ((2L, 1L, 3L)))
    assert(got(("nB", 120L)) == ((1L, 1L, 2L)))
    // tick 180 — the CONVERGENCE tick, one interval past the last join:
    // the tick-120 broadcasts have landed, every reader sees the true
    // total 3; the grid ends here (later reads would repeat this row)
    assert(got(("nA", 180L)) == ((2L, 1L, 3L)))
    assert(got(("nB", 180L)) == ((1L, 2L, 3L)))
    assert(got.size == 6)
  }

  test("a sparse group's grid is bounded to its OWN active span — no " +
      "full-horizon zero rows, and reads inside the span are unchanged") {
    import spark.implicits._
    // interval 60 s; "hot" is active across ticks 60..660, "sparse" has
    // ONE join whose only active tick is 360 — the r11 global-span grid
    // would emit sparse rows across the whole horizon; the span-bounded
    // grid emits its active tick plus the one convergence tick after it
    val events = Seq(("nA", "hot", 10L), ("nB", "hot", 610L),
      ("nA", "sparse", 310L))
      .toDF("node", "grp", "sec")
      .select(col("node"), col("grp"),
        timestamp_micros(col("sec") * 1000000L).as("ts"))
    val got = Census.memberCounts(events, "node", "grp", "ts", 60L)
      .select(col("read_node"), col("grp"),
        (unix_micros(col("read_ts")) / 1000000L).cast("long"),
        col("n_local"), col("n_remote"), col("n_total"))
      .as[(String, String, Long, Long, Long, Long)].collect()
    val sparseTicks = got.filter(_._2 == "sparse").map(_._3).distinct
    assert(sparseTicks.toSet == Set(360L, 420L),
      s"sparse group leaked outside its span: ${sparseTicks.toSeq}")
    // 2 nodes × ((11 hot ticks + convergence) + (1 sparse + convergence))
    assert(got.length == 28, s"grid size ${got.length}")
    // reads at the sparse tick carry reference semantics: the joiner
    // reads its exact local count, the peer's broadcast is in flight
    val at360 = got.filter(r => r._2 == "sparse" && r._3 == 360L)
      .map(r => r._1 -> ((r._4, r._5, r._6))).toMap
    assert(at360("nA") == ((1L, 0L, 1L)))
    assert(at360("nB") == ((0L, 0L, 0L)))
    // ... and at the convergence tick the broadcast has landed: the
    // remote reader SEES the sparse group's member (the row the plain
    // [min,max] span would have dropped, leaving nB blind forever)
    val at420 = got.filter(r => r._2 == "sparse" && r._3 == 420L)
      .map(r => r._1 -> ((r._4, r._5, r._6))).toMap
    assert(at420("nA") == ((1L, 0L, 1L)))
    assert(at420("nB") == ((0L, 1L, 1L)))
  }

  test("reads converge to the true total once an interval passes with " +
      "no new joins; per-tick totals never exceed the true count") {
    import spark.implicits._
    val n = 40
    val events = (0 until n).map(i =>
        (s"n${i % 4}", s"g${i % 2}", (i * 7 + 1).toLong))
      .toDF("node", "grp", "sec")
      .select(col("node"), col("grp"),
        timestamp_micros(col("sec") * 1000000L).as("ts"))
    val counts = Census.memberCounts(events, "node", "grp", "ts", 30L)
    // never over-count: a read's total is bounded by the exact join count
    // at its tick (eventual consistency can lag, never invent members)
    val rows = counts.select(col("read_node"), col("grp"),
        unix_micros(col("read_ts")) / 1000000L, col("n_total"))
      .as[(String, String, Double, Long)].collect()
    val joinsUpTo = (grp: String, sec: Long) =>
      (0 until n).count(i => s"g${i % 2}" == grp && (i * 7 + 1) <= sec)
    rows.foreach { case (node, grp, tickSec, total) =>
      val exact = joinsUpTo(grp, tickSec.toLong)
      assert(total <= exact,
        s"($node,$grp,$tickSec) over-counted: $total > $exact")
      val atPrev = joinsUpTo(grp, tickSec.toLong - 30L)
      assert(total >= atPrev,
        s"($node,$grp,$tickSec) staler than one interval: $total < $atPrev")
    }
    // each node's OWN joins are always in its read (local exactness):
    // total ≥ local joins at the tick
    val localJoins = (node: String, grp: String, sec: Long) =>
      (0 until n).count(i => s"n${i % 4}" == node &&
        s"g${i % 2}" == grp && (i * 7 + 1) <= sec)
    rows.foreach { case (node, grp, tickSec, total) =>
      assert(total >= localJoins(node, grp, tickSec.toLong))
    }
  }
}
