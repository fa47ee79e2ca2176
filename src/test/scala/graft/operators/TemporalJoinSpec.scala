package graft.operators

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.functions._

class TemporalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // ---------------------------------------------------- asOfBackward

  private def leftDf = Seq(
    (1L, "a", ts("2024-01-01 10:00:00")),
    (2L, "a", ts("2024-01-01 10:05:00")),
    (3L, "a", ts("2024-01-01 09:00:00")), // before any right row
    (4L, "b", ts("2024-01-01 10:00:00"))
  ).toDF("id", "k", "t")

  private def rightDf = Seq(
    ("a", ts("2024-01-01 09:30:00"), 100L),
    ("a", ts("2024-01-01 10:05:00"), 200L), // exact tie with left id=2
    ("b", ts("2024-01-01 09:59:59"), 300L)
  ).toDF("k", "rt", "v")

  test("asOfBackward: latest prior match per key; ties match; no-prior is NULL") {
    val got = TemporalJoin.asOfBackward(leftDf, rightDf, Seq("k"),
        "t", "rt", Seq("v"))
      .select("id", "v").as[(Long, Option[Long])].collect().toMap
    assert(got == Map(
      1L -> Some(100L), // 09:30 is the latest ≤ 10:00
      2L -> Some(200L), // equal timestamp matches
      3L -> None,       // nothing before 09:00
      4L -> Some(300L)))
  }

  test("asOfBackward: tolerance nulls stale matches but keeps the row") {
    val got = TemporalJoin.asOfBackward(leftDf, rightDf, Seq("k"),
        "t", "rt", Seq("v"), toleranceUs = Some(60L * 1000000L))
      .select("id", "v", "asof_ts_us")
      .as[(Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L)._2.isEmpty && got(1L)._3.isEmpty, "30 min > 1 min tolerance")
    assert(got(2L)._2 == Some(200L), "0 s staleness passes")
    assert(got(4L)._2 == Some(300L), "1 s staleness passes")
    assert(got.size == 4, "left-outer: every left row survives")
  }

  test("asOfBackward: duplicate right (key, ts) dedups deterministically") {
    val dupRight = Seq(
      ("a", ts("2024-01-01 09:30:00"), 7L),
      ("a", ts("2024-01-01 09:30:00"), 9L)).toDF("k", "rt", "v")
    val one = leftDf.where($"id" === 1L)
    val got = (0 until 3).map(_ =>
      TemporalJoin.asOfBackward(one, dupRight, Seq("k"), "t", "rt", Seq("v"))
        .select("v").as[Long].head())
    assert(got.forall(_ == 9L), "greatest payload struct wins, every run")
  }

  test("asOfBackward: left columns pass through; payload names preserved") {
    val out = TemporalJoin.asOfBackward(leftDf, rightDf, Seq("k"),
      "t", "rt", Seq("v"))
    assert(out.columns.toSeq == Seq("id", "k", "t", "v", "asof_ts_us"))
  }

  // -------------------------------------------------- rangeJoinBinned

  private def pointsDf = Seq(
    (1L, "a", ts("2024-01-01 10:00:00")), // == start: in
    (2L, "a", ts("2024-01-01 10:09:59")), // just inside
    (3L, "a", ts("2024-01-01 10:10:00")), // == end: out (half-open)
    (4L, "b", ts("2024-01-01 10:00:00"))  // other key
  ).toDF("pid", "k", "t")

  private def intervalsDf = Seq(
    (10L, "a", ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00")),
    (11L, "b", ts("2024-01-01 09:00:00"), ts("2024-01-01 09:00:00")) // empty
  ).toDF("iid", "k", "s", "e")

  test("rangeJoinBinned: half-open containment, per-key, empty interval drops") {
    val got = TemporalJoin.rangeJoinBinned(pointsDf, intervalsDf, Seq("k"),
        "t", "s", "e", binUs = 60L * 1000000L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set(1L -> 10L, 2L -> 10L))
  }

  test("rangeJoinBinned: interval spanning many bins matches each point once") {
    // 10-minute interval, 1-second bins → 600 replicas; each contained
    // point must still pair with it exactly once
    val got = TemporalJoin.rangeJoinBinned(pointsDf, intervalsDf, Seq("k"),
        "t", "s", "e", binUs = 1000000L)
      .groupBy("pid", "iid").count()
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 10L, 1L), (2L, 10L, 1L)))
  }

  // ---------------------------------------------------- plan assertions

  test("asOfForward: earliest later match; ties match; no-later is NULL") {
    val got = TemporalJoin.asOfForward(leftDf, rightDf, Seq("k"),
        "t", "rt", Seq("v"))
      .select("id", "v").as[(Long, Option[Long])].collect().toMap
    assert(got == Map(
      1L -> Some(200L), // 10:05 is the earliest ≥ 10:00
      2L -> Some(200L), // equal timestamp matches
      3L -> Some(100L), // 09:30 is the earliest ≥ 09:00
      4L -> None))      // b has nothing at/after 10:00
  }

  test("asOfForward: tolerance nulls far-future matches, row stays") {
    val got = TemporalJoin.asOfForward(leftDf, rightDf, Seq("k"),
        "t", "rt", Seq("v"), toleranceUs = Some(600L * 1000000L))
      .select("id", "v").as[(Long, Option[Long])].collect().toMap
    assert(got(1L) == Some(200L), "5 min ahead within 10 min tolerance")
    assert(got(3L).isEmpty, "30 min ahead nulled, row kept")
    assert(got.size == 4)
  }

  test("asOfForward: duplicate right (key, ts) dedups to MIN payload") {
    val right = Seq(
      ("a", ts("2024-01-01 10:30:00"), 9L),
      ("a", ts("2024-01-01 10:30:00"), 2L)).toDF("k", "rt", "v")
    val got = TemporalJoin.asOfForward(leftDf, right, Seq("k"),
        "t", "rt", Seq("v"))
      .select("id", "v").as[(Long, Option[Long])].collect().toMap
    assert(got(1L) == Some(2L), "min struct wins at the same tick")
  }

  test("plans: asOf is window-over-union, range join is equi — never a loop join") {
    val asOf = TemporalJoin.asOfBackward(leftDf, rightDf, Seq("k"),
      "t", "rt", Seq("v"))
    val asOfPlan = asOf.queryExecution.executedPlan.toString
    assert(!asOfPlan.contains("Join"),
      s"as-of must compile to union+window, not any join:\n$asOfPlan")
    assert(asOfPlan.contains("Window"), asOfPlan)
    val fwdPlan = TemporalJoin.asOfForward(leftDf, rightDf, Seq("k"),
      "t", "rt", Seq("v")).queryExecution.executedPlan.toString
    assert(!fwdPlan.contains("Join") && fwdPlan.contains("Window"),
      s"forward as-of shares the union+window shape:\n$fwdPlan")
    val rj = TemporalJoin.rangeJoinBinned(pointsDf, intervalsDf, Seq("k"),
      "t", "s", "e", binUs = 60L * 1000000L)
    val rjPlan = rj.queryExecution.executedPlan.toString
    assert(!rjPlan.contains("BroadcastNestedLoopJoin")
      && !rjPlan.contains("CartesianProduct"),
      s"range join must stay an equi-join on (key, bin):\n$rjPlan")
  }

  test("rangeJoinBinned: bin wider than every interval still exact") {
    val got = TemporalJoin.rangeJoinBinned(pointsDf, intervalsDf, Seq("k"),
        "t", "s", "e", binUs = 86400L * 1000000L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set(1L -> 10L, 2L -> 10L))
  }
}
