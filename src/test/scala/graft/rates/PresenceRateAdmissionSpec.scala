package graft.rates

import graft.SparkSpec
import java.sql.Timestamp

/** Pins limit_presence_event (presence_handler.ex:201-212): strict `>`
  * off the raw avg — at-the-limit admits, unlike the joins gate's `>=`
  * triggered flag — with check-before-count and admitted-only rings. */
class PresenceRateAdmissionSpec extends SparkSpec {

  private val base = 1700000000L

  private def ts(sec: Long): Timestamp = new Timestamp((base + sec) * 1000L)

  private def rows = Seq(
    (ts(0), "t", 1L),  // creation tick: len=0 → ok; ring{0:1}
    (ts(1), "t", 2L),  // len=1, sum=1: avg == limit exactly → STRICT > admits
    (ts(2), "t", 3L))  // len=2, sum=2: still == limit → admits

  test("a window sitting exactly at the limit still admits (strict >)") {
    val got = Rates.presenceRateAdmission(
        spark.createDataFrame(rows).toDF("ts", "event_type", "event_id"),
        "event_type", "ts", "event_id",
        limitNum = 1L, limitDen = 1L, tickSec = 1L, windowTicks = 2)
      .collect().map(r => r.getLong(1) -> r.getString(2)).toMap
    assert(got == Map(1L -> "ok", 2L -> "ok", 3L -> "ok"))
  }

  test("the joins gate trips on the identical log (>= boundary contrast)") {
    val df = spark.createDataFrame(rows.map { case (t, ten, id) => (t, 1L, ten, id) })
      .toDF("ts", "user_id", "event_type", "event_id")
    val joins = Rates.joinAdmission(df, "event_type", "user_id", "ts",
        "event_id", maxConcurrent = 10, limitNum = 1L, limitDen = 1L,
        tickSec = 1L, windowTicks = 2)
      .collect().map(r => r.getLong(1) -> r.getString(2)).toMap
    // tie 2 trips the >= flag; its denial doesn't count, so the window at
    // tick 2 holds 1 < len=2 and tie 3 recovers — both halves contrast
    // with the presence gate admitting the whole log
    assert(joins(2L) == "too_many_joins" && joins(3L) == "ok")
  }

  test("over the limit sheds the whole tick, drains admitted-only") {
    val burst = Seq(
      (ts(0), "t", 1L), (ts(0), "t", 2L), (ts(0), "t", 3L), // creation: ok ×3
      (ts(1), "t", 4L),  // sum=3 > 1·1 → shed
      (ts(3), "t", 5L),  // window [1,2] empty (tick-0 expired, shed not counted) → ok
      (ts(4), "t", 6L))  // sum=1 NOT > 2 → ok
    val got = Rates.presenceRateAdmission(
        spark.createDataFrame(burst).toDF("ts", "event_type", "event_id"),
        "event_type", "ts", "event_id",
        limitNum = 1L, limitDen = 1L, tickSec = 1L, windowTicks = 2)
      .collect().map(r => r.getLong(1) -> r.getString(2)).toMap
    assert(got(1L) == "ok" && got(2L) == "ok" && got(3L) == "ok")
    assert(got(4L) == "rate_limited")
    assert(got(5L) == "ok" && got(6L) == "ok")
  }
}
