package graft.rates

import graft.SparkSpec
import java.sql.Timestamp

/** Pins check_rate_limit (batch_broadcast.ex:170-184): the two 429 modes
  * in reference cond order, strict `>` on both, tick-snapshot avg (same
  * tick ⇒ same avg), and admitted-only batch-weighted ring counting. */
class BatchAdmissionSpec extends SparkSpec {

  private val base = 1700000000L

  private def ts(sec: Long): Timestamp = new Timestamp((base + sec) * 1000L)

  private def run(rows: Seq[(Timestamp, String, Long, Long)])
      : Map[Long, String] = {
    val df = spark.createDataFrame(rows)
      .toDF("ts", "event_type", "batch_id", "n")
    Rates.batchAdmission(df, "event_type", "ts", "batch_id", "n",
        limitNum = 1L, limitDen = 1L, tickSec = 1L, windowTicks = 2)
      .collect().map(r => r.getLong(1) -> r.getString(2)).toMap
  }

  test("three statuses: boundary admit, tick-snapshot avg, rate_limited, drain") {
    val rows = Seq(
      // creation tick, L=1: 1·1+0 > 1 is FALSE → the boundary batch admits
      (ts(0), "t", 1L, 1L),
      // same tick: snapshot avg still 0 (GenCounter adds don't move the
      // RateCounter until its timer tick) → admits; ring{0: 2}
      (ts(0), "t", 2L, 1L),
      // tick 1: sum=2 > L=1 → the avg check itself trips first
      (ts(1), "t", 3L, 1L),
      // tick 4: ring drained (window 2), len=2: size 2 → 2·2+0 > 2 → too big
      (ts(4), "t", 4L, 2L),
      // same tick: the DENIED batch above must not have counted → sum=0,
      // and 1·2+0 > 2 is FALSE → admits
      (ts(4), "t", 5L, 1L))
    val got = run(rows)
    assert(got(1L) == "ok" && got(2L) == "ok")
    assert(got(3L) == "rate_limited")
    assert(got(4L) == "batch_too_large")
    assert(got(5L) == "ok")
  }

  test("denial modes are checked in reference order: avg check wins") {
    val rows = Seq(
      (ts(0), "t", 1L, 1L), (ts(0), "t", 2L, 1L),
      // sum=2 > L=1 AND size 5 would also be too large — reference cond
      // order reports the avg breach
      (ts(1), "t", 3L, 5L))
    assert(run(rows)(3L) == "rate_limited")
  }

  test("tenants hold independent counters") {
    val rows = Seq(
      (ts(0), "a", 1L, 1L), (ts(0), "a", 2L, 1L),
      (ts(1), "a", 3L, 1L),
      (ts(1), "b", 4L, 1L))
    val got = run(rows)
    assert(got(3L) == "rate_limited")
    assert(got(4L) == "ok")
  }
}
