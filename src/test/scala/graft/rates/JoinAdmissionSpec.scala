package graft.rates

import graft.SparkSpec
import java.sql.Timestamp

/** Pins the check_tenant replay semantics (tenant_rate_limiters.ex:12-43):
  * check order, first-N connection slots, trigger-on-tick with the flag
  * consulted BEFORE counting, and admitted-only ring counting. */
class JoinAdmissionSpec extends SparkSpec {

  private val base = 1700000000L // epoch seconds; ticks are epoch-aligned

  private def ts(sec: Long): Timestamp = new Timestamp((base + sec) * 1000L)

  private def run(rows: Seq[(Timestamp, Long, String, Long)],
      maxConcurrent: Int): Map[Long, String] = {
    val df = spark.createDataFrame(rows)
      .toDF("ts", "user_id", "event_type", "event_id")
    Rates.joinAdmission(df, "event_type", "user_id", "ts", "event_id",
        maxConcurrent = maxConcurrent, limitNum = 1L, limitDen = 1L,
        tickSec = 1L, windowTicks = 2)
      .collect().map(r => r.getLong(1) -> r.getString(2)).toMap
  }

  test("trigger-on-tick: burst tick admits, flag gates later ticks, ring drains") {
    // limit = 1/s avg over a 2-tick ring; one user, far under the conn cap
    val rows = Seq(
      (ts(0), 1L, "t", 1L), (ts(0), 1L, "t", 2L), (ts(0), 1L, "t", 3L),
      (ts(1), 1L, "t", 4L), // len=1, sum=3 → 3 ≥ 1 → denied
      (ts(2), 1L, "t", 5L), // len=2, ring {0:3} → 3 ≥ 2 → denied
      (ts(3), 1L, "t", 6L), // tick-0 bucket expired, sum=0 → ok
      (ts(4), 1L, "t", 7L), // sum=1 (tick 3), len=2 → 1 < 2 → ok
      (ts(5), 1L, "t", 8L)) // sum=2 (ticks 3,4) → 2 ≥ 2 → denied
    val got = run(rows, maxConcurrent = 10)
    // the creation tick always admits: the counter is born untriggered and
    // the flag can't move until a tick boundary passes
    assert(got(1L) == "ok" && got(2L) == "ok" && got(3L) == "ok")
    assert(got(4L) == "too_many_joins" && got(5L) == "too_many_joins")
    assert(got(6L) == "ok" && got(7L) == "ok")
    assert(got(8L) == "too_many_joins")
  }

  test("connection slots are first-N by first-attempt order; denied joins don't count") {
    val rows = Seq(
      (ts(0), 1L, "t", 1L),  // user 1 claims slot 1
      (ts(10), 2L, "t", 2L), // user 2 claims slot 2
      (ts(20), 3L, "t", 3L), // user 3 over cap → too_many_connections
      (ts(20), 3L, "t", 4L), // every later attempt of user 3 denied too
      // user 3's denials land at tick 20 — INSIDE tick 21's [19,20]
      // window — so if denials fed the ring, sum would be 2 ≥ len=2 and
      // tie 5 would be shed; admitted-only counting keeps the window empty
      (ts(21), 1L, "t", 5L))
    val got = run(rows, maxConcurrent = 2)
    assert(got(1L) == "ok" && got(2L) == "ok")
    assert(got(3L) == "too_many_connections" && got(4L) == "too_many_connections")
    assert(got(5L) == "ok")
  }

  test("tenants are independent counters") {
    val rows = Seq(
      (ts(0), 1L, "a", 1L), (ts(0), 2L, "a", 2L),
      (ts(1), 1L, "a", 3L),  // a is over: sum=2, len=1
      (ts(1), 1L, "b", 4L),  // b's creation tick — admits
      (ts(2), 1L, "b", 5L))  // b: sum=1, len=1 → 1 ≥ 1 → denied
    val got = run(rows, maxConcurrent = 10)
    assert(got(3L) == "too_many_joins")
    assert(got(4L) == "ok")
    assert(got(5L) == "too_many_joins")
  }
}
