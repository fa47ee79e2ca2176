package graft.rates

import graft.SparkSpec
import java.sql.Timestamp

/** Pins limit_client_presence_event (presence_handler.ex:214-236): the
  * anchored window, deny-without-consume at cap, strict > expiry, and
  * reset-on-contact. */
class ClientWindowLimitSpec extends SparkSpec {

  private val base = 1700000000L

  private def ts(sec: Long): Timestamp = new Timestamp((base + sec) * 1000L)

  private def run(rows: Seq[(Timestamp, Long, String, Long)])
      : Map[Long, String] =
    Rates.clientWindowLimit(
        spark.createDataFrame(rows).toDF("ts", "user_id", "event_type", "event_id"),
        keyCols = Seq("event_type", "user_id"), tsCol = "ts",
        tieCol = "event_id", maxCalls = 2, windowMs = 10000L)
      .collect().map(r => r.getLong(1) -> r.getString(2)).toMap

  test("anchored window: cap denies without consuming, expiry resets on contact") {
    val got = run(Seq(
      (ts(0), 1L, "t", 1L),   // anchors [0, 10]: counter 1 → ok
      (ts(3), 1L, "t", 2L),   // counter 2 → ok
      (ts(5), 1L, "t", 3L),   // at cap → denied, counter stays 2
      (ts(9), 1L, "t", 4L),   // still inside, still capped → denied
      (ts(10), 1L, "t", 5L),  // NOT strictly past reset_at (us == anchor+W) → denied
      (ts(11), 1L, "t", 6L),  // strictly past → window resets, counter 1 → ok
      (ts(12), 1L, "t", 7L))) // counter 2 in the NEW window → ok
    assert(got(1L) == "ok" && got(2L) == "ok")
    assert(got(3L) == "rate_limited" && got(4L) == "rate_limited")
    assert(got(5L) == "rate_limited")
    assert(got(6L) == "ok" && got(7L) == "ok")
  }

  test("the anchor chain differs from tumbling buckets: straddling burst stays capped") {
    // tumbling 10 s buckets would grant a fresh allowance at t=10; the
    // anchored window [4, 14] keeps the burst capped until strictly past 14
    val got = run(Seq(
      (ts(4), 1L, "t", 1L), (ts(8), 1L, "t", 2L),
      (ts(12), 1L, "t", 3L), (ts(14), 1L, "t", 4L),
      (ts(15), 1L, "t", 5L)))
    assert(got(1L) == "ok" && got(2L) == "ok")
    assert(got(3L) == "rate_limited" && got(4L) == "rate_limited")
    assert(got(5L) == "ok")
  }

  test("keys are independent") {
    val got = run(Seq(
      (ts(0), 1L, "t", 1L), (ts(1), 1L, "t", 2L), (ts(2), 1L, "t", 3L),
      (ts(2), 2L, "t", 4L),   // other user, same tenant: own window
      (ts(2), 1L, "u", 5L)))  // same user, other tenant: own window
    assert(got(3L) == "rate_limited")
    assert(got(4L) == "ok" && got(5L) == "ok")
  }
}
