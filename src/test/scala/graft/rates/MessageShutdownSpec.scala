package graft.rates

import graft.SparkSpec
import java.sql.Timestamp

/** Pins the message-rate shutdown semantics (realtime_channel.ex:291-302):
  * count-then-check, terminal per-socket shutdown at the first delivery of
  * a flagged tick, dropped messages never counting. */
class MessageShutdownSpec extends SparkSpec {

  private val base = 1700000000L

  private def ts(sec: Long): Timestamp = new Timestamp((base + sec) * 1000L)

  test("flagged tick kills each alive socket at its first delivery; drops don't count") {
    val rows = Seq(
      // tick 0 (creation): len=0, no flag → both deliveries ok, both count
      (ts(0), 1L, "t", 1L), (ts(0), 2L, "t", 2L),
      // tick 1: sum=2 ≥ len=1 → flagged: u1 dies at its first delivery
      (ts(1), 1L, "t", 3L),
      // same tick, same socket: already dead → dropped, NOT counted
      (ts(1), 1L, "t", 4L),
      // u2 still alive, dies at its own first delivery of the tick
      (ts(1), 2L, "t", 5L),
      // tick 2: window sum=4 (both tick-0 oks + both tick-1 shutdowns —
      // shutdown messages WERE delivered and counted) ≥ len=2 → flagged;
      // a socket first seen mid-flag dies immediately
      (ts(2), 3L, "t", 6L),
      // tick 4: window [2,3] holds only u3's shutdown count = 1 < len=2 →
      // unflagged. The tick-1 drop must not have counted (else sum=2
      // would flag): dead u3 still dropped, fresh u4 delivers ok
      (ts(4), 3L, "t", 7L), (ts(4), 4L, "t", 8L))
    val got = Rates.messageRateShutdown(
        spark.createDataFrame(rows).toDF("ts", "user_id", "event_type", "event_id"),
        "event_type", "user_id", "ts", "event_id",
        limitNum = 1L, limitDen = 1L, tickSec = 1L, windowTicks = 2)
      .collect().map(r => r.getLong(1) -> r.getString(2)).toMap
    assert(got(1L) == "ok" && got(2L) == "ok")
    assert(got(3L) == "shutdown" && got(4L) == "dropped" && got(5L) == "shutdown")
    assert(got(6L) == "shutdown")
    assert(got(7L) == "dropped" && got(8L) == "ok")
  }
}
