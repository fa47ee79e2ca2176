package graft.rates

import graft.SparkSpec
import java.sql.Timestamp

/** Pins the full batch-endpoint composition (batch_broadcast.ex:51-95):
  * suspend clause first, all-or-nothing changeset, checks on the full
  * size but the ring fed only by DELIVERED (authorized) messages. */
class BatchPipelineSpec extends SparkSpec {

  private val base = 1700000000L

  private def ts(sec: Long): Timestamp = new Timestamp((base + sec) * 1000L)

  private def run(rows: Seq[(Timestamp, String, Long, Long, Long,
      Boolean, Boolean)], num: Long = 1L): Map[Long, String] = {
    val df = spark.createDataFrame(rows)
      .toDF("ts", "tenant", "batch_id", "n", "n_auth", "suspend",
        "any_invalid")
    Rates.batchPipelineAdmission(df, "tenant", "ts", "batch_id", "n",
        "n_auth", "suspend", "any_invalid", limitNum = num, limitDen = 1L,
        tickSec = 1L, windowTicks = 2)
      .collect().map(r => r.getLong(1) -> r.getString(2)).toMap
  }

  test("the ring counts delivered messages, not batch size: a " +
      "mostly-denied batch pressures the window only by what it sent") {
    // limit 2/s. Tick 0 delivers 1 of 3 offered messages (2 denied by
    // the per-topic probe); n-weighted counting would read sum=3 > 2
    // at tick 1 and flag — delivered-only counting reads 1 and admits.
    val got = run(Seq(
      (ts(0), "t", 1L, 2L, 0L, false, false),
      (ts(0), "t", 2L, 1L, 1L, false, false),
      (ts(1), "t", 3L, 1L, 1L, false, false)), num = 2L)
    assert(got(1L) == "ok" && got(2L) == "ok")
    assert(got(3L) == "ok") // sum=1, not 3: the denied messages never counted
    // and the rate arm itself, on delivered counts (limit 1/s)
    val rate = run(Seq(
      (ts(0), "r", 1L, 1L, 1L, false, false),
      (ts(0), "r", 2L, 1L, 1L, false, false),
      (ts(1), "r", 3L, 1L, 1L, false, false)))
    assert(rate(1L) == "ok" && rate(2L) == "ok")
    assert(rate(3L) == "rate_limited") // sum=2 > 1·1
  }

  test("suspend outranks invalid outranks rate; too-large uses the " +
      "FULL size even when most is denied") {
    val got = run(Seq(
      (ts(0), "t", 1L, 1L, 1L, true, true),   // suspended wins
      (ts(0), "t", 2L, 1L, 1L, false, true),  // one bad message → batch
      // n=5 drives the too-large check even though only 1 would deliver
      (ts(0), "t", 3L, 5L, 1L, false, false),
      (ts(0), "t", 4L, 1L, 1L, false, false)))
    assert(got(1L) == "forbidden_suspended")
    assert(got(2L) == "invalid_batch")
    assert(got(3L) == "batch_too_large")
    assert(got(4L) == "ok")
  }
}
