package graft.rates

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** Pins the single-broadcast gate chain (single_broadcast.ex:64-82):
  * suspension before everything, validation (with the size check INSIDE
  * it) before the rate gate, `avg >= max` (not batch's strict `>`),
  * write-authz last, admitted-only unit counting. */
class SingleAdmissionSpec extends SparkSpec {

  private val base = 1700000000L

  private def ts(sec: Long): Timestamp = new Timestamp((base + sec) * 1000L)

  private def run(rows: Seq[(Timestamp, String, Long, Boolean, Boolean,
      Boolean)], num: Long = 1L): Map[Long, String] = {
    val df = spark.createDataFrame(rows)
      .toDF("ts", "tenant", "req_id", "suspend", "valid", "write_allowed")
    Rates.singleAdmission(df, "tenant", "ts", "req_id", "suspend",
        "valid", "write_allowed", limitNum = num, limitDen = 1L,
        tickSec = 1L, windowTicks = 2)
      .collect().map(r => r.getLong(1) -> r.getString(2)).toMap
  }

  test("gate order: suspended wins over invalid, invalid over rate, " +
      "rate over forbidden; >= boundary rejects AT the limit") {
    val rows = Seq(
      // tick 0 admits (sum 0); ring{0: 1}
      (ts(0), "t", 1L, false, true, true),
      // tick 1: sum=1, l=1 → 1 >= 1·1 — the >= boundary DENIES (the
      // batch endpoint's strict > would admit here)
      (ts(1), "t", 2L, false, true, true),
      // same flagged tick: suspension and validation still rank above
      // the rate verdict
      (ts(1), "t", 3L, true, true, true),
      (ts(1), "t", 4L, false, false, true),
      // tick 4: ring drained → authz is the last gate
      (ts(4), "t", 5L, false, true, false),
      // denied/invalid rows never counted → still admits
      (ts(4), "t", 6L, false, true, true))
    val got = run(rows)
    assert(got(1L) == "ok")
    assert(got(2L) == "rate_limited")
    assert(got(3L) == "forbidden_suspended")
    assert(got(4L) == "invalid")
    assert(got(5L) == "forbidden")
    assert(got(6L) == "ok")
  }

  test("suspended requests advance the counter clock but never count") {
    val rows = Seq(
      // a suspended request anchors first_tick at 0 — without it, the
      // tick-2 window length would be 1 and req 3 would be denied
      (ts(0), "t", 1L, true, true, true),
      // tick 1: len=1, l=1, sum=0 → admits; ring{1:1}
      (ts(1), "t", 2L, false, true, true),
      // tick 2: len=min(2, 2-0)=2, l=2, sum=1 → 1 >= 1·2 false →
      // admits (anchored at tick 1 instead: l=1, 1 >= 1 would deny)
      (ts(2), "t", 3L, false, true, true),
      // tick 3: sum=2 >= 1·2 → rate_limited
      (ts(3), "t", 4L, false, true, true))
    val got = run(rows)
    assert(got(1L) == "forbidden_suspended")
    assert(got(2L) == "ok" && got(3L) == "ok")
    assert(got(4L) == "rate_limited")
  }

  test("validRequest changeset: content-type inclusion, presence not " +
      "non-emptiness, kb*1000+500 strict fit for both encodings") {
    import graft.messages.SingleBroadcast.validRequest
    val rows = spark.createDataFrame(Seq(
      ("json", true, 1500L, 1),        // exactly at the limit → fits
      ("json", true, 1501L, 1),        // one over → invalid
      ("binary", true, 0L, 1),         // empty binary present → valid
      ("binary", false, 0L, 1),        // absent payload → invalid
      ("text/plain", true, 10L, 1),    // content-type inclusion
      ("binary", true, 2500L, 2)))     // kb scales the limit
      .toDF("content_type", "payload_present", "payload_bytes",
        "max_payload_kb")
    val got = rows.select(validRequest(col("content_type"),
        col("payload_present"), col("payload_bytes"),
        col("max_payload_kb")).as("v"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(got == Seq(true, false, true, false, false, true))
  }
}
