package graft.rates

import graft.SparkSpec
import graft.rates.RateCounterStream.{Event, RateTick}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Reference RateCounter semantics: ring sum, avg = sum/len/tick, sticky
  * limit trigger, state carried across micro-batches. */
class RateCounterStreamSpec extends SparkSpec {
  import spark.implicits._

  test("ring avg and limit trigger across micro-batches") {
    implicit val s = spark
    val input = MemoryStream[Event](spark)
    // windowTicks=4 for a readable test; limit avg 1.0 events/sec
    val q = RateCounterStream(input.toDS(), limitAvg = 1.0, windowTicks = 4)
      .writeStream.format("memory").queryName("rc_out")
      .outputMode(OutputMode.Append).start()
    try {
      // t=100: 3 events → len=1, avg=3.0 → triggered
      input.addData(Event("k", 100), Event("k", 100), Event("k", 100))
      q.processAllAvailable()
      // t=102: 1 event → len=3 (t=100..102), sum=4, avg≈1.333 → triggered
      // t=105: 1 event → window (102,105]: only t=105 count=1... ring keeps
      //        t>101: {102:1,105:1}, len capped 4, sum=2, avg=0.5 → released
      input.addData(Event("k", 102))
      q.processAllAvailable()
      input.addData(Event("k", 105))
      q.processAllAvailable()
      val got = spark.table("rc_out").as[RateTick].collect()
        .map(t => t.tickSec -> t).toMap
      assert(got(100).sum == 3 && got(100).avg == 3.0 && got(100).triggered)
      assert(got(102).sum == 4 && got(102).avg == 1.333333 && got(102).triggered)
      assert(got(105).sum == 2 && got(105).avg == 0.5 && !got(105).triggered)
    } finally q.stop()
  }

  test("keys are independent") {
    implicit val s = spark
    val input = MemoryStream[Event](spark)
    val q = RateCounterStream(input.toDS(), limitAvg = 0.5, windowTicks = 2)
      .writeStream.format("memory").queryName("rc_out2")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Event("a", 10), Event("a", 10), Event("b", 10))
      q.processAllAvailable()
      val got = spark.table("rc_out2").as[RateTick].collect()
        .map(t => t.key -> t).toMap
      assert(got("a").sum == 2 && got("a").triggered)
      assert(got("b").sum == 1 && got("b").triggered) // 1/1 = 1.0 ≥ 0.5
    } finally q.stop()
  }

  test("idle reap: a returning key restarts from an empty ring") {
    implicit val s = spark
    val input = MemoryStream[Event](spark)
    val q = RateCounterStream(input.toDS(), limitAvg = 1.5, windowTicks = 4,
        idleTimeoutMs = 100L)
      .writeStream.format("memory").queryName("rc_reap_out")
      .outputMode(OutputMode.Append).start()
    // sequence via SparkSpec's sink-polling awaitRows
    // (processAllAvailable hangs under ProcessingTimeTimeout)
    try {
      input.addData(Event("k", 100), Event("k", 100), Event("k", 100),
        Event("k", 100))
      awaitRows("rc_reap_out", 1L) // tick 100: sum=4, avg=4.0, triggered
      Thread.sleep(600L) // empty batches fire k's timeout → ring removed
      input.addData(Event("k", 102))
      awaitRows("rc_reap_out", 2L)
      val got = spark.table("rc_reap_out").as[RateTick].collect()
        .map(t => t.tickSec -> t).toMap
      assert(got(100).sum == 4 && got(100).triggered)
      // reaped: fresh ring {102:1}, len=1, avg=1.0 < 1.5 → released.
      // kept state would read sum=5, len=3, avg≈1.667 → still triggered.
      assert(got(102).sum == 1 && !got(102).triggered,
        s"returning key must restart from an empty ring: ${got(102)}")
    } finally q.stop()
  }
}
