package graft.rates

import graft.SparkSpec
import graft.rates.AdmissionStream.{Attempt, Decision}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** The live check_tenant gate: ring + slot state crossing micro-batch
  * boundaries, and decision parity with the batch replay twin. */
class AdmissionStreamSpec extends SparkSpec {
  import spark.implicits._

  private val attempts = Seq(
    // batch 1: burst claims the window; users 1 and 2 claim both slots
    Seq(Attempt("t", 1L, 0L, 1L), Attempt("t", 1L, 0L, 2L),
      Attempt("t", 2L, 0L, 3L)),
    // batch 2: the batch-1 burst gates tick 1 (ring carried across),
    // tick 3 drains; user 3 finds the slots taken
    Seq(Attempt("t", 1L, 1L, 4L), Attempt("t", 3L, 2L, 5L),
      Attempt("t", 1L, 3L, 6L)))

  test("ring and slots carry across micro-batches; parity with batch twin") {
    implicit val s = spark
    val input = MemoryStream[Attempt](spark)
    val q = AdmissionStream(input.toDS(), maxConcurrent = 2,
        limitNum = 1L, limitDen = 1L, tickSec = 1L, windowTicks = 2)
      .writeStream.format("memory").queryName("adm_out")
      .outputMode(OutputMode.Append).start()
    try {
      attempts.foreach { b => input.addData(b); q.processAllAvailable() }
      val streamed = spark.table("adm_out").as[Decision].collect()
        .map(d => d.tie -> d.status).toMap
      assert(streamed(1L) == "ok" && streamed(2L) == "ok" && streamed(3L) == "ok")
      assert(streamed(4L) == "too_many_joins")     // gated by batch-1 burst
      assert(streamed(5L) == "too_many_connections")
      assert(streamed(6L) == "ok")                 // tick-0 bucket expired
      // parity: the batch replay over the same log decides identically
      val batchDf = spark.createDataFrame(attempts.flatten.map(a =>
          (new java.sql.Timestamp(a.epochSec * 1000L), a.user, a.tenant, a.tie)))
        .toDF("ts", "user_id", "event_type", "event_id")
      val replayed = Rates.joinAdmission(batchDf, "event_type", "user_id",
          "ts", "event_id", maxConcurrent = 2, limitNum = 1L, limitDen = 1L,
          tickSec = 1L, windowTicks = 2)
        .collect().map(r => r.getLong(1) -> r.getString(2)).toMap
      assert(replayed == streamed)
    } finally q.stop()
  }

  test("shutdown twin: deaths are absorbing across batches; parity with batch replay") {
    implicit val s = spark
    val batches = Seq(
      // batch 1: tick-0 burst counts (len=0 → all ok)
      Seq(Attempt("t", 1L, 0L, 1L), Attempt("t", 2L, 0L, 2L)),
      // batch 2: tick 1 flagged (sum=2 ≥ len=1) → u1 dies at first
      // delivery, stays dead; u2 dies at its own
      Seq(Attempt("t", 1L, 1L, 3L), Attempt("t", 1L, 1L, 4L),
        Attempt("t", 2L, 1L, 5L)),
      // batch 3: tick 4 — window [2,3] holds only the two shutdown
      // counts at tick 1? no: pruned (1 < 4−2) → empty → unflagged;
      // dead u1 still dropped, fresh u3 delivers
      Seq(Attempt("t", 1L, 4L, 6L), Attempt("t", 3L, 4L, 7L)))
    val input = MemoryStream[Attempt](spark)
    val q = AdmissionStream.shutdownStream(input.toDS(),
        limitNum = 1L, limitDen = 1L, tickSec = 1L, windowTicks = 2)
      .writeStream.format("memory").queryName("shut_out")
      .outputMode(OutputMode.Append).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      val streamed = spark.table("shut_out").as[Decision].collect()
        .map(d => d.tie -> d.status).toMap
      assert(streamed(1L) == "ok" && streamed(2L) == "ok")
      assert(streamed(3L) == "shutdown" && streamed(4L) == "dropped")
      assert(streamed(5L) == "shutdown")
      assert(streamed(6L) == "dropped") // death crossed two batch boundaries
      assert(streamed(7L) == "ok")
      val batchDf = spark.createDataFrame(batches.flatten.map(a =>
          (new java.sql.Timestamp(a.epochSec * 1000L), a.user, a.tenant, a.tie)))
        .toDF("ts", "user_id", "event_type", "event_id")
      val replayed = Rates.messageRateShutdown(batchDf, "event_type",
          "user_id", "ts", "event_id", limitNum = 1L, limitDen = 1L,
          tickSec = 1L, windowTicks = 2)
        .collect().map(r => r.getLong(1) -> r.getString(2)).toMap
      assert(replayed == streamed)
    } finally q.stop()
  }
}
