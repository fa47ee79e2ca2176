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
}
