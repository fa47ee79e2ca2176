package graft.rates

import graft.SparkSpec
import java.sql.Timestamp

/** Pins the poller's load shed (replication_poller.ex:404-421):
  * per-poll all-or-nothing drop under a triggered counter, fan-out-
  * WEIGHTED counting, >= trigger arithmetic, empty polls never shed. */
class PollShedSpec extends SparkSpec {

  private val base = 1700000000L

  private def ts(sec: Long): Timestamp = new Timestamp((base + sec) * 1000L)

  private def run(rows: Seq[(Timestamp, String, Long, Long, Long)])
      : Map[Long, String] = {
    val df = spark.createDataFrame(rows)
      .toDF("ts", "tenant", "poll_id", "n", "weight")
    Rates.pollShed(df, "tenant", "ts", "poll_id", "n", "weight",
        limitNum = 5L, limitDen = 1L, tickSec = 1L, windowTicks = 2)
      .collect().map(r => r.getLong(1) -> r.getString(2)).toMap
  }

  test("fan-out weight drives the trigger; shed drops the whole poll " +
      "and counts nothing; empty polls under a trigger stay ok") {
    val got = run(Seq(
      // tick 0: ONE change matching 6 subscribers counts 6 — fan-out
      // weighting, not change count
      (ts(0), "t", 1L, 1L, 6L),
      // tick 1: sum=6 >= 5·1 (the flag's >=) → shed, nothing counted
      (ts(1), "t", 2L, 3L, 9L),
      // same tick, EMPTY poll: triggered but nothing to skip → ok
      (ts(1), "t", 3L, 0L, 0L),
      // tick 3: the tick-0 bucket pruned (window 2), the shed poll
      // never counted → sum=0 → delivers
      (ts(3), "t", 4L, 2L, 4L)))
    assert(got(1L) == "ok")
    assert(got(2L) == "shed")
    assert(got(3L) == "ok")
    assert(got(4L) == "ok")
  }

  test("streaming twin: the ring crosses micro-batches; parity with " +
      "the batch replay") {
    import graft.rates.AdmissionStream.{Decision, PollAttempt}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val s = spark
    import s.implicits._
    val batches = Seq(
      // mb 1, tick 0: one heavy poll counts its fan-out weight
      Seq(PollAttempt("t", 0L, 1L, 1L, 6L)),
      // mb 2, tick 1: the mb-1 weight crossed the boundary → shed;
      // the empty poll stays ok; tick 3: drained → ok
      Seq(PollAttempt("t", 1000000L, 2L, 3L, 9L),
        PollAttempt("t", 1000000L, 3L, 0L, 0L),
        PollAttempt("t", 3000000L, 4L, 2L, 4L)))
    val input = MemoryStream[PollAttempt](spark)
    val q = AdmissionStream.pollShedStream(input.toDS(),
        limitNum = 5L, limitDen = 1L, tickSec = 1L, windowTicks = 2)
      .writeStream.format("memory").queryName("poll_shed_out")
      .outputMode(OutputMode.Append).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      val streamed = spark.table("poll_shed_out").as[Decision].collect()
        .map(d => d.tie -> d.status).toMap
      assert(streamed == Map(1L -> "ok", 2L -> "shed", 3L -> "ok",
        4L -> "ok"))
      val batchDf = spark.createDataFrame(batches.flatten.map(p =>
          (new Timestamp(p.us / 1000L), p.tenant, p.tie, p.n, p.weight)))
        .toDF("ts", "tenant", "poll_id", "n", "weight")
      val replayed = Rates.pollShed(batchDf, "tenant", "ts", "poll_id",
          "n", "weight", limitNum = 5L, limitDen = 1L, tickSec = 1L,
          windowTicks = 2)
        .collect().map(r => r.getLong(1) -> r.getString(2)).toMap
      assert(replayed == streamed)
    } finally q.stop()
  }
}
