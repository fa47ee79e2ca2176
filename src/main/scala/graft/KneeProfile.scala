package graft

import graft.cdc.{CdcStream, StreamLatency}
import graft.model.Subscription
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Decompose the streaming knee's first failing rate: what is the
  * binding resource at 640k changes/s?
  *
  * Method: run the StreamLatency harness shape (same feeder, same
  * pipeline, same 100 ms trigger) at the last-sustained and
  * first-failing rates, under two delivery sinks — the standard
  * latency-stamping sink and a NO-OP sink — and read the per-batch
  * engine stats off the bus:
  *  - trigger occupancy (Σ batch duration / wall): 1.0 means the engine
  *    never idles — micro-batches queue faster than they execute, the
  *    p99_degraded signature;
  *  - pipeline throughput (Σ rows / Σ batch duration): the per-row
  *    processing ceiling; a rate above it cannot be sustained at ANY
  *    trigger interval;
  *  - the timing-vs-noop delta: how much of the per-row cost is the
  *    sink offer path (sample-queue contention) vs the fused
  *    match+shape+encode pipeline itself.
  * One line per (rate, sink) for COVERAGE. */
object KneeProfile {

  private def window(spark: SparkSession, rate: Int, seconds: Int,
      sinkName: String, sink: CdcStream.DeliverySink,
      triggerMs: Long = 100L): Unit = {
    import spark.implicits._
    System.gc(); Thread.sleep(200L)
    val input = MemoryStream[StreamLatency.Change](spark)
    val subs = Seq(Subscription("bench", "public", "t", Nil))
    val dataSchema = Seq.empty[StreamLatency.Change].toDS().toDF()
      .drop("change_type", "commit_timestamp").schema
    val bus = CdcStream.MemoryBus()
    val q = CdcStream.start(input.toDF(), subs, dataSchema, "t",
      pk = Seq("id"), bus = bus, triggerMs = triggerMs, deliverTo = Some(sink))
    val t0 = System.nanoTime()
    try {
      // single-block feeding (feedChunks = 1): the profile's sink legs
      // keep the HISTORICAL 2-partition feeder so their readings stay
      // comparable to the r11 decomposition they extend; the feeder leg
      // in main() sweeps chunk counts explicitly
      StreamLatency.feedAdaptive(input, rate, seconds, feedChunks = 1)
      val feedWallMs = (System.nanoTime() - t0) / 1000000L
      q.processAllAvailable()
      val drainWallMs = (System.nanoTime() - t0) / 1000000L
      val bs = bus.batches.filter(b => b.nChanges > 0 && b.durationMs >= 0)
      val durs = bs.map(_.durationMs).sorted
      def pct(q: Double) = if (durs.isEmpty) -1L
        else durs(math.min(durs.length - 1, (q * durs.length).toInt))
      val busy = durs.sum
      val rows = bs.map(_.nChanges).sum
      println(f"[kneeprofile] rate=$rate sink=$sinkName batches=${bs.length}" +
        f" dur_p50=${pct(0.5)} dur_p95=${pct(0.95)} dur_max=${durs.lastOption.getOrElse(-1L)}" +
        f" rows_per_batch=${if (bs.isEmpty) 0L else rows / bs.length}" +
        f" throughput_rows_per_sec=${if (busy == 0) -1L else rows * 1000L / busy}" +
        f" occupancy_feed=${busy.toDouble / feedWallMs}%.2f" +
        f" drain_tail_ms=${drainWallMs - feedWallMs}")
    } finally q.stop()
  }

  /** Engine-floor control: [[StreamLatency.rawFloor]] — the same feeder
    * into a bare foreachBatch-accumulator query, NO match/shape/encode/
    * fan-out. The delta to the no-op-sink pipeline window is the
    * pipeline's own per-row cost; the raw number is the MemoryStream +
    * micro-batch-engine floor that no pipeline optimization can pass
    * (shared with [[KneeFresh]]'s host-health stamp). */
  private def windowRaw(spark: SparkSession, rate: Int, seconds: Int): Unit = {
    val rf = StreamLatency.rawFloor(spark, rate, seconds)
    println(f"[kneeprofile] rate=$rate sink=rawcount batches=${rf.batches}" +
      f" dur_p50=${rf.p50Ms} dur_max=${rf.maxMs} rows=${rf.rows}" +
      f" throughput_rows_per_sec=${rf.rowsPerSec}" +
      f" occupancy_feed=${rf.busyMs.toDouble / rf.feedWallMs}%.2f" +
      f" drain_tail_ms=${rf.drainTailMs}")
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val noop = new CdcStream.DeliverySink { def offer(d: CdcStream.Delivery): Unit = () }
    // warm
    window(spark, 1000, 3, "warm", noop)
    for (rate <- Seq(320000, 640000)) {
      window(spark, rate, 6, "timing", new StreamLatency.TimingSink("prof-" + rate))
      // the timing window above only times; nothing reads the samples —
      // discard the stripes (and tombstone the runId so a straggler
      // offer can't re-register them)
      StreamLatency.discard("prof-" + rate)
      window(spark, rate, 6, "noop", noop)
      windowRaw(spark, rate, 6)
    }
    // trigger-width leg: the decomposition names per-trigger fixed cost
    // as the binding resource, so widening the trigger should buy rate
    // at a bounded latency price (floor ≈ trigger/2) — measure it
    for (trig <- Seq(100L, 200L, 400L); rate <- Seq(640000, 1280000)) {
      System.gc(); Thread.sleep(200L)
      val r = StreamLatency.run(spark, rate, 6, trig, 2)
      println(s"[kneeprofile] trigger=$trig rate=$rate sent=${r.nSent} " +
        s"delivered=${r.nDelivered} p50=${r.steady.p50} p95=${r.steady.p95} " +
        s"p99=${r.steady.p99} sustained=${r.nDelivered == r.nSent && r.steady.p99 <= 1000}")
    }
    // feeder-partition leg: MemoryStream yields one partition per
    // addData block (~2/trigger with the 1-chunk feeder), so the
    // pipeline may be task-starved, not CPU-bound — chunked feeding
    // models a partitioned source and measures the true parallel knee
    for (chunks <- Seq(1, 8, 16); rate <- Seq(640000, 1280000)) {
      System.gc(); Thread.sleep(200L)
      val r = StreamLatency.run(spark, rate, 6, 100L, 2, feedChunks = chunks)
      println(s"[kneeprofile] chunks=$chunks rate=$rate sent=${r.nSent} " +
        s"delivered=${r.nDelivered} p50=${r.steady.p50} p95=${r.steady.p95} " +
        s"p99=${r.steady.p99} sustained=${r.nDelivered == r.nSent && r.steady.p99 <= 1000}")
    }
    spark.stop()
  }
}
