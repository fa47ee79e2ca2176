package graft
import org.apache.spark.sql.SparkSession

/** Outbound-transport-seam ceiling probe: the StreamLatency harness with
  * every frame produced through the durable [[graft.sources
  * .ReplayLogSink]] (latency clocked after the produce), swept over
  * rate × partition-count, HOST-HEALTH STAMPED (same rawFloor control
  * and band as [[KneeFresh]], with cooldown retries — r14: an unstamped
  * grid on a 0.67-health box read half the seam with nothing saying so).
  *
  * Current findings (r14, superseding the r11 scaladoc's "320k only,
  * 640k fails at any partition count on per-record produce cost" —
  * that mechanism was removed by the r12 chunked produce staging +
  * r13 bulk body read):
  *  - 640k/s SUSTAINS at 32 partitions on an in-band host (r14 run at
  *    health 0.975→1.126: p99 999 ms; the r13 judge's quiet-host probe:
  *    640k at BOTH 8 and 32 partitions, p99 907/931) and is
  *    boundary-marginal at 8 partitions (r14: p99 1,193) — the 640k
  *    point flips on host state within a ~20% band, exactly like the
  *    in-memory knee's 1.28M point.
  *  - the grid TOPS OUT at real failures, not a cap: 1.28M reads p99
  *    5.5–24 s and 2.56M p99 18–46 s — while delivered == sent at
  *    every point, so the durable seam in this range is LATENCY-
  *    bounded (micro-batches queueing behind the produce), never
  *    throughput-bounded/lossy; the SLO ceiling sits between 640k and
  *    1.28M.
  * Run on a QUIET host (fresh JVM, nothing else on the box) — and
  * trust the printed health stamps over the assumption. */
object ViaLogProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.cdc.StreamLatency.run(spark, 1000, 3, 100L, 1) // warm
    // host-health control (same band as [[KneeFresh]]): the seam grid is
    // only meaningful on a quiet host, and "quiet" must be attested, not
    // assumed — r13's driver grid read half the quiet-host seam on a
    // 0.798-health box with nothing in the output saying so
    def health(): Double =
      if (KneeFresh.bandAppliesFor(cpus))
        graft.cdc.StreamLatency.rawFloor(spark, KneeFresh.ControlRate,
          KneeFresh.ControlSeconds).rowsPerSec.toDouble /
          KneeFresh.QuietBandRowsPerSec
      else -1.0
    var h0 = health()
    var retries = 0
    while (h0 >= 0 && h0 < KneeFresh.HealthMarginal &&
        retries < KneeFresh.MaxRetries) {
      System.err.println(f"[vialog] host degraded (health=$h0%.3f) — " +
        s"cooling down ${KneeFresh.CooldownMs / 1000} s")
      Thread.sleep(KneeFresh.CooldownMs)
      retries += 1
      val again = health()
      if (again > h0) h0 = again
    }
    println(f"[vialog] host_health_start=$h0%.3f cooldown_retries=$retries")
    // default grid refined r15 (verdict task 4): the r14 claim read
    // "ceiling between 640k and 1.28M" — the 768k/896k/1M points turn
    // the range into a number. Arg override: pass explicit rates.
    val rates =
      if (args.nonEmpty) args.map(_.toInt).toSeq
      else Seq(320000, 640000, 768000, 896000, 1000000, 1280000)
    for (rate <- rates; parts <- Seq(8, 32)) {
      System.gc(); Thread.sleep(200L)
      val topic = s"vl-$rate-$parts-" + System.nanoTime()
      val r = graft.cdc.StreamLatency.run(spark, rate, 6, 100L, 2,
        viaLog = Some((topic, parts)))
      graft.sources.ReplayLog.delete(topic)
      println(s"[vialog] rate=$rate parts=$parts sent=${r.nSent} delivered=${r.nDelivered} " +
        s"p50=${r.steady.p50} p95=${r.steady.p95} p99=${r.steady.p99} sustained=${r.nDelivered == r.nSent && r.steady.p99 <= 1000}")
    }
    val h1 = health()
    println(f"[vialog] host_health_end=$h1%.3f")
    spark.stop()
  }
}
