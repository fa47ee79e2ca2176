package graft
import org.apache.spark.sql.SparkSession

/** Outbound-transport-seam ceiling probe: the StreamLatency harness with
  * every frame produced through the durable [[graft.sources
  * .ReplayLogSink]] (latency clocked after the produce), swept over
  * rate × partition-count. Round-11 findings this main produced: the
  * seam sustains 320k/s p99 640 ms ONLY with partitions ≈ producer
  * threads (8 partitions fail the same rate on the per-partition
  * produce lock, p99 1,073); 640k fails at any partition count — the
  * per-record produce cost (UTF-8 encode + record copy + uncontended
  * lock) caps the seam between 320k and 640k/s. Run on a QUIET host
  * (fresh JVM, nothing else on the box) or the numbers are host noise. */
object ViaLogProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.cdc.StreamLatency.run(spark, 1000, 3, 100L, 1) // warm
    for (rate <- Seq(160000, 320000, 640000); parts <- Seq(8, 32)) {
      System.gc(); Thread.sleep(200L)
      val topic = s"vl-$rate-$parts-" + System.nanoTime()
      val r = graft.cdc.StreamLatency.run(spark, rate, 6, 100L, 2,
        viaLog = Some((topic, parts)))
      graft.sources.ReplayLog.delete(topic)
      println(s"[vialog] rate=$rate parts=$parts sent=${r.nSent} delivered=${r.nDelivered} " +
        s"p50=${r.steady.p50} p95=${r.steady.p95} p99=${r.steady.p99} sustained=${r.nDelivered == r.nSent && r.steady.p99 <= 1000}")
    }
    spark.stop()
  }
}
