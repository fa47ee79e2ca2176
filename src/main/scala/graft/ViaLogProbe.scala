package graft
import org.apache.spark.sql.SparkSession
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
