package graft
import org.apache.spark.sql.SparkSession
object KneeProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.cdc.StreamLatency.run(spark, 1000, 4, 100L, 2) // warm
    val rates = Seq(80000, 160000, 320000, 640000, 1280000)
    (1 to 2).foreach { pass =>
      val kn = graft.cdc.StreamLatency.knee(spark, rates, seconds = 6,
        triggerMs = 100L, warmupSec = 2, p99SloMs = 1000L)
      println(s"[knee] pass=$pass max_sustained=${kn.maxSustainedRate} mode=${kn.failureMode} " +
        kn.points.map(p => s"${p.ratePerSec}:p99=${p.steady.p99}:s=${p.sustained}:w=${p.windows}").mkString(" "))
    }
    spark.stop()
  }
}
