package graft
import org.apache.spark.sql.SparkSession

/** Calibration probe for [[KneeFresh.QuietBandRowsPerSec]]: N fresh
  * readings of the raw-engine floor control on the current host. Run on
  * a QUIET host to (re-)establish the committed band. */
object RawFloorProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = if (args.nonEmpty) args(0).toInt else 4
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.cdc.StreamLatency.run(spark, 1000, 4, 100L, 2) // warm
    for (i <- 1 to n) {
      val rf = graft.cdc.StreamLatency.rawFloor(spark,
        KneeFresh.ControlRate, KneeFresh.ControlSeconds)
      println(s"[rawfloor] pass=$i rate=${KneeFresh.ControlRate} rows=${rf.rows} busy_ms=${rf.busyMs} " +
        s"batches=${rf.batches} p50_ms=${rf.p50Ms} max_ms=${rf.maxMs} " +
        s"rows_per_sec=${rf.rowsPerSec} drain_tail_ms=${rf.drainTailMs}")
    }
    spark.stop()
  }
}
