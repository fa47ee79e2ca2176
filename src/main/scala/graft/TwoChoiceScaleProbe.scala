package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for `Muster.twoChoicePlacement`: the rendezvous top-2
  * draw is tenants × broadcast(nodes) → per-tenant rank window — at 1M
  * tenants × 300 nodes that is 300M md5 evaluations THROUGH a window
  * sort. Measures 100k and 1M tenants at 30 and 300 nodes to decide
  * whether the fan needs a running-top-2 kernel like RingOwner. */
object TwoChoiceScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (nTenants <- Seq(100000L, 1000000L); nNodes <- Seq(30, 300)) {
      val tenants = spark.range(nTenants).select(
        concat(lit("t"), col("id").cast("string")).as("tenant"),
        concat(lit("n"), (col("id") % nNodes).cast("string")).as("current"))
      val nodes = spark.range(nNodes).select(
        concat(lit("n"), col("id").cast("string")).as("node"),
        (col("id") * 3 % 17).cast("int").as("load"))
      val t0 = System.nanoTime()
      val n = graft.presence.Muster.twoChoicePlacement(
        tenants, "tenant", nodes, "node", "load", "current").count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[twochoice] tenants=$nTenants nodes=$nNodes rows=$n wall_sec=$sec%.1f")
    }
    spark.stop()
  }
}
