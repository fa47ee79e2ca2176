package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for `Muster.routerAssignments` (round-12 verdict task
  * 6): the router fan evaluates |groups| × |ring| md5 pairs (ring =
  * nodes × 128 vnodes), O(|ring|) per group where a binary search over
  * the sorted ring would be O(log |ring|). At sf0.01 (2,470 groups)
  * that's noise; at census scale groups are pubsub topics. This probe
  * times the fan at 100k and 1M synthetic groups (7 nodes → 896-vnode
  * ring) to decide whether the crossJoin shape needs a ring-lookup
  * kernel, and — when the kernel exists — times both paths. */
object MusterScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (nGroups <- Seq(100000L, 1000000L)) {
      val members = spark.range(nGroups * 2).select(
        concat(lit("g"), (col("id") % nGroups).cast("string")).as("grp"),
        concat(lit("n"), (col("id") % 7).cast("string")).as("node"))
      val t0 = System.nanoTime()
      // aggregate OVER router and occupancy: a bare count() lets
      // Catalyst prune both the RingOwner projection and the
      // collect_set, timing only the distinct of the group keys
      val r = graft.presence.Muster.routerAssignments(members, "grp", "node")
        .agg(count(lit(1)).as("rows"), countDistinct(col("router")),
          sum(length(col("occupancy"))))
        .collect()(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[musterscale] groups=$nGroups ring=896 rows=${r.getLong(0)} " +
        f"routers=${r.getLong(1)} wall_sec=$sec%.1f")
    }
    spark.stop()
  }
}
