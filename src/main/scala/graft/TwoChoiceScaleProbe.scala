package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for `Muster.twoChoicePlacement`. Decision record (r12):
  * the original rendezvous top-2 draw — tenants × broadcast(nodes) →
  * per-tenant rank window — measured 47.4 s at 100k tenants × 300
  * nodes and 111.8 s at 1M × 300 (32 cores, superlinear in nodes).
  * The [[graft.plans.TwoChoicePick]] running-top-2 kernel that
  * replaced it reads 6.9 s at 1M × 300 (16×) and 16.7 s at 10M × 300
  * — linear in tenants and digest-bound: 3B md5s / 16.7 s ≈ 178 ns
  * per digest per thread vs 116 ns for a bare single-thread JDK
  * MessageDigest loop on the same box, i.e. at the hash hardware
  * rate. The probe aggregates OVER the pick fields: an earlier
  * `count()` harness read 1.2 s because Catalyst pruned the kernel
  * projection entirely — a bare count times only the distinct. Kept
  * as a main so the reading is reproducible; pass `tenants:nodes`
  * pairs as args to probe other points (default: the decision matrix
  * plus a 10M-tenant headroom point). */
object TwoChoiceScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val points: Seq[(Long, Int)] =
      if (args.nonEmpty) args.toSeq.map { a =>
        val Array(t, n) = a.split(":"); (t.toLong, n.toInt)
      }
      else Seq((100000L, 30), (100000L, 300), (1000000L, 30),
        (1000000L, 300), (10000000L, 300))
    for ((nTenants, nNodes) <- points) {
      val tenants = spark.range(nTenants).select(
        concat(lit("t"), col("id").cast("string")).as("tenant"),
        concat(lit("n"), (col("id") % nNodes).cast("string")).as("current"))
      val nodes = spark.range(nNodes).select(
        concat(lit("n"), col("id").cast("string")).as("node"),
        (col("id") * 3 % 17).cast("int").as("load"))
      val t0 = System.nanoTime()
      // aggregate OVER the pick fields: a bare count() lets Catalyst
      // prune the placement projection and times only the distinct
      val r = graft.presence.Muster.twoChoicePlacement(
          tenants, "tenant", nodes, "node", "load", "current")
        .agg(count(lit(1)).as("rows"), sum(length(col("assigned"))),
          sum(when(col("moved"), 1).otherwise(0)).as("moved"))
        .collect()(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[twochoice] tenants=$nTenants nodes=$nNodes rows=${r.getLong(0)} " +
        f"moved=${r.getLong(2)} wall_sec=$sec%.1f")
    }
    spark.stop()
  }
}
