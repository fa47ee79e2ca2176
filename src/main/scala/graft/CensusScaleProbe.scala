package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for [[graft.presence.Census.memberCounts]]'s span-bounded
  * grid (round-12 verdict task 2): census groups are pubsub topics —
  * millions at production scale, most active for a sliver of the
  * horizon — so the r11 global-span grid (nodes × groups × EVERY tick
  * in the global [min, max]) materialized almost-all-zero rows: its
  * size is |nodes| × |groups| × horizon ticks regardless of activity.
  * The span-bounded grid is |nodes| × Σ_g span(g): proportional to the
  * groups' own activity spread, not the horizon.
  *
  * Input: a synthetic sparse-topic census — `--groups` topics (default
  * 200k), each with ~5 joins inside its own ~2-tick window scattered
  * across a 720-tick horizon, 10 nodes. Prints the measured output rows
  * + wall seconds, and the EXACT size the r11 global-span grid would
  * have materialized for the same input (deterministic arithmetic:
  * that shape's grid is the full cross product by construction). */
object CensusScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nGroups = if (args.nonEmpty) args(0).toLong else 200000L
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val interval = 3600L
    val horizonTicks = 720L
    val nNodes = 10L
    val joinsPerGroup = 5L
    // each group's activity window starts at a hash-scattered tick and
    // its joins land inside ~2 ticks of it — the sparse-topic shape
    val events = spark.range(nGroups * joinsPerGroup).select(
      concat(lit("n"), (col("id") % nNodes).cast("string")).as("node"),
      concat(lit("g"), (col("id") % nGroups).cast("string")).as("grp"),
      timestamp_micros((
        ((abs(hash((col("id") % nGroups).cast("string"))) % (horizonTicks - 2L))
          * interval +
          (col("id") / nGroups) * (2L * interval / joinsPerGroup) + 1L)
          * 1000000L).cast("long")).as("ts"))
    val t0 = System.nanoTime()
    val rows = graft.presence.Census.memberCounts(
      events, "node", "grp", "ts", interval).count()
    val sec = (System.nanoTime() - t0) / 1e9
    // what the r11 global-span grid materializes for this input, by
    // construction (distinct nodes × distinct groups × global tick span)
    val e = events.select(col("node"), col("grp"),
      (expr(s"(unix_micros(ts) + ${interval * 1000000L - 1}) div ${interval * 1000000L}"))
        .as("tick"))
    val span = e.agg((max("tick") - min("tick") + 1L).as("s"))
      .head().getLong(0)
    val oldRows = nNodes * nGroups * span
    println(s"[censusscale] groups=$nGroups nodes=$nNodes " +
      s"horizon_ticks=$span events=${nGroups * joinsPerGroup} " +
      s"grid_rows_span_bounded=$rows grid_rows_global_span=$oldRows " +
      f"ratio=${oldRows.toDouble / rows}%.1f wall_sec=$sec%.1f")
    spark.stop()
  }
}
