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
    // a crashed run is recorded as -1 (and the name lands in `failed`),
    // never as its elapsed-time-to-failure: a query that starts dying
    // quickly must not masquerade as a fast warm run in warm_min
    val failed = scala.collection.mutable.TreeSet.empty[String]
    def time(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Double = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] $name failed: $e"); false }
      val dt = (System.nanoTime() - t0) / 1e9
      // drop query-persisted intermediates so caches never accumulate
      // across the suite (cleanup charged to the query that cached)
      spark.catalog.clearCache()
      if (ok) dt else { failed += name; -1.0 }
    }
    val sorted = SparkEntry.queries.toSeq.sortBy(_._1)
    // pass 1: one-shot numbers (what every prior round reported — first
    // execution of each plan in this session, JIT/codegen state included)
    val oneshot = sorted.map { case (name, fn) => name -> time(name, fn) }
    // pass 2: one warm re-run of everything; pass 3: a second warm run
    // for queries still at >= 1 s (where one-shot noise has repeatedly
    // produced multi-second false regressions). warm_min is the per-query
    // minimum over the SUCCESSFUL warm runs — the adjudication number: a
    // one-shot outlier with a warm_min in its usual band is JIT/GC noise,
    // a warm_min that moved is a real regression; any failed run anywhere
    // forces warm_min to -1 so failure is visible, not averaged away.
    val warm1 = sorted.map { case (name, fn) => name -> time(name, fn) }.toMap
    val oneshotMap = oneshot.toMap
    val warm2 = sorted
      .filter { case (name, _) =>
        math.min(oneshotMap(name), warm1(name)) >= 1.0 }
      .map { case (name, fn) => name -> time(name, fn) }.toMap
    val warmMin = sorted.map { case (name, _) =>
      val runs = warm1(name) +: warm2.get(name).toSeq
      name -> (if (failed(name)) -1.0 else runs.min)
    }
    def jmap(xs: Seq[(String, Double)]): String =
      xs.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = if (oneshot.nonEmpty) oneshot.map(_._2).filter(_ >= 0).sum
                else 0.0
    // streaming SLO: commit→broadcast latency at the reference's implied
    // design point (1,000 changes/s, 100 ms poll) — the one number the
    // batch queries above can't measure — plus a rate sweep upward to
    // find the knee (max sustained rate and how the first failure fails)
    val stream = try {
      // throwaway warm pass first: after ~10 min of batch sweeps the
      // streaming path's codegen/JIT state is cold (code-cache churn),
      // and r8 recorded a 1000/s steady block failing its own p99 SLO
      // while the sweep seconds later sustained 160× the rate — the
      // recorded number must reflect steady state, not session history
      graft.cdc.StreamLatency.run(spark, ratePerSec = 1000,
        seconds = 4, triggerMs = 100L, warmupSec = 2)
      val r = graft.cdc.StreamLatency.run(spark, ratePerSec = 1000,
        seconds = 8, triggerMs = 100L, warmupSec = 3)
      val baseOk = r.nDelivered == r.nSent && r.steady.p99 <= 1000L
      // the 160k reference point re-run through the OUTBOUND ReplayLog
      // sink (frames produced to a partitioned log instead of the bus,
      // latency clocked after the produce) — proves the real transport
      // seam doesn't regress the sustained-rate story. Runs BEFORE the
      // knee sweep: a failed tail point leaves millions of queued frames
      // whose collection would poison this window (same reason knee()
      // quiesces the allocator per window); one retry guards the
      // one-unlucky-GC-pause case the sweep's majority vote covers.
      def vlOnce() = {
        System.gc(); Thread.sleep(200L)
        val topic = "bench-out-" + System.nanoTime()
        val rep = graft.cdc.StreamLatency.run(spark, ratePerSec = 160000,
          seconds = 6, triggerMs = 100L, warmupSec = 2,
          viaLog = Some((topic, 8)))
        graft.sources.ReplayLog.delete(topic)
        rep
      }
      val vl0 = vlOnce()
      val vl =
        if (vl0.nDelivered == vl0.nSent && vl0.steady.p99 <= 1000L) vl0
        else vlOnce()
      val vlOk = vl.nDelivered == vl.nSent && vl.steady.p99 <= 1000L
      // sweep until failure: 32-cpu runs sustain 10k/s, so the tail
      // points exist to actually FIND the knee there (the sweep stops at
      // the first failing rate, so cheap machines pay only the early
      // points). Each rate is now a 2-of-3 window majority (see
      // StreamLatency.knee), so the low-rate grid is coarser to keep the
      // sweep's wall-clock flat — the curve is flat there anyway.
      val kn = graft.cdc.StreamLatency.knee(spark,
        rates = Seq(2000, 10000, 40000, 160000, 320000, 640000),
        seconds = 6,
        triggerMs = 100L, warmupSec = 2, p99SloMs = 1000L)
      val maxSustained =
        math.max(if (baseOk) r.ratePerSec else 0, kn.maxSustainedRate)
      val sweep = kn.points.map(p =>
        s"""{"rate_per_sec":${p.ratePerSec},"n_sent":${p.nSent},""" +
          s""""n_delivered":${p.nDelivered},"p50_ms":${p.steady.p50},""" +
          s""""p95_ms":${p.steady.p95},"p99_ms":${p.steady.p99},""" +
          s""""sustained":${p.sustained},"windows":${p.windows}}""")
        .mkString("[", ",", "]")
      s""","stream":{"rate_per_sec":${r.ratePerSec},"seconds":${r.seconds},""" +
        s""""n_sent":${r.nSent},"n_delivered":${r.nDelivered},""" +
        s""""p50_ms":${r.steady.p50},"p95_ms":${r.steady.p95},""" +
        s""""p99_ms":${r.steady.p99},"max_ms":${r.steady.max},""" +
        s""""overall_p95_ms":${r.overall.p95},""" +
        s""""batch_duration_p95_ms":${r.batchDurationP95Ms},""" +
        s""""sweep":$sweep,"max_sustained_rate":$maxSustained,""" +
        s""""via_log_sink":{"rate_per_sec":${vl.ratePerSec},""" +
        s""""n_sent":${vl.nSent},"n_delivered":${vl.nDelivered},""" +
        s""""p50_ms":${vl.steady.p50},"p95_ms":${vl.steady.p95},""" +
        s""""p99_ms":${vl.steady.p99},"sustained":$vlOk},""" +
        s""""failure_mode":"${kn.failureMode}"}"""
    } catch {
      // NonFatal only: an OOM/linkage error must crash loudly, and a
      // failed measurement must not masquerade as "not requested"
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] stream SLO measurement failed: $e")
        ""
    }
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${jmap(oneshot)},"warm_min":${jmap(warmMin)},"failed":$failedJson,"sf":"$sfDir"$stream}""")
    spark.stop()
  }
}
