package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The observability surface: bucket-boundary pins against the
  * reference's Peep lists, Prometheus cumulative-le histogram semantics,
  * and the live recording paths (delivery-sink meter + streaming-query
  * listener) feeding the queryable snapshot. */
class TelemetrySpec extends SparkSpec {

  test("bucket boundaries pin the reference's Peep lists " +
      "(tenant.ex:56,125,190,195,200)") {
    assert(Telemetry.BroadcastLatencyBucketsMs == Seq(10L, 250L, 5000L))
    assert(Telemetry.ReplayBucketsMs == Seq(10L, 250L, 5000L, 15000L))
    assert(Telemetry.AuthorizationBucketsMs == Seq(10L, 250L, 5000L, 15000L))
    assert(Telemetry.PollerDurationBucketsMs == Seq(250L, 500L, 1000L,
      3000L, 5000L, 10000L, 25000L, 100000L, 500000L, 1000000L, 3000000L))
    assert(Telemetry.PayloadSizeBuckets == Seq(250L, 500L, 1000L, 3000L,
      5000L, 10000L, 25000L, 100000L, 500000L, 1000000L, 3000000L))
  }

  test("histogram: cumulative upper-inclusive le, +Inf == count, " +
      "sum/count companions, monotone") {
    import spark.implicits._
    // boundary values land IN their bucket (le is upper-inclusive):
    // 10 → le=10; 11 → le=250; 250 → le=250; 5000 → le=5000; 5001 → +Inf
    val samples = Seq(("t0", 3L), ("t0", 10L), ("t0", 11L), ("t0", 250L),
      ("t0", 5000L), ("t0", 5001L), ("t1", 9000L))
      .toDF("tenant", "v")
    val h = Telemetry.histogram(samples, col("v"),
        Telemetry.BroadcastLatencyBucketsMs, Seq("tenant"))
      .collect()
      .map(r => (r.getAs[String]("tenant"), r.getAs[String]("le")) ->
        (r.getAs[Long]("n_le"), r.getAs[Long]("total"),
          r.getAs[Long]("sum_value"))).toMap
    assert(h(("t0", "10")) == ((2L, 6L, 10275L)))
    assert(h(("t0", "250")) == ((4L, 6L, 10275L)))
    assert(h(("t0", "5000")) == ((5L, 6L, 10275L)))
    assert(h(("t0", "+Inf")) == ((6L, 6L, 10275L)))
    // a tenant whose every sample overflows: zeros below, count at +Inf
    assert(h(("t1", "10"))._1 == 0L)
    assert(h(("t1", "5000"))._1 == 0L)
    assert(h(("t1", "+Inf")) == ((1L, 1L, 9000L)))
    // cumulative monotonicity across the whole table
    val series = Seq("10", "250", "5000", "+Inf")
    Seq("t0", "t1").foreach { t =>
      val ns = series.map(le => h((t, le))._1)
      assert(ns == ns.sorted, s"non-monotone cumulative counts for $t: $ns")
    }
  }

  test("MeteredSink: commit→broadcast latency and payload size recorded " +
      "per frame, frames still reach the inner sink") {
    val registry = "tele-sink-" + System.nanoTime()
    val inner = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val sink = new Telemetry.MeteredSink(registry, "t0",
      new CdcStream.DeliverySink {
        def offer(d: CdcStream.Delivery): Unit = inner.add(d.frame)
      })
    val commit = System.currentTimeMillis() - 42L
    val frame = s"""{"commit_timestamp":"$commit","record":{"a":1}}"""
    sink.offer(CdcStream.Delivery("sub1", frame))
    sink.offer(CdcStream.Delivery("sub2", """{"no_stamp":true}"""))
    assert(inner.size == 2, "metering must not swallow frames")
    val snap = Telemetry.snapshot(spark, registry)
      .groupBy("metric").agg(count(lit(1)).as("n"), min("value").as("mn"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // latency only for the stamped frame; ≥ the 42 ms the stamp implies
    assert(snap("broadcast_latency_committed_at_ms")._1 == 1L)
    assert(snap("broadcast_latency_committed_at_ms")._2 >= 42.0)
    assert(snap("payload_size_bytes")._1 == 2L)
    assert(snap("payload_size_bytes")._2 ==
      math.min(frame.length, 17).toDouble) // the shorter unstamped frame
    Telemetry.clear(registry)
  }

  test("pruneVacantTenants: stale-vacant series dropped, re-occupied " +
      "and fresh-vacant tenants spared — the MetricsCleaner sweep") {
    import spark.implicits._
    val sweep = java.sql.Timestamp.valueOf("2024-01-15 00:00:00")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val lifecycle = Seq(
      // stale vacant (vacant since Jan 10, threshold 2 days) → pruned
      ("t_stale", "vacant", ts("2024-01-10 00:00:00")),
      // went vacant long ago but RE-OCCUPIED before the sweep → spared
      ("t_back", "vacant", ts("2024-01-09 00:00:00")),
      ("t_back", "occupied", ts("2024-01-14 00:00:00")),
      // vacant, but inside the threshold window → spared (this sweep)
      ("t_fresh", "vacant", ts("2024-01-14 12:00:00")),
      // lifecycle event AFTER the sweep must not count
      ("t_stale", "occupied", ts("2024-01-16 00:00:00")))
      .toDF("tenant", "state", "ts")
    val samples = Seq(
      ("t_stale", 10.0), ("t_back", 20.0), ("t_fresh", 30.0),
      ("t_nolifecycle", 40.0)) // tenant with no lifecycle rows → spared
      .toDF("tenant", "value")
    val kept = Telemetry.pruneVacantTenants(samples, lifecycle,
        sweep, thresholdSec = 172800L)
      .select("tenant").as[String].collect().toSet
    assert(kept == Set("t_back", "t_fresh", "t_nolifecycle"),
      s"got $kept")
  }

  test("listener: per-trigger batch duration and row counts land in the " +
      "snapshot; histogram folds over them") {
    import spark.implicits._
    val registry = "tele-listener-" + System.nanoTime()
    val l = Telemetry.listener(registry, "t0")
    spark.streams.addListener(l)
    try {
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[Int](spark)
      val q = input.toDF().writeStream.format("noop")
        .outputMode("append").start()
      try {
        input.addData(1 to 100)
        q.processAllAvailable()
        input.addData(1 to 50)
        q.processAllAvailable()
      } finally q.stop()
      // listener-bus delivery is async: poll until both metrics landed
      val deadline = System.currentTimeMillis() + 15000L
      def counts() = Telemetry.snapshot(spark, registry)
        .groupBy("metric").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      while (counts().getOrElse("batch_duration_ms", 0L) < 2 &&
        System.currentTimeMillis() < deadline) Thread.sleep(100L)
      val c = counts()
      assert(c.getOrElse("batch_duration_ms", 0L) >= 2L,
        s"expected ≥2 trigger durations, got $c")
      assert(c.getOrElse("batch_rows", 0L) >= 2L)
      // rows metric saw the actual input volumes
      val rows = Telemetry.snapshot(spark, registry)
        .where(col("metric") === "batch_rows")
        .agg(sum("value")).collect().head.getDouble(0)
      assert(rows >= 150.0, s"expected ≥150 input rows counted, got $rows")
      // the poller-duration histogram over recorded samples: total == the
      // number of triggers, +Inf row closes the series
      val h = Telemetry.histogram(
          Telemetry.snapshot(spark, registry)
            .where(col("metric") === "batch_duration_ms"),
          col("value"), Telemetry.PollerDurationBucketsMs, Seq("tenant"))
        .where(col("le") === "+Inf").collect().head
      assert(h.getAs[Long]("n_le") == h.getAs[Long]("total"))
    } finally {
      spark.streams.removeListener(l)
      Telemetry.clear(registry)
    }
  }
}
