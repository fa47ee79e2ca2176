package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}
import scala.jdk.CollectionConverters._

/** The engine's observability surface — the reference's day-2 histograms
  * and counters as a queryable telemetry DataFrame, fed by the streaming
  * pipeline itself.
  *
  * Reference surface (/root/reference/OBSERVABILITY_METRICS.md:115-125):
  * `realtime_tenants_broadcast_from_database_latency_committed_at_bucket`
  * (commit→broadcast per tenant), `realtime_replication_poller_query_
  * duration_bucket` (per-trigger poll cost), `realtime_tenants_replay_
  * bucket`, `realtime_(tenants_)payload_size_bucket`, and the
  * `realtime_channel_{input,output}_bytes` counters. Producers:
  * `lib/realtime/tenants/replication_connection.ex:379-382,442-448`
  * (latency measured Begin-commit_timestamp → post-publish) and the
  * PromEx plugins (`lib/realtime/monitoring/prom_ex/plugins/tenant.ex`),
  * whose Peep bucket boundaries are pinned here as constants.
  *
  * Shape: three pieces, mirroring how a cluster deployment separates
  * concerns —
  *  1. a per-JVM sample RECORDER ([[record]]/[[MeteredSink]]/
  *     [[listener]]) — on a real cluster this is the per-executor
  *     histogram state the metrics pipeline scrapes; local-mode tests and
  *     Bench read it directly, only the aggregation transport differs;
  *  2. [[snapshot]] — the recorded samples as a DataFrame, the "scrape";
  *  3. [[histogram]] — the distributed bucket aggregation (one shuffle
  *     per key-set, Prometheus cumulative `le` semantics) any sample
  *     DataFrame can be folded through, which is also what the oracle
  *     checks: histogramming is a pure query over a sample table, so the
  *     same operator serves recorded telemetry and synthetic oracles.
  */
object Telemetry {

  // ---- Peep bucket boundaries, pinned from the reference -------------

  /** BroadcastFromDatabase.Buckets (tenant.ex:195), milliseconds. */
  val BroadcastLatencyBucketsMs: Seq[Long] = Seq(10L, 250L, 5000L)
  /** Replay.Buckets (tenant.ex:200), milliseconds. */
  val ReplayBucketsMs: Seq[Long] = Seq(10L, 250L, 5000L, 15000L)
  /** PolicyAuthorization.Buckets (tenant.ex:190), milliseconds. */
  val AuthorizationBucketsMs: Seq[Long] = Seq(10L, 250L, 5000L, 15000L)
  /** Replication.Buckets — poller query duration (tenant.ex:125), ms. */
  val PollerDurationBucketsMs: Seq[Long] =
    Seq(250L, 500L, 1000L, 3000L, 5000L, 10000L, 25000L, 100000L,
      500000L, 1000000L, 3000000L)
  /** PayloadSize.Buckets (tenant.ex:56), bytes. */
  val PayloadSizeBuckets: Seq[Long] =
    Seq(250L, 500L, 1000L, 3000L, 5000L, 10000L, 25000L, 100000L,
      500000L, 1000000L, 3000000L)

  // ---- sample recorder ----------------------------------------------

  /** One telemetry sample. `value` unit is per-metric (ms or bytes). */
  final case class Sample(metric: String, tenant: String, value: Double,
      at_ms: Long)

  private val registries =
    new ConcurrentHashMap[String, ConcurrentLinkedQueue[Sample]]()
  private def queue(registry: String): ConcurrentLinkedQueue[Sample] =
    registries.computeIfAbsent(registry,
      _ => new ConcurrentLinkedQueue[Sample]())

  def record(registry: String, metric: String, tenant: String,
      value: Double): Unit =
    queue(registry).add(Sample(metric, tenant, value,
      System.currentTimeMillis()))

  def clear(registry: String): Unit = registries.remove(registry)

  /** The recorded samples as a DataFrame — the scrape. Local-mode only
    * for the same reason as [[StreamLatency]]: the registry is JVM-static
    * (per-executor state on a cluster; a deployment merges scrapes). */
  def snapshot(spark: SparkSession, registry: String): DataFrame = {
    require(spark.sparkContext.isLocal,
      "Telemetry.snapshot reads a JVM-static registry and only works on " +
        "local[*] masters; cluster deployments scrape per-executor state")
    spark.createDataFrame(queue(registry).asScala.toSeq)
  }

  /** Delivery-sink wrapper: meters every frame leaving the dispatch
    * fastlane — commit→broadcast latency (the reference measures Begin's
    * commit_timestamp → after pubsub_broadcast; here: frame commit stamp
    * → after the inner sink's offer returns, so a durable produce is
    * inside the span) and payload size in bytes. Event counts and byte
    * counters are derived from these samples at query time (`count` /
    * `sum` over `payload_size_bytes` = the reference's
    * `realtime_channel_output_bytes` counter). */
  final class MeteredSink(registry: String, tenant: String,
      inner: CdcStream.DeliverySink) extends CdcStream.DeliverySink {
    def offer(d: CdcStream.Delivery): Unit = {
      inner.offer(d)
      val commit = StreamLatency.parseCommitMs(d.frame)
      if (commit > 0L)
        Telemetry.record(registry, "broadcast_latency_committed_at_ms",
          tenant, (System.currentTimeMillis() - commit).toDouble)
      Telemetry.record(registry, "payload_size_bytes", tenant,
        d.frame.length.toDouble)
    }
  }

  /** Per-trigger poll metrics via the engine's own progress events —
    * `batch_duration_ms` is the poller-query-duration analog (the cost of
    * one micro-batch trigger), `batch_rows` the per-poll change count.
    * Attach with `spark.streams.addListener(...)`; detach when done. */
  def listener(registry: String, tenant: String): StreamingQueryListener =
    new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val d = e.progress.durationMs
        if (d != null && d.containsKey("triggerExecution"))
          Telemetry.record(registry, "batch_duration_ms", tenant,
            d.get("triggerExecution").doubleValue())
        Telemetry.record(registry, "batch_rows", tenant,
          e.progress.numInputRows.toDouble)
      }
    }

  // ---- metrics retention (MetricsCleaner) ---------------------------

  /** The reference's MetricsCleaner sweep as a query: drop every metric
    * series belonging to a tenant whose LATEST lifecycle event at sweep
    * time says `vacant` (no websockets) or `disconnected`, and has said
    * so for longer than the threshold (default 600 s)
    * (/root/reference/lib/realtime/metrics_cleaner.ex:9-23,106-133 —
    * `:ets.select` of tenants stamped before `now - threshold`, then
    * `Peep.prune_tags` removes their series; a tenant re-occupied before
    * the sweep had its stamp deleted and is spared).
    *
    * `lifecycle` rows: `(tenant, state, ts)` with `state ∈ {occupied,
    * vacant}`; the latest row ≤ `sweepTs` per tenant decides (ties on
    * `ts` broken by preferring the later row in `(ts, state)` order —
    * callers with real event streams have monotone stamps). Returns the
    * SURVIVING samples. Scale shape: the lifecycle reduction is one
    * (tenant)-partitioned window over the lifecycle stream (tenant-
    * dimension-sized, not sample-sized) and the prune is a broadcast
    * anti-join against the pruned-tenant set. */
  def pruneVacantTenants(samples: DataFrame, lifecycle: DataFrame,
      sweepTs: java.sql.Timestamp, thresholdSec: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("tenant")
      .orderBy(col("ts").desc, col("state").desc)
    val pruned = lifecycle
      .where(col("ts") <= lit(sweepTs))
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .where(col("state") === "vacant" &&
        col("ts") < lit(sweepTs) - expr(s"INTERVAL $thresholdSec SECOND"))
      .select(col("tenant"))
    samples.join(broadcast(pruned), Seq("tenant"), "left_anti")
  }

  // ---- the histogram operator ---------------------------------------

  /** Prometheus-style cumulative histogram over a sample DataFrame: one
    * row per (keys, le) with `n_le` = count of samples with value ≤ le
    * (upper-inclusive, the exposition-format contract the reference's
    * Peep buckets render to — monitoring/prometheus.ex:37-69 emits the
    * same cumulative prefix sums), a terminal `le='+Inf'` row whose
    * `n_le` equals the series count, and the `_sum`/`_count` companions
    * (`sum_value`, `total`) denormalized onto every row.
    *
    * Scale shape: ONE hash aggregation (the only shuffle), with the
    * per-bucket cumulative counts computed as conditional sums inside the
    * agg — map-side partials do the heavy lifting — then a narrow
    * posexplode to rows. Bucket lists are ≤11 entries (the reference's
    * largest), so the unrolled conditional sums stay well inside codegen
    * limits. */
  def histogram(samples: DataFrame, value: Column, buckets: Seq[Long],
      keys: Seq[String]): DataFrame = {
    require(buckets.nonEmpty && buckets == buckets.sorted && buckets.distinct == buckets,
      "bucket boundaries must be sorted and distinct")
    val bucketAggs = buckets.map(b =>
      sum(when(value <= b, 1L).otherwise(0L)).as(s"_le_$b"))
    val aggs = Seq(count(lit(1)).as("total"),
      sum(value).as("sum_value")) ++ bucketAggs
    val g = samples.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val rows = array(
      buckets.map(b => struct(lit(b.toString).as("le"),
        col(s"_le_$b").as("n_le"))) :+
      struct(lit("+Inf").as("le"), col("total").as("n_le")): _*)
    g.select(keys.map(col) ++ Seq(explode(rows).as("_b"),
        col("total"), col("sum_value")): _*)
      .select(keys.map(col) ++ Seq(col("_b.le").as("le"),
        col("_b.n_le").as("n_le"), col("total"), col("sum_value")): _*)
  }
}
