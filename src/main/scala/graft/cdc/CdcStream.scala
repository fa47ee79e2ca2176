package graft.cdc

import graft.model.Subscription
import graft.walrus.{Payload, Walrus}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** Structured-Streaming CDC pipeline: change stream → WALRUS match →
  * payload shaping → rate-limited, encode-once fan-out — the Spark
  * re-expression of the reference's poll loop + dispatcher
  * (/root/reference/lib/extensions/postgres_cdc_rls/replication_poller.ex:149-232,
  * message_dispatcher.ex:11-57).
  *
  * Execution model mapping:
  *  - poll cadence → `Trigger.ProcessingTime` (micro-batch);
  *    `max_changes`/batch → `maxFilesPerTrigger`/`maxOffsetsPerTrigger`
  *    on the source;
  *  - per-tenant rate limit → batch-level gate in `foreachBatch`: if the
  *    batch exceeds the events/sec cap the whole batch is dropped and
  *    counted, exactly the reference's load-shedding (O10,
  *    replication_poller.ex:404-415);
  *  - encode-once (O6): the payload JSON is serialized once per (change ×
  *    payload group) BEFORE the per-subscriber explode;
  *  - ordering: per-topic order preserved by partitioning on the table —
  *    at scale, repartition the stream by (schema, table) so each topic
  *    drains in commit order within its partition;
  *  - delivery: at-most-once like the reference (no sink-side ack); with a
  *    checkpointLocation Spark upgrades this to at-least-once — dedup on
  *    (change pk, subscription_id) makes it effectively-once.
  */
object CdcStream {

  /** Per-batch statistics surfaced to the caller (the analog of the
    * reference's poll telemetry). */
  final case class BatchStats(
      batchId: Long, nChanges: Long, nDeliveries: Long, shed: Boolean)

  /** One delivery: a subscriber id and the pre-encoded frame it receives. */
  final case class Delivery(subscriptionId: String, frame: String)

  /** In-memory delivery bus for tests / local runs; a Kafka producer or
    * socket fan-out slots in behind the same interface in production. */
  final class MemoryBus extends Serializable {
    private val q = new ConcurrentLinkedQueue[Delivery]()
    private val stats = new ConcurrentLinkedQueue[BatchStats]()
    def offer(d: Delivery): Unit = q.add(d)
    def record(s: BatchStats): Unit = stats.add(s)
    def deliveries: Seq[Delivery] = q.asScala.toSeq
    def batches: Seq[BatchStats] = stats.asScala.toSeq
  }

  /** Run one micro-batch of the CDC pipeline (also usable in plain batch
    * mode): match → shape → gate → encode-once → explode → deliver. */
  def processBatch(
      batch: DataFrame,
      subs: Seq[Subscription],
      dataSchema: StructType,
      table: String,
      pk: Seq[String],
      bus: MemoryBus,
      batchId: Long = 0L,
      maxEventsPerBatch: Long = Long.MaxValue): Unit = {
    val nChanges = batch.count()
    if (nChanges > maxEventsPerBatch) {
      // load-shed: drop the whole batch, keep the telemetry (O10)
      bus.record(BatchStats(batchId, nChanges, 0L, shed = true))
    } else {
      // the shaped branches (one per payload group) each scan `matched`;
      // cache the micro-batch so the predicate battery runs once
      val matched = Walrus.matchedOnly(batch, subs, dataSchema, table).persist()
      val shaped = Payload.shape(matched, subs,
        dataCols = dataSchema.fieldNames.toSeq, pk = pk)
      // encode once per (change × payload group), then explode subscribers;
      // record/old_record are already-encoded JSON and are spliced in raw
      // (nesting them in to_json would double-escape them)
      val deliveries = shaped
        .withColumn("frame", concat(
          lit("{\"type\":\""), col(Walrus.TypeCol),
          lit("\",\"commit_timestamp\":\""), col("commit_timestamp"),
          lit("\",\"record\":"), coalesce(col("record"), lit("null")),
          lit(",\"old_record\":"), coalesce(col("old_record"), lit("null")),
          lit(",\"errors\":"),
          coalesce(to_json(col("errors")), lit("null")),
          lit("}")))
        .select(explode(col("subscription_ids")).as("subscription_id"),
          col("frame"))
      var n = 0L
      deliveries.collect().foreach { r =>
        bus.offer(Delivery(r.getString(0), r.getString(1))); n += 1
      }
      matched.unpersist()
      bus.record(BatchStats(batchId, nChanges, n, shed = false))
    }
  }

  /** Attach the CDC pipeline to a streaming change DataFrame. */
  def start(
      changes: DataFrame,
      subs: Seq[Subscription],
      dataSchema: StructType,
      table: String,
      pk: Seq[String],
      bus: MemoryBus,
      maxEventsPerBatch: Long = Long.MaxValue,
      triggerMs: Long = 100L): StreamingQuery =
    changes.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, subs, dataSchema, table, pk, bus, batchId,
          maxEventsPerBatch)
      }
      .start()
}
