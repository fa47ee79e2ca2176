package graft.sources

import graft.SparkSpec
import graft.cdc.{CdcRecoverySpec, CdcStream}
import graft.model.Subscription
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQueryException
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

/** The outbound transport seam's recovery story — the at-least-once twin
  * of `ReplayLogRecoverySpec` (which proves the INBOUND adapter):
  * deliveries produced to a partitioned [[ReplayLog]] topic through
  * [[ReplayLogSink]] survive a kill-restart with NO frame lost and dupes
  * bounded to the one uncommitted epoch, and a downstream consumer's
  * (subscription, change-id) dedup restores exactly-once — the contract
  * the reference's dispatch fastlane gets for free from sockets-per-
  * subscriber and a real deployment needs from its egress log
  * (message_dispatcher.ex:134-161). */
class ReplayLogSinkSpec extends SparkSpec {
  import spark.implicits._
  import CdcRecoverySpec.{Change, crashOnce}

  /** id from a delivered frame (typed-batch path renders `"id":3`). */
  private def idOf(frame: String): Long = {
    val k = "\"id\":"
    var j = frame.indexOf(k) + k.length
    var v = 0L
    while (j < frame.length && frame.charAt(j).isDigit) {
      v = v * 10 + (frame.charAt(j) - '0'); j += 1
    }
    v
  }

  private val subs = Seq(
    Subscription("sA", "public", "t", Nil),
    Subscription("sB", "public", "t", Nil))
  private lazy val dataSchema = Seq.empty[Change].toDS().toDF()
    .drop("change_type", "commit_timestamp").schema

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  private def writeChanges(dir: String, ids: Range): Unit =
    ids.map(i => Change(i.toLong, "INSERT", i * 10.0,
        f"2024-01-01T00:00:$i%02d.000Z")).toDS()
      .coalesce(1).write.mode("append").parquet(dir)

  /** All produced frames of `topic` as (partition, offset, key, changeId). */
  private def produced(topic: String): Seq[(Int, Long, String, Long)] =
    ReplayLog.partitions(topic).flatMap { p =>
      ReplayLog.read(topic, p, 0L, Long.MaxValue)
        .map(r => (p, r.offset, r.key, idOf(new String(r.value, UTF_8))))
    }

  test("keyed produce: one partition per subscriber, per-subscriber " +
      "produce order preserved, content matches the bus path") {
    val topic = "out-keyed-" + System.nanoTime()
    val bus = CdcStream.MemoryBus()
    val sink = new ReplayLogSink(topic, numPartitions = 4)
    val batch = (1 to 6).map(i => Change(i.toLong, "INSERT", i * 10.0,
      f"2024-01-01T00:00:$i%02d.000Z")).toDS().toDF()
    CdcStream.processBatch(batch, subs, dataSchema, "t", pk = Seq("id"),
      bus = bus, deliverTo = Some(sink))
    val rows = produced(topic)
    assert(rows.size == 12, "2 subscribers x 6 changes")
    Seq("sA", "sB").foreach { s =>
      val mine = rows.filter(_._3 == s)
      assert(mine.map(_._1).distinct.size == 1,
        s"all of $s's frames in ONE partition (keyed produce)")
      // within the partition, offsets sorted == produce order; ids are a
      // permutation of the batch (partition-parallel produce does not
      // promise cross-change order, same as the bus path)
      assert(mine.map(_._4).sorted == (1L to 6L))
    }
    // the two subscribers' frame bodies are identical per change —
    // encode-once fan-out survives the produce
    val byChange = rows.groupBy(_._4)
    assert(byChange.values.forall(_.size == 2))
    ReplayLog.delete(topic)
  }

  test("post-delivery crash: the uncommitted epoch's frames are " +
      "re-produced (at-least-once), none lost, dedup restores exactly-once") {
    val src = tmp("out-src"); val ckpt = tmp("out-ckpt")
    val topic = "out-crash-" + System.nanoTime()
    val bus = CdcStream.MemoryBus()
    val sink = new ReplayLogSink(topic, numPartitions = 2)
    val runId = "out-crash-" + System.nanoTime()
    def stream = spark.readStream.schema(Seq.empty[Change].toDS().schema)
      .parquet(src)
    def attach() =
      stream.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, id: Long) =>
          val s = CdcStream.processBatch(batch, subs, dataSchema, "t",
            pk = Seq("id"), bus = bus, batchId = id, deliverTo = Some(sink))
          // die AFTER the frames were produced, BEFORE the epoch commits
          if (s.nDeliveries > 0 && crashOnce.putIfAbsent(runId, true) == null)
            throw new RuntimeException("injected post-delivery crash")
          ()
        }.start()
    writeChanges(src, 1 to 4)
    val q1 = attach()
    val died =
      try intercept[StreamingQueryException] {
        q1.processAllAvailable(); q1.awaitTermination(60000L); ()
      } finally q1.stop()
    assert(died.getMessage.contains("injected") ||
      Option(died.getCause).exists(_.getMessage.contains("injected")))
    assert(produced(topic).size == 8, "the crashed epoch had produced")
    val q2 = attach() // same checkpoint; latch is spent
    try { q2.processAllAvailable() } finally q2.stop()
    val rows = produced(topic)
    // at-least-once: every (subscriber, change) at least once; the ONLY
    // dupes are the replayed epoch's (exactly 2 copies, never more)
    val copies = rows.groupBy(r => (r._3, r._4)).view.mapValues(_.size).toMap
    assert(copies.keySet ==
      (for (s <- Seq("sA", "sB"); i <- 1L to 4L) yield (s, i)).toSet,
      "no frame lost")
    assert(copies.values.forall(_ == 2),
      s"dupes bounded to the one replayed epoch: $copies")
    // downstream consumer dedup on (key, change id) -> exactly-once
    assert(rows.map(r => (r._3, r._4)).distinct.size == 8)
    ReplayLog.delete(topic)
  }

  test("produced frames replay through the inbound adapter: the egress " +
      "log is itself a replayable source (offset-tracked round trip)") {
    val topic = "out-roundtrip-" + System.nanoTime()
    val bus = CdcStream.MemoryBus()
    val sink = new ReplayLogSink(topic, numPartitions = 2)
    val batch = (1 to 5).map(i => Change(i.toLong, "INSERT", i * 10.0,
      f"2024-01-01T00:00:$i%02d.000Z")).toDS().toDF()
    CdcStream.processBatch(batch, subs, dataSchema, "t", pk = Seq("id"),
      bus = bus, deliverTo = Some(sink))
    // read the egress topic back through the DSv2 batch surface
    val back = spark.read.format("graft-replaylog").option("topic", topic)
      .load()
      .select(org.apache.spark.sql.functions.col("key"),
        org.apache.spark.sql.functions.col("value").cast("string").as("f"))
      .collect().map(r => (r.getString(0), idOf(r.getString(1))))
    assert(back.length == 10)
    assert(back.toSeq.sorted ==
      (for (s <- Seq("sA", "sB"); i <- 1L to 5L) yield (s, i)).sorted)
    ReplayLog.delete(topic)
  }
}
