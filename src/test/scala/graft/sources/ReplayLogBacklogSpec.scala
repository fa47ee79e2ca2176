package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** Backlog catch-up under fault injection — the operational failure the
  * reference exercises with WAL bloat under a 1 GB `max_wal_size` and
  * forced reconnects (test/integration/rt_channel/wal_bloat_test.exs:
  * 22-33,78-160): the consumer dies, the log grows to MANY times the
  * per-trigger admission cap, and the restarted consumer must catch up
  * BOUNDEDLY — every micro-batch within the cap (no "drain everything in
  * one giant batch" memory spike), no partition starved behind a skewed
  * neighbor (the 1-row floor), live rows flowing once the backlog drains.
  * The catch-up curve (backlog size vs batches vs wall time) is recorded
  * for COVERAGE. */
class ReplayLogBacklogSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  private def append(topic: String, partition: Int, n: Int): Unit =
    (0 until n).foreach { i =>
      ReplayLog.append(topic, partition, null,
        s"""{"i":$i}""".getBytes(UTF_8))
    }

  /** Consume `topic` from `ckpt` with the admission cap, recording each
    * micro-batch's per-partition row counts; returns (batches, wallMs). */
  private def catchUp(topic: String, ckpt: String, cap: Int)
      : (Seq[Map[Int, Long]], Long) = {
    val batches = new ConcurrentLinkedQueue[Map[Int, Long]]()
    val t0 = System.nanoTime()
    val q = spark.readStream.format("graft-replaylog")
      .option("topic", topic).option("maxOffsetsPerTrigger", cap.toString)
      .load()
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val counts = batch.groupBy("partition").count().collect()
          .map(r => r.getInt(0) -> r.getLong(1)).toMap
        if (counts.nonEmpty) batches.add(counts)
        ()
      }.start()
    try { q.processAllAvailable() } finally q.stop()
    (batches.asScala.toSeq, (System.nanoTime() - t0) / 1000000L)
  }

  test("consumer down while a skewed backlog grows >> cap x triggers: " +
      "catch-up is cap-bounded per batch with no partition starved") {
    val topic = "backlog-" + System.nanoTime(); val ckpt = tmp("bl-ckpt")
    val cap = 200
    // first life: a little traffic, then the consumer stops
    (0 until 4).foreach(p => append(topic, p, 5))
    val (pre, _) = catchUp(topic, ckpt, cap)
    assert(pre.map(_.values.sum).sum == 20)
    // consumer is DOWN; the log grows to 50x the cap, heavily skewed:
    // partition 0 takes ~91% of the backlog
    append(topic, 0, 9100)
    (1 until 4).foreach(p => append(topic, p, 300))
    val backlog = 9100 + 3 * 300
    // second life: restart from the checkpoint
    val (batches, _) = catchUp(topic, ckpt, cap)
    val drained = batches.map(_.values.sum).sum
    assert(drained == backlog, s"no record lost: $drained != $backlog")
    // admission honored on EVERY batch — no unbounded catch-up batch
    assert(batches.forall(_.values.sum <= cap),
      s"cap breached: ${batches.map(_.values.sum).max}")
    assert(batches.size >= backlog / cap,
      "the backlog must drain across many capped epochs")
    // no starvation: while every partition still had backlog, every batch
    // admitted at least one row from EACH of them (the 1-row floor) —
    // the skewed partition cannot monopolize the cap
    val remaining = scala.collection.mutable.Map(
      0 -> 9100L, 1 -> 300L, 2 -> 300L, 3 -> 300L)
    batches.foreach { b =>
      val backlogged = remaining.filter(_._2 > 0).keySet
      if (backlogged.size > 1) {
        backlogged.foreach { p =>
          assert(b.getOrElse(p, 0L) >= 1L,
            s"partition $p starved in batch $b while backlogged")
        }
      }
      b.foreach { case (p, n) => remaining(p) = remaining(p) - n }
    }
    assert(remaining.values.forall(_ == 0L))
    // live traffic flows after the drain (the reference's post-recovery
    // broadcast assertion)
    append(topic, 2, 3)
    val (live, _) = catchUp(topic, ckpt, cap)
    assert(live.map(_.values.sum).sum == 3)
    ReplayLog.delete(topic)
  }

  test("catch-up curve: batches scale with backlog/cap and wall time " +
      "stays linear in the backlog (recorded for COVERAGE)") {
    val cap = 500
    val curve = Seq(2000, 10000, 50000).map { n =>
      val topic = s"curve-$n-" + System.nanoTime(); val ckpt = tmp("bl-ckpt")
      (0 until 4).foreach(p => append(topic, p, n / 4))
      val (batches, wallMs) = catchUp(topic, ckpt, cap)
      assert(batches.map(_.values.sum).sum == n)
      assert(batches.forall(_.values.sum <= cap))
      val expected = math.ceil(n.toDouble / cap).toInt
      assert(batches.size >= expected && batches.size <= expected + 2,
        s"backlog $n at cap $cap: ${batches.size} epochs vs ~$expected")
      ReplayLog.delete(topic)
      info(s"backlog=$n cap=$cap epochs=${batches.size} catchUpMs=$wallMs")
      (n, batches.size, wallMs)
    }
    // boundedness, not speed: per-epoch cost must not grow with TOTAL
    // backlog (each epoch is cap-sized work) — allow generous jitter
    val perEpoch = curve.map { case (_, b, ms) => ms.toDouble / b }
    assert(perEpoch.max / perEpoch.min < 5.0,
      s"per-epoch catch-up cost must stay flat: $curve")
  }
}
