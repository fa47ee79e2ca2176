package graft.rates

import graft.SparkSpec
import graft.rates.AdmissionStream.{Attempt, Decision}
import java.nio.file.Files
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

/** Checkpoint/recovery for the enforcement gates (the CdcRecoverySpec
  * contract, applied to keyed admission state): kill a gate query between
  * micro-batches and restart it from its `checkpointLocation` — the state
  * store must hand the second life the SAME ring / slot set / dead set
  * the first life built, so post-restart decisions are indistinguishable
  * from an uninterrupted stream. This is the failover story a live
  * deployment needs: an executor or driver loss must not reset any
  * tenant's rate window, free any claimed connection slot, or resurrect
  * any shut-down socket. */
class AdmissionRecoverySpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  // append beside earlier part files: the file source does not descend
  // into non-partition subdirectories (same layout as CdcRecoverySpec)
  private def writeAttempts(dir: String, rows: Seq[Attempt]): Unit =
    rows.toDS().coalesce(1).write.mode("append").parquet(dir)

  private def fileAttempts(dir: String) =
    spark.readStream.schema(Seq.empty[Attempt].toDS().schema)
      .parquet(dir).as[Attempt]

  test("join gate: ring and slots survive a restart from checkpoint") {
    implicit val s = spark
    val src = tmp("adm-src"); val ckpt = tmp("adm-ckpt")
    val bus = new ConcurrentHashMap[Long, String]()
    val puts = new AtomicLong(0L)
    def attach() = AdmissionStream(fileAttempts(src), maxConcurrent = 1,
        limitNum = 1L, limitDen = 1L, tickSec = 1L, windowTicks = 2)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Decision], _: Long) =>
        batch.collect().foreach { d => bus.put(d.tie, d.status); puts.incrementAndGet() }
        ()
      }.start()
    // first life: u1 claims the slot and bursts the tick-0 window; u2
    // finds the slot taken
    writeAttempts(src, Seq(Attempt("t", 1L, 0L, 1L), Attempt("t", 1L, 0L, 2L),
      Attempt("t", 2L, 0L, 3L)))
    val q1 = attach()
    try q1.processAllAvailable() finally q1.stop()
    assert(bus.get(1L) == "ok" && bus.get(2L) == "ok")
    assert(bus.get(3L) == "too_many_connections")
    // second life, same checkpoint: tick 1 must still see the tick-0
    // burst (restored ring), u2 must still be locked out (restored
    // slots), and tick 3 drains the restored ring's window
    writeAttempts(src, Seq(Attempt("t", 1L, 1L, 4L), Attempt("t", 2L, 1L, 5L),
      Attempt("t", 1L, 3L, 6L)))
    val q2 = attach()
    try q2.processAllAvailable() finally q2.stop()
    assert(bus.get(4L) == "too_many_joins",
      s"restored ring must gate tick 1: ${bus.get(4L)}")
    assert(bus.get(5L) == "too_many_connections",
      s"restored slots must stay claimed: ${bus.get(5L)}")
    assert(bus.get(6L) == "ok", s"window drains as usual: ${bus.get(6L)}")
    // committed first-life epochs are not re-decided on restart
    assert(puts.get() == 6L, s"exactly one decision per attempt: ${puts.get()}")
  }

  test("shutdown gate: the dead set survives a restart from checkpoint") {
    implicit val s = spark
    val src = tmp("shut-src"); val ckpt = tmp("shut-ckpt")
    val bus = new ConcurrentHashMap[Long, String]()
    def attach() = AdmissionStream.shutdownStream(fileAttempts(src),
        limitNum = 1L, limitDen = 1L, tickSec = 1L, windowTicks = 2)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Decision], _: Long) =>
        batch.collect().foreach(d => bus.put(d.tie, d.status))
        ()
      }.start()
    // first life: tick 0 counts, tick 1 is flagged → u1 shuts down
    writeAttempts(src, Seq(Attempt("t", 1L, 0L, 1L), Attempt("t", 2L, 0L, 2L),
      Attempt("t", 1L, 1L, 3L)))
    val q1 = attach()
    try q1.processAllAvailable() finally q1.stop()
    assert(bus.get(3L) == "shutdown")
    // second life: the death must hold across the restart — and the
    // restored ring still gates tick 2 for the living
    writeAttempts(src, Seq(Attempt("t", 1L, 2L, 4L), Attempt("t", 3L, 2L, 5L)))
    val q2 = attach()
    try q2.processAllAvailable() finally q2.stop()
    assert(bus.get(4L) == "dropped",
      s"restored dead set must keep u1 dead: ${bus.get(4L)}")
    assert(bus.get(5L) == "shutdown",
      s"restored ring (sum=3 over window 2) kills the newcomer: ${bus.get(5L)}")
  }
}
