package graft.presence

import graft.SparkSpec
import graft.presence.OccupancyStream.{Claim, Update}
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.util.concurrent.ConcurrentHashMap

/** The occupancy claims stream: the keyed seq-guard must converge to
  * exactly the batch register ([[Muster.occupancyMerge]]) under ANY
  * arrival order and micro-batch slicing — the register is a
  * semilattice, so unlike CensusStream's time-stamped gossip no
  * in-order precondition applies — and the state must survive a
  * checkpoint restart without re-emitting or regressing. */
class OccupancyStreamSpec extends SparkSpec {
  import spark.implicits._

  private def runStream(feeds: Seq[Seq[Claim]])
      : (Map[(String, String), (Long, Boolean, Option[Long])], Long) = {
    implicit val s = spark
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Claim](spark)
    val last = new ConcurrentHashMap[(String, String),
      (Long, Boolean, Option[Long])]()
    val emissions = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = OccupancyStream(input.toDS())
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Update], _: Long) =>
        b.collect().foreach { u =>
          last.put((u.grp, u.node), (u.seq, u.present, u.createdAt))
          emissions.incrementAndGet()
        }
        ()
      }.start()
    try feeds.foreach { f => input.addData(f); q.processAllAvailable() }
    finally q.stop()
    import scala.jdk.CollectionConverters._
    (last.asScala.toMap, emissions.get())
  }

  private def batchRegister(claims: Seq[Claim])
      : Map[(String, String), (Long, Boolean, Option[Long])] =
    Muster.occupancyMerge(
        claims.map(c => (c.grp, c.node, c.seq, c.present,
          c.createdAt.map(java.lang.Long.valueOf).orNull))
          .toDF("grp", "node", "seq", "present", "created_at"),
        "grp", "node", "seq", "present", "created_at")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getBoolean(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap

  test("stream register == batch occupancyMerge under OUT-OF-ORDER " +
      "arrival and arbitrary micro-batch slicing (semilattice merge — " +
      "no in-order precondition)") {
    // deliberately shuffled: late stale presents, equal-seq tombstone
    // races, re-claims — split across micro-batches mid-key
    val feeds = Seq(
      Seq(Claim("g1", "nA", 5L, true, None),
        Claim("g2", "nA", 7L, false, Some(70L)),
        Claim("g3", "nA", 9L, false, Some(90L))),
      Seq(Claim("g1", "nA", 1L, true, None), // stale, loses
        Claim("g2", "nA", 7L, true, None), // equal-seq present, loses
        Claim("g3", "nA", 4L, true, None), // stale present vs tombstone
        Claim("g4", "nA", 3L, false, Some(30L))),
      Seq(Claim("g4", "nA", 8L, true, None), // strictly-newer re-claim
        Claim("g5", "nA", 6L, false, Some(60L)),
        Claim("g5", "nA", 2L, false, Some(20L)))
    )
    val (stream, _) = runStream(feeds)
    val batch = batchRegister(feeds.flatten)
    assert(stream == batch,
      s"stream/batch split:\n  stream=$stream\n  batch=$batch")
    // and the shuffled replay equals the sorted replay: order-free
    val (replayed, _) = runStream(
      Seq(feeds.flatten.sortBy(c => (c.grp, c.seq))))
    assert(replayed == batch)
  }

  test("a losing claim emits NOTHING: stale presents cannot resurrect " +
      "a vacated group, equal-seq presents cannot displace a tombstone") {
    val feeds = Seq(
      Seq(Claim("g", "nA", 9L, false, Some(90L))),
      Seq(Claim("g", "nA", 4L, true, None)), // stale present: no emit
      Seq(Claim("g", "nA", 9L, true, None))  // equal-seq present: no emit
    )
    val (stream, emissions) = runStream(feeds)
    assert(stream == Map(("g", "nA") -> ((9L, false, Some(90L)))))
    assert(emissions == 1L,
      s"losing claims must be silent, saw $emissions emissions")
  }

  test("register state survives a restart from checkpoint: the seq " +
      "guard continues from restored state, winners emit exactly once") {
    implicit val s = spark
    val src = Files.createTempDirectory("occ-src").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("occ-ckpt").toFile.getAbsolutePath
    val last = new ConcurrentHashMap[(String, String),
      (Long, Boolean, Option[Long])]()
    val emissions = new java.util.concurrent.atomic.AtomicLong(0L)
    def write(rows: Seq[Claim]): Unit =
      rows.toDS().coalesce(1).write.mode("append").parquet(src)
    def attach() = OccupancyStream(
        spark.readStream.schema(Seq.empty[Claim].toDS().schema)
          .parquet(src).as[Claim])
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Update], _: Long) =>
        b.collect().foreach { u =>
          last.put((u.grp, u.node), (u.seq, u.present, u.createdAt))
          emissions.incrementAndGet()
        }
        ()
      }.start()
    // first life: a present claim then a tombstone at a higher seq
    write(Seq(Claim("g", "nA", 3L, true, None),
      Claim("g", "nA", 7L, false, Some(70L))))
    val q1 = attach()
    try q1.processAllAvailable() finally q1.stop()
    assert(last.get(("g", "nA")) == ((7L, false, Some(70L))))
    val afterFirst = emissions.get()
    // second life: a STALE present must lose against the RESTORED
    // tombstone state (the exact scenario the seq guard exists for —
    // restart must not forget the high-water mark)
    write(Seq(Claim("g", "nA", 5L, true, None)))
    val q2 = attach()
    try q2.processAllAvailable() finally q2.stop()
    assert(last.get(("g", "nA")) == ((7L, false, Some(70L))),
      "restart lost the seq high-water mark: stale present resurrected")
    assert(emissions.get() == afterFirst,
      "a losing claim emitted after restart")
    // and a genuinely newer re-claim still wins post-restart
    write(Seq(Claim("g", "nA", 9L, true, None)))
    val q3 = attach()
    try q3.processAllAvailable() finally q3.stop()
    assert(last.get(("g", "nA")) == ((9L, true, None)))
  }
}
