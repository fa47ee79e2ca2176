package graft.presence

import graft.SparkSpec
import graft.presence.CensusStream.{Broadcast, Join}
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.util.concurrent.ConcurrentHashMap

/** The gossip producer: stream broadcasts must equal the batch Census
  * cumulative table, gap ticks included, across micro-batch boundaries
  * and across a checkpoint restart. */
class CensusStreamSpec extends SparkSpec {
  import spark.implicits._

  /** PRECONDITION of every stream==batch comparison in this suite
    * (r12 advice, made explicit): equality holds for PER-KEY IN-ORDER
    * replays only — the CDC-replay case the stream models. Under
    * out-of-order input the stream stays count-correct but stamps a
    * late join one interval past the key's last broadcast, where the
    * batch Census stamps it at its event tick (tested separately below,
    * without a batch comparison). Feeds to an equality test must pass
    * through this guard so nobody silently adds an out-of-order replay
    * to an equality harness. */
  private def assertPerKeyOrdered(feeds: Seq[Seq[Join]]): Unit = {
    val flat = feeds.flatten
    flat.groupBy(j => (j.node, j.grp)).foreach { case (k, js) =>
      assert(js.map(_.epochSec) == js.map(_.epochSec).sorted,
        s"equality-spec feed is out of order for key $k — " +
          "stream==batch only holds for per-key ordered replays")
    }
  }

  test("stream broadcasts == batch Census local counts, gap ticks " +
      "filled, micro-batch boundaries invisible") {
    implicit val s = spark
    val feeds = Seq(
      Seq(Join("nA", "g", 10L), Join("nB", "g", 30L)),
      Seq(Join("nA", "g", 70L), Join("nB", "g", 250L)))
    assertPerKeyOrdered(feeds)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Join](spark)
    val got = new ConcurrentHashMap[(String, String, Long), Long]()
    val q = CensusStream(input.toDS(), intervalSec = 60L)
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Broadcast], _: Long) =>
        b.collect().foreach(r =>
          got.put((r.node, r.grp, r.tickSec), r.count))
        ()
      }.start()
    try {
      // every key has a join in the first interval, so stream coverage
      // equals the batch grid's (which starts at the global min tick)
      input.addData(feeds(0))
      q.processAllAvailable()
      // a 3-interval gap for nB (ticks 120/180 must gossip unchanged),
      // plus a second nA join in its own later tick
      input.addData(feeds(1))
      q.processAllAvailable()
    } finally q.stop()
    import scala.jdk.CollectionConverters._
    val stream = got.asScala.toMap
    // batch model over the same joins, n_local column
    val events = feeds.flatten.map(j => (j.node, j.grp, j.epochSec))
      .toDF("node", "grp", "sec")
      .select(col("node"), col("grp"),
        timestamp_micros(col("sec") * 1000000L).as("ts"))
    val batch = Census.memberCounts(events, "node", "grp", "ts", 60L)
      .select(col("read_node"),
        col("grp"), (unix_micros(col("read_ts")) / 1000000L).cast("long"),
        col("n_local"))
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2, r._3) -> r._4).toMap
    // stream covers each key's [first tick, last tick]; batch grid is
    // dense to the global max — agreement must hold wherever both exist
    stream.foreach { case (k, v) =>
      assert(batch(k) == v, s"stream/batch split at $k: $v vs ${batch(k)}")
    }
    // the gap gossips exist and carry the unchanged count
    assert(stream(("nB", "g", 120L)) == 1L)
    assert(stream(("nB", "g", 180L)) == 1L)
    assert(stream(("nB", "g", 240L)) == 1L)
    assert(stream(("nB", "g", 300L)) == 2L)
    assert(stream(("nA", "g", 120L)) == 2L)
  }

  test("a join landing at-or-before the last gossip surfaces in the NEXT " +
      "interval's broadcast — never a silent fold") {
    implicit val s = spark
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Join](spark)
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val q = CensusStream(input.toDS(), intervalSec = 60L)
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Broadcast], _: Long) =>
        b.collect().foreach(r => got.add((r.tickSec, r.count)))
        ()
      }.start()
    try {
      input.addData(Seq(Join("nA", "g", 10L)))
      q.processAllAvailable() // gossips (60, 1)
      // a join for the ALREADY-GOSSIPED tick 60 arrives late: the next
      // interval's broadcast must carry it even with no further traffic
      input.addData(Seq(Join("nA", "g", 50L)))
      q.processAllAvailable()
      input.addData(Seq(Join("nA", "g", 130L)))
      q.processAllAvailable()
    } finally q.stop()
    import scala.jdk.CollectionConverters._
    val ticks = got.asScala.toSeq
    assert(ticks.toSet == Set((60L, 1L), (120L, 2L), (180L, 3L)),
      s"got $ticks")
    assert(ticks.size == 3, s"a tick gossiped twice: $ticks")
  }

  test("ALL late ticks of one invocation fold into ONE next-interval " +
      "gossip — the stamp advance is bounded, not per-late-tick") {
    implicit val s = spark
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Join](spark)
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val q = CensusStream(input.toDS(), intervalSec = 60L)
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Broadcast], _: Long) =>
        b.collect().foreach(r => got.add((r.tickSec, r.count)))
        ()
      }.start()
    try {
      // advance the key to tick 300
      input.addData(Seq(Join("nA", "g", 290L)))
      q.processAllAvailable() // gossips (300, 1)
      // FOUR distinct late ticks (60/120/180/240 ≤ lastTick 300) in one
      // micro-batch: the old per-late-tick advance would stamp 360, 420,
      // 480, 540 — four intervals ahead of event time; the fold must
      // emit exactly ONE synthetic gossip at 360 carrying all four
      input.addData(Seq(Join("nA", "g", 50L), Join("nA", "g", 110L),
        Join("nA", "g", 170L), Join("nA", "g", 230L)))
      q.processAllAvailable()
      // an in-order tick afterwards continues from the bounded stamp
      input.addData(Seq(Join("nA", "g", 410L)))
      q.processAllAvailable()
    } finally q.stop()
    import scala.jdk.CollectionConverters._
    val ticks = got.asScala.toSeq
    assert(ticks.toSet == Set((300L, 1L), (360L, 5L), (420L, 6L)),
      s"got $ticks")
    assert(ticks.size == 3, s"a tick gossiped twice: $ticks")
  }

  test("gossip state survives a restart from checkpoint: counts continue, " +
      "no tick re-emitted") {
    implicit val s = spark
    val src = Files.createTempDirectory("census-src").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("census-ckpt").toFile.getAbsolutePath
    val got = new ConcurrentHashMap[(String, String, Long), Long]()
    val emissions = new java.util.concurrent.atomic.AtomicLong(0L)
    def write(rows: Seq[Join]): Unit =
      rows.toDS().coalesce(1).write.mode("append").parquet(src)
    def attach() = CensusStream(
        spark.readStream.schema(Seq.empty[Join].toDS().schema)
          .parquet(src).as[Join], intervalSec = 60L)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Broadcast], _: Long) =>
        b.collect().foreach { r =>
          got.put((r.node, r.grp, r.tickSec), r.count)
          emissions.incrementAndGet()
        }
        ()
      }.start()
    // first life: two joins in tick 60
    write(Seq(Join("nA", "g", 5L), Join("nA", "g", 50L)))
    val q1 = attach()
    try q1.processAllAvailable() finally q1.stop()
    assert(got.get(("nA", "g", 60L)) == 2L)
    // second life: a join two intervals later — the restored state must
    // CONTINUE from cum=2 (not restart at 0) and fill the gap tick
    write(Seq(Join("nA", "g", 170L)))
    val q2 = attach()
    try q2.processAllAvailable() finally q2.stop()
    assert(got.get(("nA", "g", 120L)) == 2L,
      "gap gossip must carry the restored count")
    assert(got.get(("nA", "g", 180L)) == 3L,
      "restored cum must continue, not reset")
    assert(emissions.get() == 3L,
      s"each tick gossiped exactly once across both lives: ${emissions.get()}")
  }
}
