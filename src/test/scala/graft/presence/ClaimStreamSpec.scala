package graft.presence

import graft.SparkSpec
import graft.presence.ClaimStream.{Emit, Event}
import java.util.concurrent.ConcurrentLinkedQueue

/** The claim-debounce pair: the scripted flap storm must produce
  * exactly the router-visible claims the reference's shard state
  * machine sends (occupied on first join, nothing during in-cooldown
  * flapping, vacant only at a survived expiry, occupied again on
  * re-claim after it), the stream must equal [[Muster.claimDebounce]]
  * over the same events under in-order multi-batch slicing, and the
  * WATERMARK leg (a vacancy pending at feed end) must fire via the
  * event-time timer, not a batch-end flush. */
class ClaimStreamSpec extends SparkSpec {
  import spark.implicits._

  /** All script times ride on this base: the engine's late-row filter
    * drops events whose time is at or before the CURRENT watermark, and
    * the watermark floor is epoch 0 — a ts=0 event would be "late"
    * before the stream ever saw data. */
  private val Base = 1000000L
  private def ts(ms: Long) = new java.sql.Timestamp(Base + ms)
  private def at(ms: Long): Long = Base + ms

  /** Far-future join on a throwaway key: advances the global watermark
    * so pending timers fire; its own `occupied` emission is filtered
    * out of every comparison. */
  private val SentinelKey = "wm-sentinel"
  private def sentinel(ms: Long) = Event(SentinelKey, "n", ts(ms), 1)

  private def runStream(feeds: Seq[Seq[Event]], cooldownMs: Long)
      : Seq[Emit] = {
    implicit val s = spark
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Event](spark)
    val got = new ConcurrentLinkedQueue[Emit]()
    val q = ClaimStream(input.toDS(), cooldownMs)
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Emit], _: Long) =>
        b.collect().foreach(got.add); ()
      }.start()
    try feeds.foreach { f => input.addData(f); q.processAllAvailable() }
    finally q.stop()
    import scala.jdk.CollectionConverters._
    got.asScala.toSeq.filterNot(_.grp == SentinelKey)
  }

  private def runBatch(events: Seq[Event], cooldownMs: Long): Seq[Emit] =
    Muster.claimDebounce(
        events.map(e => (e.grp, e.node, e.ts.getTime, e.delta))
          .toDF("grp", "node", "ts_ms", "delta")
          .withColumn("tie", org.apache.spark.sql.functions
            .monotonically_increasing_id()),
        "grp", "node", "ts_ms", "delta", "tie", cooldownMs)
      .collect().map(r => Emit(r.getString(0), r.getString(1),
        r.getString(2), r.getLong(3))).toSeq

  private def canon(xs: Seq[Emit]): Seq[Emit] =
    xs.sortBy(e => (e.grp, e.node, e.emitMs, e.claim))

  test("scripted flap storm: in-cooldown churn never reaches the " +
      "router; survived vacancies stamp at expiry; post-vacant re-join " +
      "re-emits occupied — stream AND batch") {
    val cooldown = 100L
    val k = "room1"
    val events = Seq(
      Event(k, "nA", ts(0L), 1),    // first join → occupied@0
      Event(k, "nA", ts(10L), -1),  // last leave → cooldown armed @10
      Event(k, "nA", ts(50L), 1),   // re-join at gap 40 → SUPPRESSED
      Event(k, "nA", ts(60L), -1),  // vacancy again → re-armed @60
      Event(k, "nA", ts(300L), 1),  // gap 240 ≥ 100 → vacant@160, occupied@300
      Event(k, "nA", ts(310L), -1)) // pending @310 → timer leg: vacant@410
    val expected = Seq(
      Emit(k, "nA", "occupied", at(0L)),
      Emit(k, "nA", "vacant", at(160L)),
      Emit(k, "nA", "occupied", at(300L)),
      Emit(k, "nA", "vacant", at(410L)))
    // batch operator over the full history
    assert(canon(runBatch(events, cooldown)) == canon(expected))
    // stream, one batch + the watermark sentinel (fires the last timer)
    val got = runStream(Seq(events, Seq(sentinel(100000L))), cooldown)
    assert(canon(got) == canon(expected),
      s"stream flap storm diverged: $got")
  }

  test("a re-join exactly AT expiry counts as after it: the timer " +
      "fired first, so vacant AND occupied both emit") {
    val k = "edge"
    val events = Seq(
      Event(k, "nA", ts(0L), 1),
      Event(k, "nA", ts(10L), -1),
      Event(k, "nA", ts(110L), 1)) // gap == cooldown 100
    val expected = Seq(
      Emit(k, "nA", "occupied", at(0L)),
      Emit(k, "nA", "vacant", at(110L)),
      Emit(k, "nA", "occupied", at(110L)))
    assert(canon(runBatch(events, 100L)) == canon(expected))
    assert(canon(runStream(Seq(events, Seq(sentinel(100000L))), 100L)) ==
      canon(expected))
    // one tick inside the window: suppressed
    val inWin = Seq(
      Event(k, "nA", ts(0L), 1),
      Event(k, "nA", ts(10L), -1),
      Event(k, "nA", ts(109L), 1))
    assert(canon(runBatch(inWin, 100L)) ==
      Seq(Emit(k, "nA", "occupied", at(0L))))
  }

  test("non-last leaves and non-first joins are claim-silent: only " +
      "0↔1 transitions can touch the router") {
    val k = "multi"
    val events = Seq(
      Event(k, "nA", ts(0L), 1),   // occupied@0
      Event(k, "nA", ts(5L), 1),   // second member — silent
      Event(k, "nA", ts(10L), -1), // down to 1 — silent
      Event(k, "nA", ts(20L), -1), // down to 0 — cooldown armed
      Event(k, "nA", ts(500L), 1)) // survived → vacant@120, occupied@500
    val expected = Seq(
      Emit(k, "nA", "occupied", at(0L)),
      Emit(k, "nA", "vacant", at(120L)),
      Emit(k, "nA", "occupied", at(500L)))
    assert(canon(runBatch(events, 100L)) == canon(expected))
    assert(canon(runStream(Seq(events, Seq(sentinel(100000L))), 100L)) ==
      canon(expected))
  }

  test("a pending cooldown SURVIVES a checkpoint restart: the timer " +
      "fires in the next life exactly once, and the post-vacant re-join " +
      "re-emits occupied from restored state") {
    implicit val s = spark
    val src = java.nio.file.Files.createTempDirectory("claim-src")
      .toFile.getAbsolutePath
    val ckpt = java.nio.file.Files.createTempDirectory("claim-ckpt")
      .toFile.getAbsolutePath
    val got = new ConcurrentLinkedQueue[Emit]()
    def write(rows: Seq[Event]): Unit =
      rows.toDS().coalesce(1).write.mode("append").parquet(src)
    def attach() = ClaimStream(
        spark.readStream.schema(Seq.empty[Event].toDS().schema)
          .parquet(src).as[Event], cooldownMs = 100L)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Emit], _: Long) =>
        b.collect().foreach(got.add); ()
      }.start()
    import scala.jdk.CollectionConverters._
    def claims = got.asScala.toSeq.filterNot(_.grp == SentinelKey)
    // life 1: join + last-leave — occupied emitted, cooldown armed @10,
    // the timer (due 110) is STATE when the process dies
    write(Seq(Event("room", "nA", ts(0L), 1), Event("room", "nA", ts(10L), -1)))
    val q1 = attach()
    try q1.processAllAvailable() finally q1.stop()
    assert(canon(claims) == Seq(Emit("room", "nA", "occupied", at(0L))),
      "no claim may emit while the vacancy is still cooling down")
    // life 2: only a watermark-advancing sentinel — the RESTORED timer
    // must fire the survived vacancy, stamped at its original expiry
    write(Seq(sentinel(100000L)))
    val q2 = attach()
    try q2.processAllAvailable() finally q2.stop()
    assert(canon(claims) == canon(Seq(
      Emit("room", "nA", "occupied", at(0L)),
      Emit("room", "nA", "vacant", at(110L)))),
      s"restored timer mis-fired: $claims")
    // life 3: re-join after the survived vacancy — restored state knows
    // the router was told vacant, so occupied re-emits (exactly once)
    write(Seq(Event("room", "nA", ts(200000L), 1)))
    val q3 = attach()
    try q3.processAllAvailable() finally q3.stop()
    assert(canon(claims) == canon(Seq(
      Emit("room", "nA", "occupied", at(0L)),
      Emit("room", "nA", "vacant", at(110L)),
      Emit("room", "nA", "occupied", at(200000L)))))
  }

  test("batch == a direct sequential reference fold over 200 seeded " +
      "histories (triangulating the windowed plan against the state " +
      "machine it claims to be)") {
    // the reference implementation: the shard state machine as a plain
    // per-key fold — no Spark, no windows — emitting exactly what the
    // cooldown semantics dictate
    def fold(evs: Seq[(Long, Int)], cooldown: Long): Seq[(String, Long)] = {
      var cnt = 0L; var routerOcc = false
      var pending = Option.empty[Long]
      val out = Seq.newBuilder[(String, Long)]
      evs.sortBy(identity).foreach { case (ts, delta) =>
        pending.foreach { pv =>
          if (ts - pv >= cooldown) {
            out += (("vacant", pv + cooldown)); routerOcc = false
            pending = None
          }
        }
        cnt += delta
        if (delta > 0 && cnt == 1L) {
          if (pending.isDefined) pending = None
          else if (!routerOcc) { out += (("occupied", ts)); routerOcc = true }
        } else if (delta < 0 && cnt == 0L) pending = Some(ts)
      }
      pending.foreach(pv => out += (("vacant", pv + cooldown)))
      out.result()
    }
    val rnd = new scala.util.Random(7)
    val cooldown = 500L
    // 200 keys × random well-formed session histories
    val perKey: Map[(String, String), Seq[(Long, Int)]] = (0 until 200).map { k =>
      val sessions = (0 until (1 + rnd.nextInt(8))).map { _ =>
        val s = rnd.nextInt(30000).toLong
        (s, s + 1L + rnd.nextInt(2000))
      }
      (s"g$k", "n") -> sessions.flatMap { case (s, e) =>
        Seq((s, 1), (e, -1)) }.sortBy(identity)
    }.toMap
    val events = perKey.toSeq.flatMap { case ((g, n), evs) =>
      evs.map { case (t, d) => Event(g, n, ts(t), d) } }
    val batch = runBatch(events, cooldown)
      .groupBy(e => (e.grp, e.node))
      .view.mapValues(_.map(e => (e.claim, e.emitMs)).sortBy(identity)).toMap
    val reference = perKey.map { case (k, evs) =>
      k -> fold(evs, cooldown).map { case (c, t) => (c, at(t)) }
        .sortBy(identity) }
      .filter(_._2.nonEmpty)
    assert(batch == reference,
      s"windowed plan diverged from the reference fold on " +
        s"${(batch.keySet ++ reference.keySet).find(k =>
          batch.get(k) != reference.get(k))}")
  }

  test("stream == batch over a seeded many-key storm under in-order " +
      "multi-batch slicing, timer leg included") {
    val rnd = new scala.util.Random(42)
    val cooldown = 1000L
    // well-formed by construction: per key, sessions of [start, end)
    // intervals → join at start, leave at end
    val events = (for {
      key <- 0 until 12
      session <- 0 until (3 + rnd.nextInt(5))
    } yield {
      val start = rnd.nextInt(20000).toLong
      val len = 1L + rnd.nextInt(3000)
      val k = s"g${key % 5}"; val n = s"n${key % 3}"
      Seq(Event(k, n, ts(start), 1), Event(k, n, ts(start + len), -1))
    }).flatten.sortBy(e => (e.ts.getTime, e.delta))
    val batch = canon(runBatch(events, cooldown))
    // slice the in-order feed into micro-batches at distinct-timestamp
    // boundaries (the engine's late filter drops rows AT or before the
    // watermark, so an event-time tie must never straddle a batch)
    val feeds = events.groupBy(_.ts.getTime).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_.delta)).grouped(4).map(_.flatten.toSeq).toSeq :+
      Seq(sentinel(10000000L))
    val stream = canon(runStream(feeds, cooldown))
    assert(stream == batch,
      s"stream/batch diverged:\n  stream=$stream\n  batch=$batch")
    // sanity: the storm actually exercised suppression (fewer claims
    // than 0↔1 transitions) and both claim kinds appear
    assert(batch.exists(_.claim == "vacant") &&
      batch.exists(_.claim == "occupied"))
  }
}
