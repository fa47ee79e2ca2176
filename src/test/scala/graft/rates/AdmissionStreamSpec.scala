package graft.rates

import graft.SparkSpec
import graft.rates.AdmissionStream.{Attempt, Call, Decision, SizedAttempt}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** The live check_tenant gate: ring + slot state crossing micro-batch
  * boundaries, and decision parity with the batch replay twin. */
class AdmissionStreamSpec extends SparkSpec {
  import spark.implicits._

  private val attempts = Seq(
    // batch 1: burst claims the window; users 1 and 2 claim both slots
    Seq(Attempt("t", 1L, 0L, 1L), Attempt("t", 1L, 0L, 2L),
      Attempt("t", 2L, 0L, 3L)),
    // batch 2: the batch-1 burst gates tick 1 (ring carried across),
    // tick 3 drains; user 3 finds the slots taken
    Seq(Attempt("t", 1L, 1L, 4L), Attempt("t", 3L, 2L, 5L),
      Attempt("t", 1L, 3L, 6L)))

  test("ring and slots carry across micro-batches; parity with batch twin") {
    implicit val s = spark
    val input = MemoryStream[Attempt](spark)
    val q = AdmissionStream(input.toDS(), maxConcurrent = 2,
        limitNum = 1L, limitDen = 1L, tickSec = 1L, windowTicks = 2)
      .writeStream.format("memory").queryName("adm_out")
      .outputMode(OutputMode.Append).start()
    try {
      attempts.foreach { b => input.addData(b); q.processAllAvailable() }
      val streamed = spark.table("adm_out").as[Decision].collect()
        .map(d => d.tie -> d.status).toMap
      assert(streamed(1L) == "ok" && streamed(2L) == "ok" && streamed(3L) == "ok")
      assert(streamed(4L) == "too_many_joins")     // gated by batch-1 burst
      assert(streamed(5L) == "too_many_connections")
      assert(streamed(6L) == "ok")                 // tick-0 bucket expired
      // parity: the batch replay over the same log decides identically
      val batchDf = spark.createDataFrame(attempts.flatten.map(a =>
          (new java.sql.Timestamp(a.epochSec * 1000L), a.user, a.tenant, a.tie)))
        .toDF("ts", "user_id", "event_type", "event_id")
      val replayed = Rates.joinAdmission(batchDf, "event_type", "user_id",
          "ts", "event_id", maxConcurrent = 2, limitNum = 1L, limitDen = 1L,
          tickSec = 1L, windowTicks = 2)
        .collect().map(r => r.getLong(1) -> r.getString(2)).toMap
      assert(replayed == streamed)
    } finally q.stop()
  }

  test("shutdown twin: deaths are absorbing across batches; parity with batch replay") {
    implicit val s = spark
    val batches = Seq(
      // batch 1: tick-0 burst counts (len=0 → all ok)
      Seq(Attempt("t", 1L, 0L, 1L), Attempt("t", 2L, 0L, 2L)),
      // batch 2: tick 1 flagged (sum=2 ≥ len=1) → u1 dies at first
      // delivery, stays dead; u2 dies at its own
      Seq(Attempt("t", 1L, 1L, 3L), Attempt("t", 1L, 1L, 4L),
        Attempt("t", 2L, 1L, 5L)),
      // batch 3: tick 4 — window [2,3] holds only the two shutdown
      // counts at tick 1? no: pruned (1 < 4−2) → empty → unflagged;
      // dead u1 still dropped, fresh u3 delivers
      Seq(Attempt("t", 1L, 4L, 6L), Attempt("t", 3L, 4L, 7L)))
    val input = MemoryStream[Attempt](spark)
    val q = AdmissionStream.shutdownStream(input.toDS(),
        limitNum = 1L, limitDen = 1L, tickSec = 1L, windowTicks = 2)
      .writeStream.format("memory").queryName("shut_out")
      .outputMode(OutputMode.Append).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      val streamed = spark.table("shut_out").as[Decision].collect()
        .map(d => d.tie -> d.status).toMap
      assert(streamed(1L) == "ok" && streamed(2L) == "ok")
      assert(streamed(3L) == "shutdown" && streamed(4L) == "dropped")
      assert(streamed(5L) == "shutdown")
      assert(streamed(6L) == "dropped") // death crossed two batch boundaries
      assert(streamed(7L) == "ok")
      val batchDf = spark.createDataFrame(batches.flatten.map(a =>
          (new java.sql.Timestamp(a.epochSec * 1000L), a.user, a.tenant, a.tie)))
        .toDF("ts", "user_id", "event_type", "event_id")
      val replayed = Rates.messageRateShutdown(batchDf, "event_type",
          "user_id", "ts", "event_id", limitNum = 1L, limitDen = 1L,
          tickSec = 1L, windowTicks = 2)
        .collect().map(r => r.getLong(1) -> r.getString(2)).toMap
      assert(replayed == streamed)
    } finally q.stop()
  }

  test("batch twin: ring carries across micro-batches; parity with batch replay") {
    implicit val s = spark
    val batches = Seq(
      // mb 1, tick 0: creation tick admits both size-1 batches; ring{0:2}
      Seq(SizedAttempt("t", 0L, 1L, 1L), SizedAttempt("t", 0L, 2L, 1L)),
      // mb 2: tick 1 — the mb-1 ring crossed the boundary: sum=2 > L=1 →
      // rate_limited; tick 4 — drained window, len=2: size 2 → 2·2 > 2 →
      // batch_too_large, then size 1 admits (denied batch didn't count)
      Seq(SizedAttempt("t", 1000000L, 3L, 1L),
        SizedAttempt("t", 4000000L, 4L, 2L),
        SizedAttempt("t", 4000000L, 5L, 1L)))
    val input = MemoryStream[SizedAttempt](spark)
    val q = AdmissionStream.batchStream(input.toDS(),
        limitNum = 1L, limitDen = 1L, tickSec = 1L, windowTicks = 2)
      .writeStream.format("memory").queryName("batch_adm_out")
      .outputMode(OutputMode.Append).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      val streamed = spark.table("batch_adm_out").as[Decision].collect()
        .map(d => d.tie -> d.status).toMap
      assert(streamed(1L) == "ok" && streamed(2L) == "ok")
      assert(streamed(3L) == "rate_limited")   // gated by the mb-1 ring
      assert(streamed(4L) == "batch_too_large")
      assert(streamed(5L) == "ok")
      val batchDf = spark.createDataFrame(batches.flatten.map(b =>
          (new java.sql.Timestamp(b.us / 1000L), b.tenant, b.tie, b.n)))
        .toDF("ts", "event_type", "batch_id", "n")
      val replayed = Rates.batchAdmission(batchDf, "event_type", "ts",
          "batch_id", "n", limitNum = 1L, limitDen = 1L,
          tickSec = 1L, windowTicks = 2)
        .collect().map(r => r.getLong(1) -> r.getString(2)).toMap
      assert(replayed == streamed)
    } finally q.stop()
  }

  test("single-broadcast twin: gate order and ring carry across " +
      "micro-batches; parity with batch replay") {
    import graft.rates.AdmissionStream.SingleAttempt
    implicit val s = spark
    val batches = Seq(
      // mb 1, tick 0: admits; the suspended row advances the clock only
      Seq(SingleAttempt("t", 0L, 1L, false, true, true),
        SingleAttempt("t", 0L, 2L, true, true, true)),
      // mb 2, tick 1: the mb-1 ring crossed the boundary — sum=1 >= l=1
      // (the endpoint's >= boundary); invalid still ranks above rate
      Seq(SingleAttempt("t", 1000000L, 3L, false, true, true),
        SingleAttempt("t", 1000000L, 4L, false, false, true)),
      // mb 3, tick 4: drained window — authz is the last gate
      Seq(SingleAttempt("t", 4000000L, 5L, false, true, false),
        SingleAttempt("t", 4000000L, 6L, false, true, true)))
    val input = MemoryStream[SingleAttempt](spark)
    val q = AdmissionStream.singleStream(input.toDS(),
        limitNum = 1L, limitDen = 1L, tickSec = 1L, windowTicks = 2)
      .writeStream.format("memory").queryName("single_adm_out")
      .outputMode(OutputMode.Append).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      val streamed = spark.table("single_adm_out").as[Decision].collect()
        .map(d => d.tie -> d.status).toMap
      assert(streamed(1L) == "ok")
      assert(streamed(2L) == "forbidden_suspended")
      assert(streamed(3L) == "rate_limited")
      assert(streamed(4L) == "invalid")
      assert(streamed(5L) == "forbidden")
      assert(streamed(6L) == "ok")
      val batchDf = spark.createDataFrame(batches.flatten.map(r =>
          (new java.sql.Timestamp(r.us / 1000L), r.tenant, r.tie,
            r.suspend, r.valid, r.writeAllowed)))
        .toDF("ts", "tenant", "req_id", "suspend", "valid",
          "write_allowed")
      val replayed = Rates.singleAdmission(batchDf, "tenant", "ts",
          "req_id", "suspend", "valid", "write_allowed", limitNum = 1L,
          limitDen = 1L, tickSec = 1L, windowTicks = 2)
        .collect().map(r => r.getLong(1) -> r.getString(2)).toMap
      assert(replayed == streamed)
    } finally q.stop()
  }

  test("client-window twin: anchor chain crosses batches; parity with batch replay") {
    implicit val s = spark
    val batches = Seq(
      // mb 1: anchor at us=0 (window 1 s), second call passes, third denied
      Seq(Call("k", 0L, 1L), Call("k", 400000L, 2L), Call("k", 500000L, 3L)),
      // mb 2: the window opened in mb 1 still gates; a boundary-exact call
      // (us == resetAt) stays INSIDE the window (strict > reset); the next
      // call past expiry re-anchors
      Seq(Call("k", 900000L, 4L), Call("k", 1000000L, 5L),
        Call("k", 1001000L, 6L)),
      // mb 3: the re-anchored window (expires 2001000) admits one more
      // call, then denies — the chain, not a tumbling bucket
      Seq(Call("k", 1500000L, 7L), Call("k", 1600000L, 8L)))
    val input = MemoryStream[Call](spark)
    val q = AdmissionStream.clientWindowStream(input.toDS(),
        maxCalls = 2, windowMs = 1000L)
      .writeStream.format("memory").queryName("cw_adm_out")
      .outputMode(OutputMode.Append).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      val streamed = spark.table("cw_adm_out").as[Decision].collect()
        .map(d => d.tie -> d.status).toMap
      assert(streamed(1L) == "ok" && streamed(2L) == "ok")
      assert(streamed(3L) == "rate_limited")
      assert(streamed(4L) == "rate_limited")   // carried across the boundary
      assert(streamed(5L) == "rate_limited")   // us == resetAt: still inside
      assert(streamed(6L) == "ok")             // re-anchored
      assert(streamed(7L) == "ok" && streamed(8L) == "rate_limited")
      val batchDf = spark.createDataFrame(batches.flatten.map(c =>
          (new java.sql.Timestamp(c.us / 1000L), c.key, c.tie)))
        .toDF("ts", "client", "call_id")
      val replayed = Rates.clientWindowLimit(batchDf, Seq("client"), "ts",
          "call_id", maxCalls = 2, windowMs = 1000L)
        .collect().map(r => r.getLong(1) -> r.getString(2)).toMap
      assert(replayed == streamed)
    } finally q.stop()
  }

  test("presence-rate twin: strict > boundary, ring carry; parity with batch replay") {
    implicit val s = spark
    val batches = Seq(
      // mb 1, tick 0: creation tick (len=0) admits both; ring{0:2}
      Seq(Call("t", 0L, 1L), Call("t", 0L, 2L)),
      // mb 2: tick 1 — sum=2 > 1 → denied (ring carried); tick 2 —
      // sum=2 > 2 is FALSE (STRICT >, the limit-exact window admits,
      // where the joins gate's >= would deny)
      Seq(Call("t", 1000000L, 3L), Call("t", 2000000L, 4L)),
      // mb 3: tick 3 — tick 0 pruned, sum=1 (only the tick-2 admit) → ok
      Seq(Call("t", 3000000L, 5L)))
    val input = MemoryStream[Call](spark)
    val q = AdmissionStream.presenceRateStream(input.toDS(),
        limitNum = 1L, limitDen = 1L, tickSec = 1L, windowTicks = 2)
      .writeStream.format("memory").queryName("pr_adm_out")
      .outputMode(OutputMode.Append).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      val streamed = spark.table("pr_adm_out").as[Decision].collect()
        .map(d => d.tie -> d.status).toMap
      assert(streamed(1L) == "ok" && streamed(2L) == "ok")
      assert(streamed(3L) == "rate_limited")
      assert(streamed(4L) == "ok")             // strict >: at-limit admits
      assert(streamed(5L) == "ok")
      val batchDf = spark.createDataFrame(batches.flatten.map(c =>
          (new java.sql.Timestamp(c.us / 1000L), c.key, c.tie)))
        .toDF("ts", "event_type", "event_id")
      val replayed = Rates.presenceRateAdmission(batchDf, "event_type",
          "ts", "event_id", limitNum = 1L, limitDen = 1L,
          tickSec = 1L, windowTicks = 2)
        .collect().map(r => r.getLong(1) -> r.getString(2)).toMap
      assert(replayed == streamed)
    } finally q.stop()
  }

  test("randomized chunked-log parity: all five twins match their batch replays") {
    implicit val s = spark
    val rnd = new scala.util.Random(42)
    def ts(sec: Long): java.sql.Timestamp = new java.sql.Timestamp(sec * 1000L)
    val tenants = Seq("t1", "t2", "t3")

    // one shared attempt log (join + shutdown twins read the same shape);
    // sorted, then split into contiguous chunks — the per-key FIFO
    // arrival the kernels document
    val attempts = (1 to 240).map(i => Attempt(tenants(rnd.nextInt(3)),
        1L + rnd.nextInt(6), rnd.nextInt(30).toLong, i.toLong))
      .sortBy(a => (a.epochSec, a.tie))
    val attemptChunks = attempts.grouped(60).toSeq

    def streamed[T](input: MemoryStream[T], chunks: Seq[Seq[T]],
        out: org.apache.spark.sql.Dataset[Decision], name: String)
        : Map[Long, String] = {
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      try {
        chunks.foreach { c => input.addData(c); q.processAllAvailable() }
        spark.table(name).as[Decision].collect()
          .map(d => d.tie -> d.status).toMap
      } finally q.stop()
    }

    // join twin vs batch replay
    val joinIn = MemoryStream[Attempt](spark)
    val joinGot = streamed(joinIn, attemptChunks,
      AdmissionStream(joinIn.toDS(), maxConcurrent = 3,
        limitNum = 3L, limitDen = 2L, tickSec = 2L, windowTicks = 4),
      "rand_join_out")
    val joinDf = spark.createDataFrame(attempts.map(a =>
        (ts(a.epochSec), a.user, a.tenant, a.tie)))
      .toDF("ts", "user_id", "tenant", "event_id")
    val joinExp = Rates.joinAdmission(joinDf, "tenant", "user_id", "ts",
        "event_id", maxConcurrent = 3, limitNum = 3L, limitDen = 2L,
        tickSec = 2L, windowTicks = 4)
      .collect().map(r => r.getLong(1) -> r.getString(2)).toMap
    assert(joinGot == joinExp, "join twin diverged")

    // shutdown twin vs batch replay
    val shutIn = MemoryStream[Attempt](spark)
    val shutGot = streamed(shutIn, attemptChunks,
      AdmissionStream.shutdownStream(shutIn.toDS(),
        limitNum = 3L, limitDen = 2L, tickSec = 2L, windowTicks = 4),
      "rand_shut_out")
    val shutExp = Rates.messageRateShutdown(joinDf, "tenant", "user_id",
        "ts", "event_id", limitNum = 3L, limitDen = 2L,
        tickSec = 2L, windowTicks = 4)
      .collect().map(r => r.getLong(1) -> r.getString(2)).toMap
    assert(shutGot == shutExp, "shutdown twin diverged")

    // batch-broadcast twin vs batch replay (batch-weighted ring)
    val sized = (1 to 240).map(i => SizedAttempt(tenants(rnd.nextInt(3)),
        rnd.nextInt(30).toLong * 1000000L, i.toLong, 1L + rnd.nextInt(4)))
      .sortBy(b => (b.us, b.tie))
    val sizedIn = MemoryStream[SizedAttempt](spark)
    val sizedGot = streamed(sizedIn, sized.grouped(60).toSeq,
      AdmissionStream.batchStream(sizedIn.toDS(),
        limitNum = 2L, limitDen = 1L, tickSec = 2L, windowTicks = 4),
      "rand_batch_out")
    val sizedDf = spark.createDataFrame(sized.map(b =>
        (new java.sql.Timestamp(b.us / 1000L), b.tenant, b.tie, b.n)))
      .toDF("ts", "tenant", "batch_id", "n")
    val sizedExp = Rates.batchAdmission(sizedDf, "tenant", "ts", "batch_id",
        "n", limitNum = 2L, limitDen = 1L, tickSec = 2L, windowTicks = 4)
      .collect().map(r => r.getLong(1) -> r.getString(2)).toMap
    assert(sizedGot == sizedExp, "batch twin diverged")

    // client-window + presence-rate twins vs batch replays (Call shape)
    val calls = (1 to 240).map(i => Call(tenants(rnd.nextInt(3)),
        rnd.nextInt(30).toLong * 1000000L, i.toLong))
      .sortBy(c => (c.us, c.tie))
    val callDf = spark.createDataFrame(calls.map(c =>
        (new java.sql.Timestamp(c.us / 1000L), c.key, c.tie)))
      .toDF("ts", "client", "call_id")
    val cwIn = MemoryStream[Call](spark)
    val cwGot = streamed(cwIn, calls.grouped(60).toSeq,
      AdmissionStream.clientWindowStream(cwIn.toDS(),
        maxCalls = 3, windowMs = 7000L),
      "rand_cw_out")
    val cwExp = Rates.clientWindowLimit(callDf, Seq("client"), "ts",
        "call_id", maxCalls = 3, windowMs = 7000L)
      .collect().map(r => r.getLong(1) -> r.getString(2)).toMap
    assert(cwGot == cwExp, "client-window twin diverged")

    val prIn = MemoryStream[Call](spark)
    val prGot = streamed(prIn, calls.grouped(60).toSeq,
      AdmissionStream.presenceRateStream(prIn.toDS(),
        limitNum = 3L, limitDen = 2L, tickSec = 2L, windowTicks = 4),
      "rand_pr_out")
    val prExp = Rates.presenceRateAdmission(callDf, "client", "ts",
        "call_id", limitNum = 3L, limitDen = 2L,
        tickSec = 2L, windowTicks = 4)
      .collect().map(r => r.getLong(1) -> r.getString(2)).toMap
    assert(prGot == prExp, "presence-rate twin diverged")
  }

  // ── idle reap (idleTimeoutMs > 0): the reference's wall-clock idle-counter
  // sweep. Each test proves the reap by a DECISION that differs between
  // reaped (fresh counter) and kept state, sequenced via SparkSpec's
  // sink-polling awaitRows (processAllAvailable hangs under
  // ProcessingTimeTimeout). Sleeps are 6× the timeout — generous against
  // clock jitter.

  private def reapGap(): Unit = Thread.sleep(600L)

  test("idle reap, join twin: ring drops, claimed slots survive") {
    implicit val s = spark
    val input = MemoryStream[Attempt](spark)
    val q = AdmissionStream(input.toDS(), maxConcurrent = 1,
        limitNum = 1L, limitDen = 1L, tickSec = 1L, windowTicks = 2,
        idleTimeoutMs = 100L)
      .writeStream.format("memory").queryName("reap_join_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Seq(Attempt("t", 1L, 0L, 1L), Attempt("t", 1L, 0L, 2L),
        Attempt("t", 2L, 0L, 3L)))
      awaitRows("reap_join_out", 3L)
      reapGap() // empty micro-batches fire t's timeout during the gap
      input.addData(Seq(Attempt("t", 1L, 1L, 4L), Attempt("t", 2L, 1L, 5L)))
      awaitRows("reap_join_out", 5L)
      val got = spark.table("reap_join_out").as[Decision].collect()
        .map(d => d.tie -> d.status).toMap
      assert(got(1L) == "ok" && got(2L) == "ok")
      assert(got(3L) == "too_many_connections")
      // reaped ring: tick 1 would read sum=2 ≥ 1 without the reap
      assert(got(4L) == "ok")
      // kept slots: user 2 is still locked out after the reap
      assert(got(5L) == "too_many_connections")
    } finally q.stop()
  }

  test("idle reap, shutdown twin: ring drops, dead set survives") {
    implicit val s = spark
    val input = MemoryStream[Attempt](spark)
    val q = AdmissionStream.shutdownStream(input.toDS(),
        limitNum = 1L, limitDen = 1L, tickSec = 1L, windowTicks = 2,
        idleTimeoutMs = 100L)
      .writeStream.format("memory").queryName("reap_shut_out")
      .outputMode(OutputMode.Append).start()
    try {
      // one setup batch (staged batches would let the 100 ms timeout fire
      // mid-setup): tick 0 counts, tick 1 is flagged → u1 dies
      input.addData(Seq(Attempt("t", 1L, 0L, 1L), Attempt("t", 2L, 0L, 2L),
        Attempt("t", 1L, 1L, 3L)))
      awaitRows("reap_shut_out", 3L)
      reapGap()
      input.addData(Seq(Attempt("t", 1L, 2L, 4L), Attempt("t", 3L, 2L, 5L)))
      awaitRows("reap_shut_out", 5L)
      val got = spark.table("reap_shut_out").as[Decision].collect()
        .map(d => d.tie -> d.status).toMap
      assert(got(3L) == "shutdown")
      assert(got(4L) == "dropped") // death survived the reap
      // reaped ring: tick 2 would read sum=3 ≥ 2 without the reap
      assert(got(5L) == "ok")
    } finally q.stop()
  }

  test("idle reap, batch twin: pure rate counter is removed outright") {
    implicit val s = spark
    val input = MemoryStream[SizedAttempt](spark)
    val q = AdmissionStream.batchStream(input.toDS(),
        limitNum = 1L, limitDen = 1L, tickSec = 1L, windowTicks = 2,
        idleTimeoutMs = 100L)
      .writeStream.format("memory").queryName("reap_batch_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Seq(SizedAttempt("t", 0L, 1L, 1L)))
      awaitRows("reap_batch_out", 1L)
      reapGap()
      input.addData(Seq(SizedAttempt("t", 1000000L, 3L, 1L)))
      awaitRows("reap_batch_out", 2L)
      val got = spark.table("reap_batch_out").as[Decision].collect()
        .map(d => d.tie -> d.status).toMap
      // fresh counter admits; kept state would read 1·1+1 > 1 → too large
      assert(got(3L) == "ok")
    } finally q.stop()
  }

  test("idle reap, client-window twin: reaped window re-anchors on contact") {
    implicit val s = spark
    val input = MemoryStream[Call](spark)
    // idleTimeout deliberately << windowMs to make the reap observable:
    // production sets idleTimeoutMs ≥ windowMs for decision invariance
    val q = AdmissionStream.clientWindowStream(input.toDS(),
        maxCalls = 1, windowMs = 3600000L, idleTimeoutMs = 100L)
      .writeStream.format("memory").queryName("reap_cw_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Seq(Call("k", 0L, 1L), Call("k", 1000L, 2L)))
      awaitRows("reap_cw_out", 2L)
      reapGap()
      input.addData(Seq(Call("k", 2000L, 3L)))
      awaitRows("reap_cw_out", 3L)
      val got = spark.table("reap_cw_out").as[Decision].collect()
        .map(d => d.tie -> d.status).toMap
      assert(got(1L) == "ok" && got(2L) == "rate_limited")
      assert(got(3L) == "ok") // re-anchored; kept state would deny
    } finally q.stop()
  }

  test("idle reap, presence-rate twin: pure rate counter is removed outright") {
    implicit val s = spark
    val input = MemoryStream[Call](spark)
    val q = AdmissionStream.presenceRateStream(input.toDS(),
        limitNum = 1L, limitDen = 1L, tickSec = 1L, windowTicks = 2,
        idleTimeoutMs = 100L)
      .writeStream.format("memory").queryName("reap_pr_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Seq(Call("t", 0L, 1L), Call("t", 0L, 2L)))
      awaitRows("reap_pr_out", 2L)
      reapGap()
      input.addData(Seq(Call("t", 1000000L, 3L)))
      awaitRows("reap_pr_out", 3L)
      val got = spark.table("reap_pr_out").as[Decision].collect()
        .map(d => d.tie -> d.status).toMap
      // fresh counter: len=0 admits; kept state would read sum=2 > 1
      assert(got(3L) == "ok")
    } finally q.stop()
  }
}
