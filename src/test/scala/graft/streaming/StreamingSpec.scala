package graft.streaming

import graft.SparkSpec
import graft.messages.Messages
import graft.rates.Rates
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Streaming semantics (SURVEY §2.8): windowed rate aggregation over an
  * unbounded stream with watermark, and the DB-origin broadcast roundtrip
  * (S7): append to the partitioned log → streaming read = outbound feed. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._
  import StreamingSpec.Tick

  private def t(s: String) = Timestamp.valueOf(s)

  test("rate windows aggregate a live stream (update mode, watermark)") {
    val input = MemoryStream[Tick](spark)
    val rates = Rates.tumbling(
      input.toDF().withWatermark("ts", "10 seconds"), "ts", Seq("k"), 60)
    val q = rates.writeStream.format("memory").queryName("rates_out")
      .outputMode("complete").start()
    try {
      input.addData(
        Tick("a", t("2024-01-01 00:00:05")),
        Tick("a", t("2024-01-01 00:00:25")),
        Tick("b", t("2024-01-01 00:01:10")))
      q.processAllAvailable()
      input.addData(Tick("a", t("2024-01-01 00:00:45")))
      q.processAllAvailable()
      val got = spark.table("rates_out")
        .select("k", "bucket_s", "n").as[(String, Long, Long)].collect().toSet
      val base = t("2024-01-01 00:00:00").getTime / 1000
      assert(got == Set(("a", base, 3L), ("b", base + 60, 1L)))
    } finally q.stop()
  }

  test("limit trigger fires on the stream when a bucket crosses the cap") {
    val input = MemoryStream[Tick](spark)
    val over = Rates.overLimit(
      Rates.tumbling(input.toDF(), "ts", Seq("k"), 60), 2)
    val q = over.writeStream.format("memory").queryName("limit_out")
      .outputMode("complete").start()
    try {
      input.addData(
        Tick("a", t("2024-01-01 00:00:01")), Tick("a", t("2024-01-01 00:00:02")),
        Tick("a", t("2024-01-01 00:00:03")), Tick("b", t("2024-01-01 00:00:04")))
      q.processAllAvailable()
      val got = spark.table("limit_out").select("k").as[String].collect().toSeq
      assert(got == Seq("a")) // only a exceeded 2 events in the bucket
    } finally q.stop()
  }

  test("session windows assemble on the stream; watermark closes them") {
    val input = MemoryStream[Tick](spark)
    val sessions = input.toDF().withWatermark("ts", "10 seconds")
      .groupBy(col("k"), session_window(col("ts"), "30 seconds"))
      .agg(count(lit(1)).as("n"))
      .select(col("k"), col("session_window.start").cast("long").as("s"),
        col("n"))
    val q = sessions.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      // one session of 2 events (gap 10 s < 30 s), then a 60 s gap
      input.addData(
        Tick("a", t("2024-01-01 00:00:00")),
        Tick("a", t("2024-01-01 00:00:10")),
        Tick("a", t("2024-01-01 00:01:10")))
      q.processAllAvailable()
      // advance the watermark far past both sessions so append emits them
      input.addData(Tick("b", t("2024-01-01 00:10:00")))
      q.processAllAvailable()
      input.addData(Tick("b", t("2024-01-01 00:20:00")))
      q.processAllAvailable()
      val got = spark.table("sess_out")
        .as[(String, Long, Long)].collect().toSet
      val base = t("2024-01-01 00:00:00").getTime / 1000
      assert(got.contains(("a", base, 2L)),
        "two events 10 s apart fuse into one session")
      assert(got.contains(("a", base + 70, 1L)),
        "a 60 s gap starts a new session")
    } finally q.stop()
  }

  test("S7 roundtrip: rows appended to the log stream back out") {
    val dir = java.nio.file.Files.createTempDirectory("s7log").toString
    val mk = (id: Long, ts: String) => (id, "room", "{\"x\":1}", true,
      "broadcast", t(ts))
    val cols = Seq("id", "topic", "payload", "private", "extension", "inserted_at")
    Messages.write(Seq(mk(1, "2024-01-01 10:00:00")).toDF(cols: _*), dir)
    val stream = spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .parquet(dir)
      .groupBy("topic").agg(count(lit(1)).as("n"))
    val q = stream.writeStream.format("memory").queryName("s7_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      assert(spark.table("s7_out").as[(String, Long)].collect().toSet ==
        Set(("room", 1L)))
      // a second realtime.send() lands in the stream on the next trigger
      Messages.write(Seq(mk(2, "2024-01-02 10:00:00")).toDF(cols: _*), dir)
      q.processAllAvailable()
      assert(spark.table("s7_out").as[(String, Long)].collect().toSet ==
        Set(("room", 2L)))
    } finally q.stop()
  }
  test("streaming incremental dedup: first digest wins across micro-batches") {
    import StreamingSpec.Doc
    val input = MemoryStream[Doc](spark)
    val out = graft.pipeline.Incremental.streamNewDocs(
      input.toDF(), "text", "doc_id")
    val q = out.writeStream.format("memory").queryName("sdedup_out")
      .outputMode("append").start()
    try {
      input.addData(
        Doc(1L, "alpha", t("2024-01-01 00:00:01")),
        Doc(2L, "beta", t("2024-01-01 00:00:02")),
        Doc(3L, "alpha", t("2024-01-01 00:00:03"))) // within-batch dup
      q.processAllAvailable()
      // cross-batch dups must hit the keyed digest state, not just the
      // batch-local distinct
      input.addData(
        Doc(4L, "alpha", t("2024-01-01 00:01:00")),
        Doc(5L, "gamma", t("2024-01-01 00:01:01")))
      q.processAllAvailable()
      val got = spark.table("sdedup_out")
        .select("doc_id").as[Long].collect().toSet
      assert(got == Set(1L, 2L, 5L),
        "first 'alpha' survives; the within-batch (3) and cross-batch (4) dups drop")
    } finally q.stop()
  }

  test("debounceStream: kept-anchor semantics, anchor crosses batches") {
    import graft.rates.Rates
    import graft.rates.Rates.DebounceEvent
    implicit val s = spark
    val input = MemoryStream[DebounceEvent](spark)
    val q = Rates.debounceStream(input.toDS(), minGapSec = 5L)
      .writeStream.format("memory").queryName("deb_out")
      .outputMode("append").start()
    try {
      // chain of 3-4 s gaps: the BATCH lag form would keep the third
      // event (4 s after the second); the kept-anchor form drops it
      // because the anchor is still the FIRST event
      input.addData(
        DebounceEvent("u", t("2024-01-01 00:00:00"), 1L),
        DebounceEvent("u", t("2024-01-01 00:00:03"), 2L),
        DebounceEvent("u", t("2024-01-01 00:00:04"), 3L))
      q.processAllAvailable()
      // 00:00:08 is 8 s after the kept anchor (00:00:00) → kept, and
      // the anchor update carries into the next batch
      input.addData(DebounceEvent("u", t("2024-01-01 00:00:08"), 4L))
      q.processAllAvailable()
      input.addData(DebounceEvent("u", t("2024-01-01 00:00:11"), 5L))
      q.processAllAvailable()
      val got = spark.table("deb_out").select("tie").as[Long]
        .collect().toSet
      assert(got == Set(1L, 4L),
        s"got $got — 2,3 inside the first anchor's gap; 5 inside 4's")
    } finally q.stop()
  }

  test("debounceStream: sub-millisecond precision matches unix_micros") {
    import graft.rates.Rates
    import graft.rates.Rates.DebounceEvent
    implicit val s = spark
    // anchor at 1.000000 s; second event at 2.000900 s — 1000900 µs
    // later, i.e. strictly beyond a 1 s gap ONLY at microsecond
    // precision (at ms precision the diff is exactly 1000000 → dropped)
    val t0 = new java.sql.Timestamp(1000L)
    val t1 = new java.sql.Timestamp(2000L)
    t1.setNanos(900000) // +900 µs
    val input = MemoryStream[DebounceEvent](spark)
    val q = Rates.debounceStream(input.toDS(), minGapSec = 1L)
      .writeStream.format("memory").queryName("deb_us_out")
      .outputMode("append").start()
    try {
      input.addData(DebounceEvent("u", t0, 1L), DebounceEvent("u", t1, 2L))
      q.processAllAvailable()
      val got = spark.table("deb_us_out").select("tie").as[Long]
        .collect().toSet
      assert(got == Set(1L, 2L),
        s"got $got — the 900 µs residue must count toward the gap")
    } finally q.stop()
  }

  test("transitionStream: cross-batch adjacency via last-event cursor") {
    import graft.rates.Rates
    import graft.rates.Rates.TransitionEvent
    implicit val s = spark
    val input = MemoryStream[TransitionEvent](spark)
    val q = Rates.transitionStream(input.toDS())
      .writeStream.format("memory").queryName("trans_out")
      .outputMode("append").start()
    try {
      input.addData(
        TransitionEvent("u", t("2024-01-01 00:00:01"), 1L, "A"),
        TransitionEvent("u", t("2024-01-01 00:00:02"), 2L, "B"),
        TransitionEvent("v", t("2024-01-01 00:00:03"), 3L, "X"))
      q.processAllAvailable()
      // the batch-2 first event must chain onto u's batch-1 cursor (B)
      input.addData(
        TransitionEvent("u", t("2024-01-01 00:00:09"), 4L, "C"),
        TransitionEvent("v", t("2024-01-01 00:00:10"), 5L, "X"))
      q.processAllAvailable()
      val got = spark.table("trans_out")
        .as[(String, String, String)].collect().toSeq.sorted
      assert(got == Seq(("u", "A", "B"), ("u", "B", "C"),
        ("v", "X", "X")).sorted,
        s"got $got — exactly one increment per adjacency, none lost")
    } finally q.stop()
  }

  // The reap tests sequence via SparkSpec's sink-polling awaitRows
  // (processAllAvailable hangs under ProcessingTimeTimeout).

  test("transitionStream idle reap: a reaped cursor starts a fresh chain") {
    import graft.rates.Rates
    import graft.rates.Rates.TransitionEvent
    implicit val s = spark
    val input = MemoryStream[TransitionEvent](spark)
    val q = Rates.transitionStream(input.toDS(), idleTimeoutMs = 100L)
      .writeStream.format("memory").queryName("trans_reap_out")
      .outputMode("append").start()
    try {
      input.addData(
        TransitionEvent("u", t("2024-01-01 00:00:01"), 1L, "A"),
        TransitionEvent("u", t("2024-01-01 00:00:02"), 2L, "B"))
      awaitRows("trans_reap_out", 1L) // (u, A, B)
      Thread.sleep(600L)              // empty batches fire u's timeout
      // one batch (a staged C-then-D pair would let the 100 ms timeout
      // fire between them and reap C's fresh cursor): without the reap
      // C would chain (u, B, C); the (u, C, D) adjacency proves both
      // events were processed
      input.addData(
        TransitionEvent("u", t("2024-01-01 00:00:09"), 3L, "C"),
        TransitionEvent("u", t("2024-01-01 00:00:10"), 4L, "D"))
      awaitRows("trans_reap_out", 2L) // (u, C, D)
      val got = spark.table("trans_reap_out")
        .as[(String, String, String)].collect().toSeq
      assert(got.contains(("u", "C", "D")))
      assert(!got.contains(("u", "B", "C")),
        s"got $got — the reaped cursor must not chain across the gap")
    } finally q.stop()
  }

  test("debounceStream idle reap: a reaped anchor admits the next event") {
    import graft.rates.Rates
    import graft.rates.Rates.DebounceEvent
    implicit val s = spark
    // idleTimeout deliberately << minGapSec to make the reap observable
    // (production sets idleTimeoutMs ≥ minGapSec·1000 for invariance)
    val input = MemoryStream[DebounceEvent](spark)
    val q = Rates.debounceStream(input.toDS(), minGapSec = 5L,
        idleTimeoutMs = 100L)
      .writeStream.format("memory").queryName("deb_reap_out")
      .outputMode("append").start()
    try {
      input.addData(DebounceEvent("u", t("2024-01-01 00:00:00"), 1L))
      awaitRows("deb_reap_out", 1L)
      Thread.sleep(600L) // empty batches fire u's timeout
      // 3 s after the old anchor: a kept anchor would suppress this
      input.addData(DebounceEvent("u", t("2024-01-01 00:00:03"), 2L))
      awaitRows("deb_reap_out", 2L)
      val got = spark.table("deb_reap_out").select("tie").as[Long]
        .collect().toSet
      assert(got == Set(1L, 2L),
        s"got $got — the reaped anchor must admit tie=2")
    } finally q.stop()
  }

  test("late data beyond the watermark is dropped AND accounted") {
    val input = MemoryStream[Tick](spark)
    val agg = input.toDF().withWatermark("ts", "10 seconds")
      .groupBy(col("k"), window(col("ts"), "60 seconds"))
      .agg(count(lit(1)).as("n"))
      .select(col("k"), col("window.start").cast("long").as("w"), col("n"))
    val q = agg.writeStream.format("memory").queryName("late_out")
      .outputMode("append").start()
    try {
      input.addData(Tick("a", t("2024-01-01 00:10:00")))
      q.processAllAvailable()
      // watermark is now 00:09:50; this event is 9+ minutes older and
      // its window [00:00, 00:01) is already closed
      input.addData(Tick("a", t("2024-01-01 00:00:30")))
      q.processAllAvailable()
      // advance far enough to close + emit the 00:10 window
      input.addData(Tick("a", t("2024-01-01 00:20:00")))
      q.processAllAvailable()
      val dropped = q.recentProgress
        .map(p => Option(p.stateOperators).toSeq.flatten
          .map(_.numRowsDroppedByWatermark).sum).sum
      assert(dropped == 1L,
        "the driver can ACCOUNT for shed late rows, not just lose them")
      val got = spark.table("late_out").as[(String, Long, Long)]
        .collect().map { case (k, w, n) => (k, w) -> n }.toMap
      val base = t("2024-01-01 00:10:00").getTime / 1000
      assert(got((("a", base))) == 1L,
        "the closed 00:10 window emits WITHOUT the late row")
    } finally q.stop()
  }
}

object StreamingSpec {
  case class Tick(k: String, ts: Timestamp)
  case class Doc(doc_id: Long, text: String, ts: Timestamp)
}
