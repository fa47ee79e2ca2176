package graft.presence

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** Pins check_track_payload + the track arms
  * (presence_handler.ex:122-193): repeat-payload no-op, untrack reset,
  * invalid/oversize tracks not poisoning the memory, dedup checked
  * BEFORE the size guard. */
class TrackDedupSpec extends SparkSpec {

  private def t(sec: Int) = new Timestamp(1700000000000L + sec * 1000L)

  private def run(rows: Seq[(String, Timestamp, Long, String, String,
      Boolean, Long)]): Map[Long, (String, Boolean)] = {
    val df = spark.createDataFrame(rows)
      .toDF("socket", "ts", "tie", "event", "payload", "is_map", "bytes")
    Presence.trackDedup(df, "socket", "ts", "tie", "event", "payload",
        "is_map", "bytes", lit(1))
      .collect().map(r => r.getLong(2) ->
        ((r.getString(7), r.getBoolean(8)))).toMap
  }

  test("repeat payload is a silent no-op; untrack resets the memory") {
    val got = run(Seq(
      ("A", t(1), 1L, "track", "{\"v\": 1}", true, 10L),
      ("A", t(2), 2L, "track", "{\"v\": 1}", true, 10L),   // no-op
      ("A", t(3), 3L, "track", "{\"v\": 2}", true, 10L),   // change
      ("A", t(4), 4L, "untrack", "{}", true, 0L),
      ("A", t(5), 5L, "track", "{\"v\": 2}", true, 10L)))  // re-track
    assert(got(1L) == (("tracked", true)))
    assert(got(2L) == (("no_change", false)))
    assert(got(3L) == (("tracked", true)))
    assert(got(4L) == (("untracked", false)))
    assert(got(5L) == (("tracked", true)))
  }

  test("invalid and oversize tracks error without updating the memory; " +
      "the dedup outranks the size guard") {
    val got = run(Seq(
      ("B", t(1), 1L, "track", "nope", false, 4L),          // invalid
      ("B", t(2), 2L, "track", "{\"v\": 1}", true, 10L),    // tracked
      ("B", t(3), 3L, "track", "{\"v\": 1}", true, 10L),    // no-op
      // same payload with huge bytes: check_track_payload runs FIRST,
      // so this is a no-op, not payload_too_large
      ("B", t(4), 4L, "track", "{\"v\": 1}", true, 99999L),
      // oversize NEW payload errors and does NOT become the memory
      ("B", t(5), 5L, "track", "{\"v\": 9}", true, 99999L),
      // the same payload now in-size: tracked (memory never held it)
      ("B", t(6), 6L, "track", "{\"v\": 9}", true, 10L)))
    assert(got(1L) == (("invalid_payload", false)))
    assert(got(2L) == (("tracked", true)))
    assert(got(3L) == (("no_change", false)))
    assert(got(4L) == (("no_change", false)))
    assert(got(5L) == (("payload_too_large", false)))
    assert(got(6L) == (("tracked", true)))
  }

  test("pipeline: the client window is consumed by no-op re-tracks and " +
      "untracks; a denied message neither consumes nor touches memory") {
    // maxCalls 2, window 10 s (us scale): every client presence message
    // runs the window first (presence_handler.ex:69-78)
    def run(rows: Seq[(String, Timestamp, Long, String, String, Boolean,
        Long)]): Map[Long, String] = {
      val df = spark.createDataFrame(rows)
        .toDF("socket", "ts", "tie", "event", "payload", "is_map", "bytes")
      Presence.trackPipeline(df, "socket", "ts", "tie", "event",
          "payload", "is_map", "bytes", maxPayloadKb = 1, maxCalls = 2,
          windowMs = 10000L)
        .collect().map(r => r.getLong(1) -> r.getString(2)).toMap
    }
    val got = run(Seq(
      ("A", t(1), 1L, "track", "{\"v\": 1}", true, 10L),   // tracked (1/2)
      // the no-op re-track still burns the second window slot
      ("A", t(2), 2L, "track", "{\"v\": 1}", true, 10L),   // no_change (2/2)
      // window full: a NEW payload is denied — and must NOT become the
      // memory
      ("A", t(3), 3L, "track", "{\"v\": 2}", true, 10L),
      // window expired (anchor t1 + 10 s): the same new payload tracks —
      // proof the denied attempt never updated the memory
      ("A", t(12), 4L, "track", "{\"v\": 2}", true, 10L),
      // untrack consumes a slot too (2/2 of the new window)...
      ("A", t(13), 5L, "untrack", "{}", true, 0L),
      // ...so this in-window track is denied
      ("A", t(14), 6L, "track", "{\"v\": 3}", true, 10L)))
    assert(got(1L) == "tracked")
    assert(got(2L) == "no_change")
    assert(got(3L) == "client_rate_limited")
    assert(got(4L) == "tracked")
    assert(got(5L) == "untracked")
    assert(got(6L) == "client_rate_limited")
  }

  test("streaming twin: memory carries across micro-batches; parity " +
      "with the batch window replay") {
    import graft.presence.Presence.{TrackDecisionRow, TrackEvent}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val s = spark
    import s.implicits._
    val batches = Seq(
      Seq(TrackEvent("A", 1L, 1L, "track", "{\"v\": 1}", true, 10L)),
      // mb 2: the memory crossed the boundary → no-op; untrack resets
      Seq(TrackEvent("A", 2L, 2L, "track", "{\"v\": 1}", true, 10L),
        TrackEvent("A", 3L, 3L, "untrack", "{}", true, 0L)),
      // mb 3: post-reset re-track applies
      Seq(TrackEvent("A", 4L, 4L, "track", "{\"v\": 1}", true, 10L),
        TrackEvent("A", 5L, 5L, "track", "{\"v\": 9}", true, 9999L)))
    val input = MemoryStream[TrackEvent](spark)
    val q = Presence.trackDedupStream(input.toDS(), maxPayloadKb = 1)
      .writeStream.format("memory").queryName("track_dedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      val streamed = spark.table("track_dedup_out").as[TrackDecisionRow]
        .collect().map(d => d.tie -> ((d.decision, d.rate_counted))).toMap
      assert(streamed(1L) == (("tracked", true)))
      assert(streamed(2L) == (("no_change", false)))
      assert(streamed(3L) == (("untracked", false)))
      assert(streamed(4L) == (("tracked", true)))
      assert(streamed(5L) == (("payload_too_large", false)))
      val batchDf = spark.createDataFrame(batches.flatten.map(e =>
          (e.socket, new Timestamp(e.us), e.tie, e.event, e.payload,
            e.isMap, e.bytes)))
        .toDF("socket", "ts", "tie", "event", "payload", "is_map", "bytes")
      val replayed = Presence.trackDedup(batchDf, "socket", "ts", "tie",
          "event", "payload", "is_map", "bytes", lit(1))
        .collect().map(r => r.getLong(2) ->
          ((r.getString(7), r.getBoolean(8)))).toMap
      assert(replayed == streamed)
    } finally q.stop()
  }
}
