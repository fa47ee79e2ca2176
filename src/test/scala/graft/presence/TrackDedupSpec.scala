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
}
