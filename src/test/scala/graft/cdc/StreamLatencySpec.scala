package graft.cdc

import graft.SparkSpec

/** The latency harness itself: stamp parsing, sample plumbing, report
  * shape. Absolute latency values are machine-dependent — the spec pins
  * structure (every delivery measured, percentile ordering), not numbers. */
class StreamLatencySpec extends SparkSpec {

  test("parseCommitMs: extracts the stamp, rejects malformed frames") {
    assert(StreamLatency.parseCommitMs(
      """{"type":"INSERT","commit_timestamp":"1723500000123","record":{}}""")
      == 1723500000123L)
    assert(StreamLatency.parseCommitMs("""{"type":"INSERT"}""") == -1L)
    assert(StreamLatency.parseCommitMs(
      """{"commit_timestamp":"2024-01-01T00:00:00Z"}""") == -1L)
  }

  test("run: rates that would silently truncate the 50 ms feed step are rejected") {
    val e = intercept[IllegalArgumentException] {
      StreamLatency.run(spark, ratePerSec = 30, seconds = 1, warmupSec = 0)
    }
    assert(e.getMessage.contains("multiple of 20"))
  }

  test("run: every sent change is measured once; percentiles are ordered") {
    val r = StreamLatency.run(spark, ratePerSec = 200, seconds = 2,
      triggerMs = 25L, warmupSec = 1)
    assert(r.nSent == 400L, s"feeder sent ${r.nSent}")
    assert(r.nDelivered == r.nSent,
      s"one match-all subscriber → deliveries == changes, got $r")
    assert(r.overall.n == r.nDelivered)
    assert(r.overall.p50 >= 0L && r.overall.p50 <= r.overall.p95 &&
      r.overall.p95 <= r.overall.p99 && r.overall.p99 <= r.overall.max, s"$r")
    // steady window is a subset of overall
    assert(r.steady.n > 0L && r.steady.n <= r.overall.n)
    assert(r.batchDurationP95Ms >= 0L)
  }
}
