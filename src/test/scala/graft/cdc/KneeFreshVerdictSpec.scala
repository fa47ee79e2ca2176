package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

import graft.KneeFresh

/** Pins the knee-artifact adjudication logic (no Spark needed — the
  * decisions are pure functions of the two control samples).
  *
  * The regression this fences: BENCH_r12's `knee_fresh` recorded
  * `max_sustained_rate: 160000, host_health: 1.071, suspect: false`
  * while its own end-of-sweep control read `host_health_end: 0.282` —
  * the host collapsed MID-sweep, the trend stamp captured it, but the
  * headline boolean read only the start sample and called the knee
  * clean. The verdict must fold in min(start, end), and a
  * healthy-start/collapsed-end pair must trigger one sweep re-run.
  */
class KneeFreshVerdictSpec extends AnyFunSuite {
  private val S = KneeFresh.HealthSuspect

  test("the r12 driver artifact (start 1.071, end 0.282) is suspect") {
    assert(KneeFresh.suspectVerdict(bandApplies = true, 1.071, 0.282))
  }

  test("r12 artifact shape triggers exactly the sweep retry path") {
    assert(KneeFresh.shouldRetrySweep(bandApplies = true, 1.071, 0.282))
  }

  test("healthy start AND end is clean, no retry") {
    assert(!KneeFresh.suspectVerdict(bandApplies = true, 1.012, 1.218))
    assert(!KneeFresh.shouldRetrySweep(bandApplies = true, 1.012, 1.218))
  }

  test("degraded start with recovered end is still suspect (the sweep " +
      "began on a bad host) but gets no end-collapse retry — the start " +
      "path already had its own cool-down retries") {
    assert(KneeFresh.suspectVerdict(bandApplies = true, 0.4, 1.1))
    assert(!KneeFresh.shouldRetrySweep(bandApplies = true, 0.4, 1.1))
  }

  test("both collapsed: suspect, and no sweep retry (the start retries " +
      "already spent the cool-down budget on this host state)") {
    assert(KneeFresh.suspectVerdict(bandApplies = true, 0.5, 0.3))
    assert(!KneeFresh.shouldRetrySweep(bandApplies = true, 0.5, 0.3))
  }

  test("boundary: exactly at the suspect line is clean") {
    assert(!KneeFresh.suspectVerdict(bandApplies = true, S, S))
    assert(!KneeFresh.shouldRetrySweep(bandApplies = true, S, S))
  }

  test("band withheld (non-32 width) never marks suspect or retries") {
    assert(!KneeFresh.suspectVerdict(bandApplies = false, -1.0, -1.0))
    assert(!KneeFresh.shouldRetrySweep(bandApplies = false, -1.0, -1.0))
  }

  test("cpus width parses numerically: equivalent spellings keep the " +
      "band, garbage withholds it") {
    assert(KneeFresh.bandAppliesFor("32"))
    assert(KneeFresh.bandAppliesFor(" 32"))
    assert(KneeFresh.bandAppliesFor("032"))
    assert(!KneeFresh.bandAppliesFor("16"))
    assert(!KneeFresh.bandAppliesFor("lots"))
    assert(!KneeFresh.bandAppliesFor(""))
  }
}
