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

  test("the r13 driver artifact (320k at 0.798 -> 1.101) is DERATED, " +
      "not clean — and triggers the marginal sweep retry") {
    assert(KneeFresh.kneeVerdict(bandApplies = true, 0.798, 1.101,
      320000) == "derated")
    assert(KneeFresh.shouldRetryMarginal(bandApplies = true, 0.798, 1.101,
      320000))
    assert(!KneeFresh.suspectVerdict(bandApplies = true, 0.798, 1.101))
  }

  test("a marginal host whose sweep still meets the committed knee is " +
      "clean (a confirmation, not a derate) — no retry") {
    assert(KneeFresh.kneeVerdict(bandApplies = true, 0.798, 1.101,
      KneeFresh.CommittedKneeRate) == "clean")
    assert(!KneeFresh.shouldRetryMarginal(bandApplies = true, 0.798, 1.101,
      KneeFresh.CommittedKneeRate))
  }

  test("the r14 driver artifact (320k at 1.203 -> 1.135, healthy) " +
      "triggers the low-reading retry — a healthy-host low is a " +
      "transient until confirmed twice") {
    assert(KneeFresh.shouldRetryLow(bandApplies = true, 1.203, 1.135,
      320000))
    // the old marginal-only predicate correctly does NOT fire here —
    // the unified one subsumes it
    assert(!KneeFresh.shouldRetryMarginal(bandApplies = true, 1.203, 1.135,
      320000))
  }

  test("healthy-low-retry-confirms: the re-run meeting the committed " +
      "knee stamps clean (the first low was the transient)") {
    assert(KneeFresh.kneeVerdict(bandApplies = true, 1.1, 1.05,
      KneeFresh.CommittedKneeRate) == "clean")
    assert(!KneeFresh.shouldRetryLow(bandApplies = true, 1.1, 1.05,
      KneeFresh.CommittedKneeRate))
  }

  test("healthy-low-persists: a healthy host confirmed low on the " +
      "second sweep stamps regression — a real capability loss, " +
      "distinct from both derated and clean") {
    assert(KneeFresh.kneeVerdict(bandApplies = true, 0.95, 1.1,
      320000) == "regression")
    assert(KneeFresh.kneeVerdict(bandApplies = true, 1.203, 1.135,
      320000) == "regression")
  }

  test("the marginal band still retries under the unified predicate") {
    assert(KneeFresh.shouldRetryLow(bandApplies = true, 0.798, 1.101,
      320000))
    assert(!KneeFresh.shouldRetryLow(bandApplies = true, 0.798, 1.101,
      KneeFresh.CommittedKneeRate))
  }

  test("suspect hosts never take the low-reading retry (their start " +
      "path already spent the cool-down budget)") {
    assert(!KneeFresh.shouldRetryLow(bandApplies = true, 0.5, 1.1,
      320000))
    assert(!KneeFresh.shouldRetryLow(bandApplies = false, -1.0, -1.0,
      320000))
  }

  test("suspect beats derated: below the 0.7 line the verdict is " +
      "suspect regardless of the reading") {
    assert(KneeFresh.kneeVerdict(bandApplies = true, 0.5, 1.1,
      320000) == "suspect")
    assert(KneeFresh.kneeVerdict(bandApplies = true, 0.5, 1.1,
      1280000) == "suspect")
    assert(!KneeFresh.shouldRetryMarginal(bandApplies = true, 0.5, 1.1,
      320000))
  }

  test("marginal band arithmetic: min(start, end) decides membership; " +
      "0.7 is in, 0.9 is out") {
    val S = KneeFresh.HealthSuspect; val M = KneeFresh.HealthMarginal
    assert(KneeFresh.marginalBand(bandApplies = true, S, 2.0))
    assert(KneeFresh.marginalBand(bandApplies = true, 2.0, S))
    assert(!KneeFresh.marginalBand(bandApplies = true, M, 2.0))
    assert(!KneeFresh.marginalBand(bandApplies = true, 2.0, M))
    assert(KneeFresh.kneeVerdict(bandApplies = true, S, S,
      320000) == "derated")
    // at exactly the marginal edge the host counts as healthy, so a
    // confirmed-low reading is a regression, not a derate
    assert(KneeFresh.kneeVerdict(bandApplies = true, M, M,
      320000) == "regression")
    // one marginal sample suffices (the min folds it in), even when the
    // other end recovered past healthy
    assert(KneeFresh.kneeVerdict(bandApplies = true, 1.2, 0.85,
      320000) == "derated")
  }

  test("band withheld yields the unbanded verdict, never derated") {
    assert(KneeFresh.kneeVerdict(bandApplies = false, -1.0, -1.0,
      320000) == "unbanded")
    assert(!KneeFresh.shouldRetryMarginal(bandApplies = false, -1.0, -1.0,
      320000))
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
