package graft.rates

import graft.SparkSpec
import java.sql.Timestamp

class RatesSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  lazy val df = Seq(
    ("a", t("2024-01-01 00:00:05")),
    ("a", t("2024-01-01 00:00:25")),
    ("a", t("2024-01-01 00:00:45")),
    ("b", t("2024-01-01 00:01:10"))
  ).toDF("k", "ts")

  test("tumbling buckets align to epoch") {
    val got = Rates.tumbling(df, "ts", Seq("k"), 60)
      .select("k", "bucket_s", "n").as[(String, Long, Long)].collect().toSet
    val base = t("2024-01-01 00:00:00").getTime / 1000
    assert(got == Set(("a", base, 3L), ("b", base + 60, 1L)))
  }

  test("sliding 60/30 puts each event in two buckets") {
    val got = Rates.sliding(df, "ts", Seq("k"), 60, 30)
      .select("k", "bucket_s", "n").as[(String, Long, Long)].collect().toSet
    val base = t("2024-01-01 00:00:00").getTime / 1000
    assert(got == Set(
      ("a", base - 30, 2L), // 00:00:05, 00:00:25
      ("a", base, 3L),      // all three
      ("a", base + 30, 1L), // 00:00:45
      ("b", base + 30, 1L), // 00:01:10 ∈ [00:00:30, 00:01:30)
      ("b", base + 60, 1L)))
  }

  test("avg and limit trigger") {
    val rates = Rates.tumbling(df, "ts", Seq("k"), 60)
    val avg = Rates.withAvg(rates, 60)
      .where($"k" === "a").select("avg_per_sec").as[Double].head()
    assert(avg == 0.05) // 3/60
    assert(Rates.overLimit(rates, 2).select("k").as[String].collect().toSeq == Seq("a"))
  }

  test("sessionize: gaps over the threshold start new sessions") {
    val df = Seq(
      ("u1", 1L, t("2024-01-01 10:00:00")),
      ("u1", 2L, t("2024-01-01 10:10:00")), // 10 min → same session
      ("u1", 3L, t("2024-01-01 11:00:00")), // 50 min → new session
      ("u1", 4L, t("2024-01-01 11:00:00")), // tie → same session
      ("u2", 5L, t("2024-01-01 10:00:00"))  // other user independent
    ).toDF("user_id", "event_id", "ts")
    val sess = Rates.sessionize(df, "user_id", "ts", "event_id", 30)
    val got = sess.select("event_id", "session_seq")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L))
    val stats = Rates.sessionStats(sess, "user_id", "ts")
      .select("user_id", "session_seq", "n_events", "duration_us")
      .as[(String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(stats(("u1", 1L)) == ((2L, 600000000L))) // 10 min
    assert(stats(("u1", 2L)) == ((2L, 0L)))         // simultaneous pair
    assert(stats(("u2", 1L)) == ((1L, 0L)))         // singleton
  }

  test("funnel: stages must occur strictly in order") {
    val df = Seq(
      // u1 completes all three in order
      ("u1", 1L, t("2024-01-01 10:00:00"), "view"),
      ("u1", 2L, t("2024-01-01 10:01:00"), "click"),
      ("u1", 3L, t("2024-01-01 10:02:00"), "buy"),
      // u2 clicks BEFORE viewing → click doesn't count; reaches 1
      ("u2", 4L, t("2024-01-01 10:00:00"), "click"),
      ("u2", 5L, t("2024-01-01 10:01:00"), "view"),
      // u3 same-timestamp view then click: event_id breaks the tie → 2
      ("u3", 6L, t("2024-01-01 10:00:00"), "view"),
      ("u3", 7L, t("2024-01-01 10:00:00"), "click"),
      // u4 never starts
      ("u4", 8L, t("2024-01-01 10:00:00"), "other")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val got = Rates.funnel(df, "user_id", "ts", "event_id", "event_type",
        Seq("view", "click", "buy"))
      .as[(String, Long)].collect().toMap
    assert(got == Map("u1" -> 3L, "u2" -> 1L, "u3" -> 2L, "u4" -> 0L))
  }

  test("profile counts nulls and distincts exactly") {
    val df = Seq[(java.lang.Long, String)]((1L, "a"), (2L, "a"), (null, "b"))
      .toDF("x", "y")
    val got = graft.pipeline.Profile.profile(df, Seq("x", "y"))
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("x") == (("x", 3L, 1L, 2L, "1", "2")))
    assert(got("y") == (("y", 3L, 0L, 2L, "a", "b")))
  }

  test("debounce: drops within-gap repeats per key, keeps the first") {
    val ev = Seq(
      ("u", "click", t("2024-01-01 00:00:00"), 1L),
      ("u", "click", t("2024-01-01 00:00:03"), 2L), // 3s after 1 → drop
      ("u", "click", t("2024-01-01 00:00:07"), 3L), // 4s after 2 → drop
      ("u", "click", t("2024-01-01 00:00:20"), 4L), // clear gap → keep
      ("u", "view", t("2024-01-01 00:00:01"), 5L),  // other type → keep
      ("v", "click", t("2024-01-01 00:00:02"), 6L)  // other key → keep
    ).toDF("k", "et", "ts", "id")
    val got = Rates.debounce(ev, Seq("k", "et"), "ts", "id", 5L)
      .select("id").as[Long].collect().toSet
    // id 3 drops against the previous EVENT (2), not the previous kept
    // (1) — the documented lag semantics
    assert(got == Set(1L, 4L, 5L, 6L))
  }

  test("journeyPaths: ordered path, maxSteps truncation per key") {
    val ev = Seq(
      ("u", t("2024-01-01 00:00:01"), 1L, "A"),
      ("u", t("2024-01-01 00:00:02"), 2L, "B"),
      ("u", t("2024-01-01 00:00:03"), 3L, "C"),
      ("v", t("2024-01-01 00:00:09"), 4L, "X")
    ).toDF("k", "ts", "id", "et")
    val got = Rates.journeyPaths(ev, "k", "ts", "id", "et", maxSteps = 2)
      .as[(String, String, Long)].collect().map(r => r._1 -> r).toMap
    assert(got("u") == (("u", "A>B", 2L)), "truncated at maxSteps, in order")
    assert(got("v") == (("v", "X", 1L)))
  }

  test("rollingActives: trailing window counts distinct keys") {
    val ev = Seq(
      ("a", t("2024-01-01 10:00:00")), ("b", t("2024-01-01 11:00:00")),
      ("a", t("2024-01-02 10:00:00")),
      ("c", t("2024-01-09 10:00:00"))
    ).toDF("k", "ts")
    val got = Rates.rollingActives(ev, "k", "ts", windowDays = 7)
      .as[(String, Long)].collect().toMap
    assert(got("2024-01-01") == 2L)
    assert(got("2024-01-02") == 2L, "a counts once, b still in window")
    assert(got("2024-01-09") == 1L,
      "jan 1-2 activity aged out of the 7-day window")
  }

  test("transitionMatrix: adjacency counts per key, row-normalized") {
    val ev = Seq(
      // user u: A → B → A → B   (A→B ×2, B→A ×1)
      ("u", t("2024-01-01 00:00:01"), 1L, "A"),
      ("u", t("2024-01-01 00:00:02"), 2L, "B"),
      ("u", t("2024-01-01 00:00:03"), 3L, "A"),
      ("u", t("2024-01-01 00:00:04"), 4L, "B"),
      // user v: A → C — no cross-user adjacency with u's trailing B
      ("v", t("2024-01-01 00:00:05"), 5L, "A"),
      ("v", t("2024-01-01 00:00:06"), 6L, "C")
    ).toDF("k", "ts", "id", "et")
    val got = Rates.transitionMatrix(ev, "k", "ts", "id", "et")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got(("A", "B")) == ((2L, 0.666667)))
    assert(got(("A", "C")) == ((1L, 0.333333)))
    assert(got(("B", "A")) == ((1L, 1.0)))
    assert(got.size == 3, "no B→A carryover across users")
  }

  test("TenantRateCounters: idle counters evict after the zero span") {
    val rc = new graft.rates.TenantRateCounters(10, defaultLimitPerSec = 1.0)
    rc.add("hot", 5, nowMs = 1000L)
    rc.add("cold", 5, nowMs = 1000L)
    assert(rc.nTracked == 2)
    rc.add("hot", 5, nowMs = 200000L) // hot keeps reporting
    // 5 minutes after cold's last event: only cold evicts
    assert(rc.evictIdle(nowMs = 301000L) == Seq("cold"))
    assert(rc.nTracked == 1)
    // an evicted tenant reads as an empty (all-zero) window — the
    // reference's restart-from-empty — and re-creates on its next event
    assert(rc.avg("cold", 301000L) == 0.0)
    rc.add("cold", 3, nowMs = 302000L)
    assert(rc.avg("cold", 302000L) == 0.3 && rc.nTracked == 2)
    // nothing else is idle yet
    assert(rc.evictIdle(nowMs = 302000L).isEmpty)
  }

  test("ewmaTrailing: exact binary-fraction weights, per-key warm-up") {
    val ev = Seq(
      ("u", t("2024-01-01 00:00:01"), 1L, 8.0),
      ("u", t("2024-01-01 00:00:02"), 2L, 4.0),
      ("u", t("2024-01-01 00:00:03"), 3L, 2.0),
      ("w", t("2024-01-01 00:00:01"), 4L, 16.0)
    ).toDF("k", "ts", "id", "v")
    val got = Rates.ewmaTrailing(ev, "k", "ts", "id", "v", depth = 8)
      .select("k", "id", "ewma").as[(String, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got(("u", 1L)) == 4.0, "first row: x/2, missing lags are 0")
    assert(got(("u", 2L)) == 4.0 * 0.5 + 8.0 * 0.25)
    assert(got(("u", 3L)) == 2.0 * 0.5 + 4.0 * 0.25 + 8.0 * 0.125)
    assert(got(("w", 4L)) == 8.0, "other key unaffected by u's history")
  }
}
