package graft.rates

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Windowed rate aggregation — the Spark analog of the reference's
  * GenCounter (ETS monotonic counters,
  * /root/reference/lib/realtime/gen_counter/gen_counter.ex:17,51-60) +
  * RateCounter (60 × 1 s sliding buckets, avg = sum/len/tick, limit triggers,
  * /root/reference/lib/realtime/rate_counter/rate_counter.ex:25-35,197-224).
  *
  * Spark's hash aggregation gives the partial/final split the reference
  * builds by hand (decentralized ETS counters → windowed roll-up) for free:
  * map-side partial counts, one shuffle on (key, window). At 100 TB the
  * cardinality is (keys × windows) — bounded, and AQE coalesces the
  * post-shuffle partitions.
  */
object Rates {

  /** Plain monotonic counter per key (A1). */
  def counter(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))

  /** Tumbling-window event counts per key (A2 simplified tick). Emits
    * `bucket_s` = epoch seconds of the window start (engine-portable). */
  def tumbling(df: DataFrame, tsCol: String, keys: Seq[String],
      windowSec: Int): DataFrame =
    df.groupBy((window(col(tsCol), s"$windowSec seconds") +: keys.map(col)): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("bucket_s", unix_timestamp(col("window.start")))
      .drop("window")

  /** Sliding-window counts (A2's 60 s window / finer slide). Each event lands
    * in windowSec/slideSec buckets. */
  def sliding(df: DataFrame, tsCol: String, keys: Seq[String],
      windowSec: Int, slideSec: Int): DataFrame =
    df.groupBy((window(col(tsCol), s"$windowSec seconds", s"$slideSec seconds")
        +: keys.map(col)): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("bucket_s", unix_timestamp(col("window.start")))
      .drop("window")

  /** Average events/sec over the window (RateCounter's avg = sum/len/tick). */
  def withAvg(rates: DataFrame, windowSec: Int): DataFrame =
    rates.withColumn("avg_per_sec",
      round(col("n") / lit(windowSec.toDouble), 6))

  /** Limit trigger (A2): buckets whose count crosses the tenant cap —
    * the load-shedding gate input (O10). */
  def overLimit(rates: DataFrame, limit: Long): DataFrame =
    rates.where(col("n") > limit)

  /** Gap-based sessionization: a new session starts where the gap to the
    * previous event of the same key exceeds `gapMinutes`. Classic two
    * windows over (key, order): a lag for the break flag, a running sum
    * for the session ordinal — ONE shuffle on the key; session ids are
    * per-key ordinals so they're stable under any cluster size. Ties on
    * the timestamp are broken by `tieCol` for deterministic ordering
    * (equal timestamps always share a session either way — the gap is
    * zero — but row-level output must be reproducible). */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, gapMinutes: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val gapUs = lit(gapMinutes.toLong * 60L * 1000000L)
    val prev = lag(col(tsCol), 1).over(w)
    val brk = when(prev.isNull ||
      unix_micros(col(tsCol)) - unix_micros(prev) > gapUs, 1L).otherwise(0L)
    events
      .withColumn("_brk", brk)
      .withColumn("session_seq", sum(col("_brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_brk")
  }

  /** Per-session aggregate over [[sessionize]] output: event count and
    * duration (micros, exact integer — no float division in the oracle
    * path). */
  def sessionStats(sessions: DataFrame, keyCol: String, tsCol: String)
      : DataFrame =
    sessions.groupBy(col(keyCol), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        (max(unix_micros(col(tsCol))) - min(unix_micros(col(tsCol))))
          .as("duration_us"))

  /** Ordered funnel: per key, how many of `stages` completed IN ORDER —
    * stage i+1 must occur strictly after the chosen stage-i event, with
    * (ts, tieCol) tuple comparison so equal timestamps resolve
    * deterministically. One pass per stage: the earliest qualifying
    * event via a per-key window, then a key-equi join carrying the
    * (ts, tie) cursor forward — every shuffle is keyed by `keyCol`, no
    * per-key event list ever materializes (the collect_list + fold
    * alternative pulls each key's full history into one row). */
  def funnel(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, typeCol: String, stages: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(stages.nonEmpty)
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    def first(df: DataFrame, stage: String): DataFrame =
      df.where(col(typeCol) === stage)
        .withColumn("_rn", row_number().over(w))
        .where(col("_rn") === 1)
        .select(col(keyCol), col(tsCol).as("_t"), col(tieCol).as("_i"))
    val firsts = stages.tail.scanLeft(first(events, stages.head)) {
      (prev, stage) =>
        first(events.join(prev, Seq(keyCol))
          .where(struct(col(tsCol), col(tieCol)) >
            struct(col("_t"), col("_i")))
          .drop("_t", "_i"), stage)
    }
    val keys = events.select(col(keyCol)).distinct()
    firsts.zipWithIndex.foldLeft(keys) { case (acc, (st, i)) =>
      acc.join(st.select(col(keyCol), lit(1).as(s"_s$i")), Seq(keyCol), "left")
    }.select(col(keyCol),
      stages.indices.map(i => coalesce(col(s"_s$i"), lit(0))).reduce(_ + _)
        .cast("long").as("reached"))
  }

  /** First-order Markov transition matrix over per-key event sequences:
    * count (from → to) adjacencies in (ts, tie) order and the row-
    * normalized transition probability. The behavioral fingerprint
    * behind next-event prediction and anomalous-flow detection.
    *
    * One key-shuffle for the lead window, one (from, to) partial-agg
    * groupBy, one |event types|-sized window for row totals; the
    * probability is a single rational division of exact counts. */
  def transitionMatrix(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, typeCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val pairs = events
      .withColumn("_next", lead(col(typeCol), 1).over(w))
      .where(col("_next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("_next").as("to_type"))
      .agg(count(lit(1)).as("cnt"))
    val totW = Window.partitionBy(col("from_type"))
    pairs.withColumn("row_total", sum(col("cnt")).over(totW))
      .select(col("from_type"), col("to_type"), col("cnt"),
        round(col("cnt").cast("double") / col("row_total").cast("double"),
          6).as("p"))
  }

  /** Streaming twin of [[transitionMatrix]]: per micro-batch, emit the
    * (from → to) adjacency increments observed on the live stream —
    * keyed state holds only each key's LAST (ts, tie, type) cursor
    * (constant per key, never history), so cross-batch adjacencies are
    * counted exactly once. Downstream sums the increments (or feeds a
    * counter store). Within a batch events sort by (ts, tie); state is
    * the standard at-least-once-safe shape: replaying a batch re-emits
    * the same increments, dedup by sink key if exactly-once matters.
    *
    * Ordering caveat (documented, same as every keyed-state op here):
    * events must arrive key-ordered across batches (per-key FIFO
    * source partitioning) — a cross-batch out-of-order event would
    * chain onto the newer cursor.
    *
    * `idleTimeoutMs > 0` opts into the idle reap (unbounded per-client
    * key space, so live deployments want it): an idle key's cursor is
    * dropped, and its next event starts a fresh chain — the session-gap
    * semantics (no cross-session transition is counted), matching
    * [[sessionize]]'s reading of an idle gap. */
  def transitionStream(events: org.apache.spark.sql.Dataset[TransitionEvent],
      idleTimeoutMs: Long = 0L)(
      implicit spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.Dataset[TransitionInc] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events.groupByKey(_.key)
      .flatMapGroupsWithState[TransitionCursor, TransitionInc](
        OutputMode.Append,
        if (idleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
        else GroupStateTimeout.NoTimeout()) {
        (key: String, evs: Iterator[TransitionEvent],
         state: GroupState[TransitionCursor]) =>
          if (state.hasTimedOut) {
            state.remove() // idle cursor reaped; next event starts a chain
            Iterator.empty
          } else {
            val sorted = evs.toSeq.sortBy(e => (tsMicros(e.ts), e.tie))
            val out = Seq.newBuilder[TransitionInc]
            var prev = state.getOption.map(_.eventType)
            sorted.foreach { e =>
              prev.foreach(p => out += TransitionInc(key, p, e.eventType))
              prev = Some(e.eventType)
            }
            sorted.lastOption.foreach(e =>
              state.update(TransitionCursor(e.eventType)))
            if (idleTimeoutMs > 0 && state.exists)
              state.setTimeoutDuration(idleTimeoutMs)
            out.result().iterator
          }
      }
  }

  final case class TransitionEvent(key: String, ts: java.sql.Timestamp,
      tie: Long, eventType: String)
  final case class TransitionCursor(eventType: String)
  final case class TransitionInc(key: String, from_type: String,
      to_type: String)

  /** Full-microsecond timestamp, matching the batch twins' `unix_micros`:
    * `getTime` is millisecond-integral, the sub-millisecond residue rides
    * in `getNanos` (which carries the FULL fractional second — the
    * `% 1000000` keeps only the sub-ms part `getTime` hasn't counted). */
  private def tsMicros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L

  /** Streaming debounce with the TRUE kept-anchor semantics: an event
    * is dropped when it lands within `minGapSec` of the last KEPT
    * event — the sequential per-key decision the relational
    * [[debounce]] deliberately approximates (its lag form compares
    * against the previous event). Keyed state is ONE long per key (the
    * last kept timestamp), events sort (microsecond ts, tie) within a
    * batch — same `unix_micros` precision as the batch twin — and the
    * anchor carries across micro-batches.
    *
    * `idleTimeoutMs > 0` opts into the idle reap (unbounded per-client
    * key space). With `idleTimeoutMs > minGapSec·1000` the reap is
    * decision-INVARIANT whenever processing time keeps pace with event
    * time: an anchor older than the gap can't suppress anything, and an
    * absent anchor admits — the two states decide identically. Strictly
    * greater: an event exactly `minGapSec` after the anchor is still
    * suppressed by kept state (`tUs - a > gapUs` is false at equality)
    * but admitted against reaped state. */
  def debounceStream(events: org.apache.spark.sql.Dataset[DebounceEvent],
      minGapSec: Long, idleTimeoutMs: Long = 0L)(
      implicit spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.Dataset[DebounceEvent] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val gapUs = minGapSec * 1000000L
    events.groupByKey(_.key)
      .flatMapGroupsWithState[Long, DebounceEvent](
        OutputMode.Append,
        if (idleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
        else GroupStateTimeout.NoTimeout()) {
        (_: String, evs: Iterator[DebounceEvent], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove() // stale anchor (older than the gap) reaped
            Iterator.empty
          } else {
            val out = Seq.newBuilder[DebounceEvent]
            var anchor = state.getOption
            evs.toSeq.sortBy(e => (tsMicros(e.ts), e.tie)).foreach { e =>
              val tUs = tsMicros(e.ts)
              if (anchor.forall(a => tUs - a > gapUs)) {
                out += e
                anchor = Some(tUs)
              }
            }
            anchor.foreach(state.update)
            if (idleTimeoutMs > 0 && state.exists)
              state.setTimeoutDuration(idleTimeoutMs)
            out.result().iterator
          }
      }
  }

  final case class DebounceEvent(key: String, ts: java.sql.Timestamp,
      tie: Long)

  /** Debounce: drop an event arriving within `minGapSec` of the
    * PREVIOUS event with the same key — the duplicate-click /
    * double-fire suppressor. Note the semantics deliberately compare
    * against the previous EVENT, not the previous KEPT event: the
    * kept-anchor variant is a sequential per-key scan (each decision
    * depends on the last decision) that no windowed/relational form
    * expresses — this lag form is the standard streaming-safe
    * approximation and differs only when ≥3 events land inside one
    * gap. One key-shuffle, one lag window, a narrow filter. */
  def debounce(events: DataFrame, keyCols: Seq[String], tsCol: String,
      tieCol: String, minGapSec: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
    val prev = lag(col(tsCol), 1).over(w)
    events
      .withColumn("_keep", prev.isNull ||
        unix_micros(col(tsCol)) - unix_micros(prev) >
          lit(minGapSec * 1000000L))
      .where(col("_keep")).drop("_keep")
  }

  /** Per-key ordered journey path: the first `maxSteps` event types in
    * (ts, tie) order joined into one `a>b>c` string — the session-path
    * shape behind flow visualization and path mining. One key-shuffle;
    * the collect is bounded at `maxSteps` per key by a rank filter
    * BEFORE the list aggregate, so no unbounded per-key row. */
  def journeyPaths(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, typeCol: String, maxSteps: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val full = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    events
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= maxSteps)
      .withColumn("_path",
        concat_ws(">", collect_list(col(typeCol)).over(full)))
      .withColumn("_n", count(lit(1)).over(full))
      .where(col("_rn") === 1)
      .select(col(keyCol), col("_path").as("path"),
        col("_n").as("n_steps"))
  }

  /** Rolling distinct actives: for every observed day, the number of
    * DISTINCT keys active in the trailing `windowDays` days. Count
    * distinct cannot slide along a window frame, so the standard exact
    * shape is: distinct (key, day) → day-range self-join (fan-out =
    * windowDays, a constant) → per-day distinct count. Shuffle volume
    * is |distinct (key, day)| × windowDays — active-users-sized, not
    * events-sized. */
  def rollingActives(events: DataFrame, keyCol: String, tsCol: String,
      windowDays: Int): DataFrame = {
    val activity = events
      .select(to_date(col(tsCol)).as("_d"), col(keyCol).as("_k"))
      .distinct()
    val days = activity.select(col("_d").as("day")).distinct()
    days.join(activity,
        datediff(col("day"), col("_d")).between(0, windowDays - 1))
      .groupBy(col("day"))
      .agg(countDistinct(col("_k")).as("n_active"))
      .withColumn("day", col("day").cast("string"))
  }

  /** Truncated EWMA smoothing per key: α = 1/2 over the trailing `depth`
    * observations, s_t = Σ_{j=0..depth-1} x_{t−j} · (1/2)^{j+1} (missing
    * lags contribute 0, so early rows are a warm-up ramp).
    *
    * α = 1/2 is chosen deliberately: every weight is a power of two, so
    * each product x·2^{−j} is EXACT in IEEE double and the fixed
    * left-associated addition chain is bit-identical on any engine — the
    * one smoothing shape that needs no rounding tolerance at all. One
    * window over one key-shuffle; `depth` lags are evaluated inside a
    * single WindowExec, not `depth` passes. */
  def ewmaTrailing(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valueCol: String, depth: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(depth >= 1 && depth <= 48)
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val x = col(valueCol).cast("double")
    val terms = (0 until depth).map { j =>
      coalesce(lag(x, j).over(w), lit(0.0)) * lit(math.pow(0.5, j + 1))
    }
    events.select(col(keyCol), col(tsCol), col(tieCol),
      x.as(valueCol), terms.reduceLeft(_ + _).as("ewma"))
  }

  final case class BatchRow(tenant: String, us: Long, tie: Long, n: Long)

  /** HTTP batch-broadcast admission — the reference's `check_rate_limit`
    * (batch_broadcast.ex:58-59,170-184) replayed over a logged batch
    * stream. Two denial modes, checked in order against the tenant's
    * events-per-second counter (strict `>`, reference cond order):
    *   1. `avg > max`                  → `rate_limited` (429)
    *   2. `batch_size + avg > max`     → `batch_too_large` (429)
    * Admitted batches count every message into the ring
    * (send_message_and_count → GenCounter.add, :130-142) — admitted-only,
    * batch-WEIGHTED counting, so each decision feeds the next. The avg is
    * a tick-boundary snapshot (RateCounter recomputes on its timer tick,
    * not on GenCounter.add), so all batches landing in one tick see the
    * same avg and same-tick order can't matter — which is what makes the
    * replay deterministic and the recursive-CTE oracle per-tick.
    *
    * Note the reference's unit mixing is preserved deliberately: a batch
    * COUNT is compared against a per-second RATE, so check 2 is the
    * binding one at replay densities and check 1 needs a sustained window
    * (the spec exercises all three statuses; see `s8_batch_admission` for
    * the corpus mix). Arithmetic is all-integer: with L = max(len,1)·tick
    * completed-window seconds, check 1 is `sum·den > num·L` and check 2
    * is `n·L·den + sum·den > num·L` — exact on any engine.
    *
    * Same scale shape as [[joinAdmission]]: one tenant-keyed shuffle, an
    * O(windowTicks) ring per tenant, streaming group iterator. */
  def batchAdmission(batches: DataFrame, tenantCol: String, tsCol: String,
      tieCol: String, sizeCol: String, limitNum: Long, limitDen: Long,
      tickSec: Long = 5L, windowTicks: Int = 12): DataFrame = {
    val spark = batches.sparkSession
    import spark.implicits._
    val typed = batches.select(col(tenantCol).cast("string").as("tenant"),
        unix_micros(col(tsCol)).as("us"),
        col(tieCol).cast("long").as("tie"),
        col(sizeCol).cast("long").as("n"))
      .as[BatchRow]
    typed.groupByKey(_.tenant)
      .flatMapSortedGroups($"us", $"tie") { (tenant, it) =>
        // ring arithmetic shared with the streaming twin
        // (AdmissionStream.ringView) — one copy, no drift
        var ring = Map.empty[Long, Long]
        var firstTick = Long.MinValue
        it.map { b =>
          val tick = b.us / 1000000L / tickSec
          val v = AdmissionStream.ringView(ring, firstTick, tick, windowTicks)
          ring = v.ring; firstTick = v.first
          val l = math.max(v.len, 1L) * tickSec
          if (v.sum * limitDen > limitNum * l)
            JoinDecisionRow(tenant, b.tie, "rate_limited")
          else if (b.n * l * limitDen + v.sum * limitDen > limitNum * l)
            JoinDecisionRow(tenant, b.tie, "batch_too_large")
          else {
            ring = ring.updated(tick, ring.getOrElse(tick, 0L) + b.n)
            JoinDecisionRow(tenant, b.tie, "ok")
          }
        }
      }.toDF("tenant", "batch_id", "status")
  }

  final case class MsgRow(tenant: String, user: Long, us: Long, tie: Long)

  /** Message-rate socket shutdown replay — the reference's third
    * enforcement surface (realtime_channel.ex:291-302 with the fastlane
    * poke, message_dispatcher.ex:103): every message DELIVERED to a
    * socket counts into the tenant's events ring (count-THEN-check,
    * `count(socket)` before `RateCounter.get`), and a socket that
    * observes the triggered flag shuts down — "Too many messages per
    * second" — terminally. Dead sockets receive nothing and count
    * nothing, which is the feedback: the ring's contents depend on who
    * died, and who dies depends on the ring.
    *
    * The flag is the usual tick-boundary snapshot (completed ticks only),
    * so within a flagged tick every still-alive socket dies at its FIRST
    * delivery of that tick (that message was delivered, then the check
    * killed the socket → `shutdown`); its later same-tick messages — and
    * everything after — are `dropped`. Unflagged ticks deliver normally
    * (`ok`). Counting follows delivery: a flagged tick contributes one
    * count per dying socket, an unflagged tick every delivered message.
    *
    * Contrast with [[joinAdmission]] (check-before-count, per-attempt
    * denial, recoverable) — here the consequence is terminal per socket,
    * the reference's actual load-shedding of runaway channels. State per
    * tenant: O(windowTicks) ring + O(sockets) dead set (the same bound as
    * the reference's socket processes). Oracle: the recursive CTE carries
    * BOTH as list columns. */
  def messageRateShutdown(messages: DataFrame, tenantCol: String,
      userCol: String, tsCol: String, tieCol: String,
      limitNum: Long, limitDen: Long, tickSec: Long = 5L,
      windowTicks: Int = 12): DataFrame = {
    val spark = messages.sparkSession
    import spark.implicits._
    val typed = messages.select(col(tenantCol).cast("string").as("tenant"),
        col(userCol).cast("long").as("user"),
        unix_micros(col(tsCol)).as("us"),
        col(tieCol).cast("long").as("tie"))
      .as[MsgRow]
    typed.groupByKey(_.tenant)
      .flatMapSortedGroups($"us", $"tie") { (tenant, it) =>
        var ring = Map.empty[Long, Long]
        val dead = scala.collection.mutable.Set.empty[Long]
        var firstTick = Long.MinValue
        it.map { m =>
          val tick = m.us / 1000000L / tickSec
          if (firstTick == Long.MinValue) firstTick = tick
          if (dead.contains(m.user)) JoinDecisionRow(tenant, m.tie, "dropped")
          else {
            val v = AdmissionStream.ringView(ring, firstTick, tick, windowTicks)
            firstTick = v.first
            ring = v.ring.updated(tick,
              v.ring.getOrElse(tick, 0L) + 1L) // count, THEN check
            if (v.len > 0 && v.sum * limitDen >= limitNum * v.len * tickSec) {
              dead.add(m.user)
              JoinDecisionRow(tenant, m.tie, "shutdown")
            } else JoinDecisionRow(tenant, m.tie, "ok")
          }
        }
      }.toDF("tenant", "event_id", "status")
  }

  final case class CallRow(key: String, us: Long, tie: Long)

  /** Per-client anchored-window limiter — the reference's
    * `limit_client_presence_event` (presence_handler.ex:214-236): the
    * window ANCHORS at the first call (or the first call strictly past
    * the previous window's expiry), calls 2..maxCalls inside the window
    * pass, calls beyond are denied WITHOUT consuming anything, and an
    * expired window resets on contact (counter=1, new anchor). A third
    * sequential shape beside the ring gates: state is just two scalars
    * per key (anchor expiry + counter), but the anchor CHAIN — each
    * window's start depends on where the previous one ended — is what
    * fixed tumbling windows can't express (a tumbling bucket would split
    * a burst straddling the boundary into two fresh allowances).
    *
    * Oracle shape: per-key call-index lockstep recursion (depth = max
    * calls per key), no list state. Scale: one shuffle on the composite
    * key, O(1) state per key, streaming group iterator. */
  def clientWindowLimit(calls: DataFrame, keyCols: Seq[String],
      tsCol: String, tieCol: String, maxCalls: Int,
      windowMs: Long): DataFrame = {
    val spark = calls.sparkSession
    import spark.implicits._
    val windowUs = windowMs * 1000L
    // composite key as one ':'-joined column (callers pick separator-free
    // key columns; the oracle concatenates identically)
    val typed = calls.select(
        concat_ws(":", keyCols.map(c => col(c).cast("string")): _*)
          .as("key"),
        unix_micros(col(tsCol)).as("us"),
        col(tieCol).cast("long").as("tie"))
      .as[CallRow]
    typed.groupByKey(_.key)
      .flatMapSortedGroups($"us", $"tie") { (key, it) =>
        var resetAt = Long.MinValue
        var counter = 0L
        it.map { c =>
          val status =
            if (resetAt == Long.MinValue || c.us > resetAt) {
              counter = 1L; resetAt = c.us + windowUs; "ok"
            } else if (counter >= maxCalls) "rate_limited"
            else { counter += 1L; "ok" }
          JoinDecisionRow(key, c.tie, status)
        }
      }.toDF("key", "event_id", "status")
  }

  final case class PresenceOpRow(tenant: String, us: Long, tie: Long)

  /** Tenant-level presence-event admission — `limit_presence_event`
    * (presence_handler.ex:201-212): the fifth and last of the reference's
    * rate checks. Check-BEFORE-count with admitted-only increments like
    * the joins gate, but the comparison is `avg > max` — STRICT, read
    * straight off the counter rather than through the triggered flag's
    * `>=` — so a window sitting exactly AT the limit still admits (the
    * spec pins the boundary against [[joinAdmission]]'s). Same
    * integer-rational arithmetic, same tick-snapshot all-or-nothing
    * denial, same recursive-CTE oracle shape minus the slot arm. */
  def presenceRateAdmission(ops: DataFrame, tenantCol: String,
      tsCol: String, tieCol: String, limitNum: Long, limitDen: Long,
      tickSec: Long = 5L, windowTicks: Int = 12): DataFrame = {
    val spark = ops.sparkSession
    import spark.implicits._
    val typed = ops.select(col(tenantCol).cast("string").as("tenant"),
        unix_micros(col(tsCol)).as("us"),
        col(tieCol).cast("long").as("tie"))
      .as[PresenceOpRow]
    typed.groupByKey(_.tenant)
      .flatMapSortedGroups($"us", $"tie") { (tenant, it) =>
        var ring = Map.empty[Long, Long]
        var firstTick = Long.MinValue
        it.map { a =>
          val tick = a.us / 1000000L / tickSec
          val v = AdmissionStream.ringView(ring, firstTick, tick, windowTicks)
          ring = v.ring; firstTick = v.first
          if (v.len > 0 && v.sum * limitDen > limitNum * v.len * tickSec)
            JoinDecisionRow(tenant, a.tie, "rate_limited")
          else {
            ring = ring.updated(tick, ring.getOrElse(tick, 0L) + 1L)
            JoinDecisionRow(tenant, a.tie, "ok")
          }
        }
      }.toDF("tenant", "event_id", "status")
  }

  final case class PollRow(tenant: String, us: Long, tie: Long,
      n: Long, weight: Long)

  /** The CDC poller's rate-triggered LOAD SHED — the
    * `handle_list_changes_result` gate
    * (replication_poller.ex:404-421): when the tenant's events counter
    * is TRIGGERED, the poll's real rows are dropped WHOLESALE (a
    * per-poll all-or-nothing shed, surfaced as skip telemetry with the
    * dropped count) — and when it is not, every delivered change
    * counts into the ring WEIGHTED BY ITS FAN-OUT
    * (`GenCounter.add(MapSet.size(change.subscription_ids))`,
    * :421): a change matching 50 subscriptions adds 50, so a few
    * hot-channel changes can trigger the shed as fast as many quiet
    * ones. The triggered flag is the RateCounter's `measurement >=
    * value` on the tick-snapshot avg (`maybe_trigger_limit`,
    * rate_counter.ex:271-273 — `>=`, the flag's arithmetic, not the
    * batch endpoint's strict `>`).
    *
    * Input: one row per POLL with its real-row count `n` and its
    * summed fan-out `weight`. Output status `ok` (delivered; weight
    * counted) or `shed` (n > 0 dropped under a triggered flag; nothing
    * counted — an empty poll under a triggered flag is `ok`, the
    * reference skips the telemetry for it too). Same ring/fold shape
    * as the admission family. */
  def pollShed(polls: DataFrame, tenantCol: String, tsCol: String,
      tieCol: String, nCol: String, weightCol: String, limitNum: Long,
      limitDen: Long, tickSec: Long = 5L, windowTicks: Int = 12)
      : DataFrame = {
    val spark = polls.sparkSession
    import spark.implicits._
    val typed = polls.select(col(tenantCol).cast("string").as("tenant"),
        unix_micros(col(tsCol)).as("us"),
        col(tieCol).cast("long").as("tie"),
        col(nCol).cast("long").as("n"),
        col(weightCol).cast("long").as("weight"))
      .as[PollRow]
    typed.groupByKey(_.tenant)
      .flatMapSortedGroups($"us", $"tie") { (tenant, it) =>
        var ring = Map.empty[Long, Long]
        var firstTick = Long.MinValue
        it.map { p =>
          val tick = p.us / 1000000L / tickSec
          val v = AdmissionStream.ringView(ring, firstTick, tick, windowTicks)
          ring = v.ring; firstTick = v.first
          val l = math.max(v.len, 1L) * tickSec
          if (v.sum * limitDen >= limitNum * l) {
            if (p.n > 0) JoinDecisionRow(tenant, p.tie, "shed")
            else JoinDecisionRow(tenant, p.tie, "ok")
          } else {
            ring = ring.updated(tick, ring.getOrElse(tick, 0L) + p.weight)
            JoinDecisionRow(tenant, p.tie, "ok")
          }
        }
      }.toDF("tenant", "poll_id", "status")
  }

  final case class BatchPipeRow(tenant: String, us: Long, tie: Long,
      n: Long, nAuth: Long, suspend: Boolean, anyInvalid: Boolean)

  /** The FULL batch-broadcast endpoint pipeline —
    * `BatchBroadcast.broadcast` (batch_broadcast.ex:51-95) composed end
    * to end, three semantics the isolated [[batchAdmission]] rate gate
    * cannot show:
    *   1. the `suspend` function clause rejects before anything else;
    *   2. the changeset is ALL-OR-NOTHING: one message missing
    *      topic/payload/event or oversize rejects the WHOLE batch
    *      (`invalid_batch`, 422) — the single endpoint's per-request
    *      leniency does not apply here;
    *   3. the two rate checks (reference cond order, strict `>`) use
    *      the FULL batch size `length(messages)`, but the ring counts
    *      only the messages actually SENT — public ones plus private
    *      ones whose per-TOPIC write probe passed
    *      (send_message_and_count per delivered message, denied topics
    *      silently dropped at :86-88) — so `nAuth` feeds the ring while
    *      `n` feeds the checks. A batch of mostly-denied messages
    *      passes rate cheaply and pressures the window only by what it
    *      delivered.
    * Same ring/fold shape as [[batchAdmission]]; statuses:
    * forbidden_suspended | invalid_batch | rate_limited |
    * batch_too_large | ok. */
  def batchPipelineAdmission(batches: DataFrame, tenantCol: String,
      tsCol: String, tieCol: String, sizeCol: String, authCol: String,
      suspendCol: String, anyInvalidCol: String, limitNum: Long,
      limitDen: Long, tickSec: Long = 5L, windowTicks: Int = 12)
      : DataFrame = {
    val spark = batches.sparkSession
    import spark.implicits._
    val typed = batches.select(col(tenantCol).cast("string").as("tenant"),
        unix_micros(col(tsCol)).as("us"),
        col(tieCol).cast("long").as("tie"),
        col(sizeCol).cast("long").as("n"),
        col(authCol).cast("long").as("nAuth"),
        col(suspendCol).cast("boolean").as("suspend"),
        col(anyInvalidCol).cast("boolean").as("anyInvalid"))
      .as[BatchPipeRow]
    typed.groupByKey(_.tenant)
      .flatMapSortedGroups($"us", $"tie") { (tenant, it) =>
        var ring = Map.empty[Long, Long]
        var firstTick = Long.MinValue
        it.map { b =>
          val tick = b.us / 1000000L / tickSec
          val v = AdmissionStream.ringView(ring, firstTick, tick, windowTicks)
          ring = v.ring; firstTick = v.first
          val l = math.max(v.len, 1L) * tickSec
          if (b.suspend) JoinDecisionRow(tenant, b.tie, "forbidden_suspended")
          else if (b.anyInvalid) JoinDecisionRow(tenant, b.tie, "invalid_batch")
          else if (v.sum * limitDen > limitNum * l)
            JoinDecisionRow(tenant, b.tie, "rate_limited")
          else if (b.n * l * limitDen + v.sum * limitDen > limitNum * l)
            JoinDecisionRow(tenant, b.tie, "batch_too_large")
          else {
            ring = ring.updated(tick, ring.getOrElse(tick, 0L) + b.nAuth)
            JoinDecisionRow(tenant, b.tie, "ok")
          }
        }
      }.toDF("tenant", "batch_id", "status")
  }

  final case class SingleReqRow(tenant: String, us: Long, tie: Long,
      suspend: Boolean, valid: Boolean, writeAllowed: Boolean)

  /** Single-broadcast admission replay — the gate chain of
    * `Realtime.Tenants.SingleBroadcast.broadcast`
    * (single_broadcast.ex:64-82), the per-message HTTP endpoint's
    * admission pipeline, in the reference's exact clause order:
    *   1. `suspend: true` tenant  → `forbidden_suspended` (403, checked
    *      by a FUNCTION CLAUSE before anything else — even an invalid
    *      payload on a suspended tenant reads suspended);
    *   2. changeset invalid       → `invalid` (422; the `validCol`
    *      input — see [[graft.messages.SingleBroadcast.validRequest]]
    *      for the changeset semantics. Note the payload-SIZE check
    *      lives HERE, inside validation and therefore BEFORE the rate
    *      gate — the channel push path checks size after authz);
    *   3. `avg >= max`            → `rate_limited` (429; `>=`, NOT the
    *      batch endpoint's strict `>` — single_broadcast.ex:219-227 vs
    *      batch_broadcast.ex:170-177, a deliberate reference divergence
    *      this replay preserves);
    *   4. private ∧ no write policy → `forbidden` (403 Unauthorized);
    *   5. otherwise `ok`, and ONLY then `GenCounter.add` counts ONE
    *      event into the tenant ring (send_message_and_count) — denied
    *      and invalid requests never count.
    *
    * The ring is the admission family's [[AdmissionStream.ringView]]
    * (tick-boundary snapshot: the avg reads COMPLETED ticks only, so
    * same-tick order cannot matter and the replay is deterministic).
    * The replay's counter clock is anchored at the tenant's first
    * request of ANY outcome — every request advances the view (the
    * reference's wall-clock window ticks regardless of outcomes); only
    * `ok` rows count into it. Same scale shape as [[batchAdmission]]:
    * one tenant-keyed shuffle, O(windowTicks) state, streaming group
    * iterator — suspend/valid/writeAllowed are row-local booleans the
    * caller computes relationally (broadcast joins, never a second
    * shuffle). */
  def singleAdmission(requests: DataFrame, tenantCol: String,
      tsCol: String, tieCol: String, suspendCol: String, validCol: String,
      writeAllowedCol: String, limitNum: Long, limitDen: Long,
      tickSec: Long = 5L, windowTicks: Int = 12): DataFrame = {
    val spark = requests.sparkSession
    import spark.implicits._
    val typed = requests.select(col(tenantCol).cast("string").as("tenant"),
        unix_micros(col(tsCol)).as("us"),
        col(tieCol).cast("long").as("tie"),
        col(suspendCol).cast("boolean").as("suspend"),
        col(validCol).cast("boolean").as("valid"),
        col(writeAllowedCol).cast("boolean").as("writeAllowed"))
      .as[SingleReqRow]
    typed.groupByKey(_.tenant)
      .flatMapSortedGroups($"us", $"tie") { (tenant, it) =>
        var ring = Map.empty[Long, Long]
        var firstTick = Long.MinValue
        it.map { r =>
          val tick = r.us / 1000000L / tickSec
          val v = AdmissionStream.ringView(ring, firstTick, tick, windowTicks)
          ring = v.ring; firstTick = v.first
          val l = math.max(v.len, 1L) * tickSec
          if (r.suspend) JoinDecisionRow(tenant, r.tie, "forbidden_suspended")
          else if (!r.valid) JoinDecisionRow(tenant, r.tie, "invalid")
          else if (v.sum * limitDen >= limitNum * l)
            JoinDecisionRow(tenant, r.tie, "rate_limited")
          else if (!r.writeAllowed) JoinDecisionRow(tenant, r.tie, "forbidden")
          else {
            ring = ring.updated(tick, ring.getOrElse(tick, 0L) + 1L)
            JoinDecisionRow(tenant, r.tie, "ok")
          }
        }
      }.toDF("tenant", "req_id", "status")
  }

  final case class JoinAttemptRow(tenant: String, user: Long, us: Long,
      tie: Long)
  final case class JoinDecisionRow(tenant: String, event_id: Long,
      status: String)

  /** Join-admission replay — the reference's `check_tenant` gate
    * (tenant_rate_limiters.ex:12-43) over a logged attempt stream, the
    * feedback loop the plain [[overLimit]] trigger can't express: the rate
    * counter counts ADMITTED joins only (GenCounter.add fires after the
    * check passes, realtime_channel.ex:649-653), so each decision depends
    * on the decisions before it.
    *
    * Semantics, in check order:
    *  1. `max_concurrent_users` — slots are claimed by socket-connect
    *     order, i.e. each user's FIRST attempt (UsersCounter.add at
    *     connect, realtime_channel.ex:159); users ranked past the cap get
    *     every attempt denied `too_many_connections`. The replay log has
    *     no disconnects, so occupancy is monotone — first-N semantics.
    *  2. `max_joins_per_second` — a [[RateCounterStream]]-shaped ring of
    *     per-tick admitted counts (tick × windowTicks, the reference's
    *     5 s × 12 buckets), consulted BEFORE counting: the flag a tick-T
    *     attempt sees is computed from COMPLETED ticks [T−window, T−1],
    *     with ring length = min(window, T − firstTick) completed ticks
    *     since the counter's creation at the first eligible attempt (a
    *     brand-new counter reads untriggered, so the creation tick always
    *     admits). Denials are all-or-nothing per tick — the flag only
    *     moves on tick boundaries, exactly the trigger-on-tick contract.
    *
    * The limit is a RATIONAL per-second rate `limitNum/limitDen`; the
    * trigger is the integer comparison `sum·limitDen ≥ limitNum·len·tick`
    * — no float division anywhere, so any engine replays the exact same
    * decisions (the oracle is a recursive CTE carrying the ring as a
    * list column).
    *
    * Scale: ONE shuffle keyed by tenant; kernel state is an
    * O(windowTicks) ring plus an O(users-per-tenant) slot set (the
    * reference's UsersCounter bound) and the group iterator streams
    * (flatMapSortedGroups — no per-tenant materialization). Tenants
    * parallelize across executors; the per-key sequential fold is
    * irreducible (each decision feeds the next), same as the reference's
    * one-counter-process-per-tenant. */
  def joinAdmission(events: DataFrame, tenantCol: String, userCol: String,
      tsCol: String, tieCol: String, maxConcurrent: Int,
      limitNum: Long, limitDen: Long, tickSec: Long = 5L,
      windowTicks: Int = 12): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    // ONE tenant-keyed shuffle: the kernel walks attempts in (ts, tie)
    // order, so socket-connect order — each user's first attempt claims a
    // slot — falls out of the same walk as the ring (a claimed-slot set,
    // exactly [[AdmissionStream]]'s state; an earlier form computed
    // connection ranks with two windows plus a join back, three shuffles
    // for what the fold already knows). Slot state is O(users-per-tenant),
    // the reference's UsersCounter bound.
    val att = events.select(col(tenantCol).cast("string").as("tenant"),
        col(userCol).cast("long").as("user"),
        unix_micros(col(tsCol)).as("us"),
        col(tieCol).cast("long").as("tie"))
      .as[JoinAttemptRow]
    att.groupByKey(_.tenant)
      .flatMapSortedGroups($"us", $"tie") { (tenant, it) =>
        var ring = Map.empty[Long, Long]
        val slots = scala.collection.mutable.Set.empty[Long]
        var firstTick = Long.MinValue
        it.map { a =>
          if (!slots.contains(a.user) && slots.size >= maxConcurrent)
            JoinDecisionRow(tenant, a.tie, "too_many_connections")
          else {
            slots.add(a.user) // first attempt claims the slot, even if the
                              // join itself is then rate-denied
            val tick = a.us / 1000000L / tickSec
            val v = AdmissionStream.ringView(ring, firstTick, tick, windowTicks)
            ring = v.ring; firstTick = v.first
            if (v.len > 0 && v.sum * limitDen >= limitNum * v.len * tickSec)
              JoinDecisionRow(tenant, a.tie, "too_many_joins")
            else {
              ring = ring.updated(tick, ring.getOrElse(tick, 0L) + 1L)
              JoinDecisionRow(tenant, a.tie, "ok")
            }
          }
        }
      }.toDF()
  }
}

/** Driver-side per-tenant RateCounter for the CDC poll loop — the
  * cross-batch analog of the reference's RateCounter process state
  * (rate_counter.ex:25-35,197-224: per-second buckets over a fixed
  * window, avg = sum/len, limit trigger consulted by the poller BEFORE
  * processing, replication_poller.ex:404-415). One instance lives on the
  * driver per stream (like the reference's one counter process per
  * tenant); micro-batch row counts feed it, and a triggered tenant's
  * rows are shed without being counted — so the trigger clears once the
  * window drains, exactly the reference's recovery behavior.
  * Size: O(tenants × windowSec) driver memory — the tenant dimension. */
final class TenantRateCounters(
    windowSec: Int,
    limitsPerSec: Map[String, Double] = Map.empty,
    defaultLimitPerSec: Double = Double.MaxValue) extends Serializable {
  import scala.collection.mutable
  private final class St {
    val buckets = mutable.Map[Long, Long]() // epoch second → events
    var lastAddMs = 0L                      // for idle eviction
  }
  private val state = mutable.Map[String, St]()
  private def pruned(tenant: String, nowMs: Long): St = {
    val st = state.getOrElseUpdate(tenant, new St)
    val cutoff = nowMs / 1000 - windowSec
    st.buckets.keys.filter(_ <= cutoff).toSeq.foreach(st.buckets.remove)
    st
  }
  /** Record `n` processed events for `tenant` at `nowMs`. */
  def add(tenant: String, n: Long, nowMs: Long): Unit = {
    val st = pruned(tenant, nowMs)
    st.lastAddMs = nowMs
    val sec = nowMs / 1000
    st.buckets(sec) = st.buckets.getOrElse(sec, 0L) + n
  }
  /** Number of tenants currently holding state (telemetry/spec surface). */
  def nTracked: Int = state.size
  /** Drop counters idle for `idleSec` — the reference shuts a counter
    * down after 5 minutes of zeros (rate_counter.ex:25,226-234) so a
    * churning tenant population doesn't grow driver state without bound;
    * a returning tenant simply re-creates its counter (reads on an
    * evicted tenant see an empty — all-zero — window, same as the
    * reference's restart-from-empty). Call on the poll/batch cadence;
    * returns the evicted tenant ids. */
  def evictIdle(nowMs: Long, idleSec: Int = 300): Seq[String] = {
    val victims = state.collect {
      case (t, st) if nowMs - st.lastAddMs >= idleSec * 1000L => t
    }.toSeq
    victims.foreach(state.remove)
    victims.sorted
  }
  /** Average events/sec over the fixed-length window (sum/len — empty
    * seconds count, like the reference's zero-filled ring). Reading an
    * unknown/evicted tenant does NOT materialize state (otherwise probe
    * reads would recreate what [[evictIdle]] just dropped). */
  def avg(tenant: String, nowMs: Long): Double =
    if (!state.contains(tenant)) 0.0
    else pruned(tenant, nowMs).buckets.values.sum.toDouble / windowSec
  /** The poller's gate: is this tenant's current rate over its cap? */
  def triggered(tenant: String, nowMs: Long): Boolean =
    avg(tenant, nowMs) > limitsPerSec.getOrElse(tenant, defaultLimitPerSec)
}
