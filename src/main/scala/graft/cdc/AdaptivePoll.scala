package graft.cdc

import graft.model.Subscription
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType
import java.util.concurrent.atomic.AtomicBoolean

/** Adaptive poll cadence (O9) — the reference poller's backpressure-aware
  * scheduling re-expressed as a driver-side poll loop
  * (/root/reference/lib/extensions/postgres_cdc_rls/replication_poller.ex:174-192):
  *
  *  - rows were processed           → poll again IMMEDIATELY (drain a
  *    backlog at full speed; the slot may hold more),
  *  - rows were seen but none kept  → `interval + jitter(50..100)` ms (the
  *    tenant is being shed — spacing plus jitter stops synchronized
  *    re-polls from stampeding a recovering database),
  *  - fully idle                    → `interval × idleMultiplier` (@5 in
  *    the reference) — an idle tenant costs 1/5th the poll queries.
  *
  * Spark's `Trigger.ProcessingTime` is deliberately fixed-rate, so the
  * cadence lives where the reference keeps it: in the polling process
  * itself. [[CdcStream.startAdaptivePoll]] runs this loop on a daemon
  * thread, each iteration pulling one batch from the caller's source
  * function and pushing it through [[CdcStream.processBatch]] — identical
  * operator pipeline, adaptive schedule. At 1000 tenants the loops are
  * 1000 cheap driver threads sleeping most of the time (the reference runs
  * one Erlang process per tenant for the same reason); the heavy lifting
  * stays on the executors inside processBatch.
  */
final class PollPacer(
    val baseIntervalMs: Long,
    val idleMultiplier: Int = 5,
    jitterSeed: Long = 0L) extends Serializable {
  require(baseIntervalMs > 0 && idleMultiplier >= 1)
  private val rnd = new java.util.Random(jitterSeed)

  /** Jitter in [50, 100] ms, like the reference's `Enum.random(50..100)`
    * — deterministic per seed so tests can pin the sequence. */
  private[cdc] def jitter(): Long = 50L + rnd.nextInt(51).toLong

  /** Delay before the NEXT poll given this poll's outcome.
    * @param processed   rows that made it through the gate (kept)
    * @param slotChanges rows the poll saw in the slot (kept + shed) */
  def nextDelayMs(processed: Long, slotChanges: Long): Long =
    if (processed > 0L) 0L
    else if (slotChanges > 0L) baseIntervalMs + jitter()
    else baseIntervalMs * idleMultiplier
}

/** The reference poller's error-retry policy: RANDOMIZED EXPONENTIAL
  * backoff between 100 ms and 5 s with at most `maxRetries` consecutive
  * failures before giving up to the supervisor
  * (/root/reference/lib/extensions/postgres_cdc_rls/replication_poller.ex:49,93,358-367
  * — `Backoff.new(backoff_min:100, backoff_max:5000, backoff_type::rand_exp)`,
  * `@max_retries 6`, reset on every successful poll). Delay for attempt
  * k is uniform in [min, min(max, min·2^(k−1))] — exponentially growing
  * cap with jitter so restarting pollers don't stampede a recovering
  * database. Deterministic per seed so specs can pin the sequence. */
final class RetryBackoff(
    val minMs: Long = 100L, val maxMs: Long = 5000L,
    val maxRetries: Int = 6, seed: Long = 0L) extends Serializable {
  require(minMs > 0 && maxMs >= minMs && maxRetries >= 0)
  private val rnd = new java.util.Random(seed)
  private var attempt = 0
  def attempts: Int = attempt
  /** Delay before the next retry, or None once retries are exhausted. */
  def nextDelayMs(): Option[Long] =
    if (attempt >= maxRetries) None
    else {
      attempt += 1
      val cap = math.min(maxMs, minMs << math.min(attempt - 1, 30))
      Some(minMs + (rnd.nextDouble() * (cap - minMs)).toLong)
    }
  /** A successful poll clears the consecutive-failure streak. */
  def reset(): Unit = attempt = 0
}

/** Handle for a running adaptive poll loop. A loop that died on an
  * exception is distinguishable from one that completed: `failure`
  * carries the cause (polling has STOPPED either way — after exhausting
  * the in-loop [[RetryBackoff]] — and the caller decides whether to
  * restart, exactly like the reference's supervisor). */
final class PollHandle private[cdc] (thread: Thread, flag: AtomicBoolean) {
  @volatile private[cdc] var failed: Option[Throwable] = None
  def stop(): Unit = { flag.set(false); thread.interrupt(); thread.join(5000L) }
  def isRunning: Boolean = thread.isAlive
  def failure: Option[Throwable] = failed
}

object AdaptivePoll {

  /** Spawn the loop on a daemon thread; poll/process failures retry on
    * the [[RetryBackoff]] schedule, and only an EXHAUSTED retry budget
    * lands in `PollHandle.failure` instead of vanishing with the
    * thread. */
  private[cdc] def spawn(
      name: String,
      pollFn: () => org.apache.spark.sql.DataFrame,
      processFn: org.apache.spark.sql.DataFrame => (Long, Long),
      pacer: PollPacer,
      flag: AtomicBoolean,
      maxPolls: Long,
      backoff: RetryBackoff = new RetryBackoff()): PollHandle = {
    @volatile var handle: PollHandle = null
    val t = new Thread(() => {
      try AdaptivePoll.loop(pollFn, processFn, pacer,
        ms => Thread.sleep(ms), () => flag.get(), maxPolls, backoff)
      catch {
        case _: InterruptedException => () // stop() requested
        // a stop() interrupt can land mid-Spark-action inside processFn
        // and surface as a wrapped SparkException — a requested shutdown
        // must not be reported as a crash, so only record failures while
        // the loop was still supposed to run (flag up)
        case scala.util.control.NonFatal(e) =>
          if (flag.get()) handle.failed = Some(e)
      }
    }, name)
    t.setDaemon(true)
    handle = new PollHandle(t, flag)
    t.start()
    handle
  }

  /** Run `maxPolls` iterations of poll → process → pace. A failed
    * iteration does NOT consume a poll: it sleeps the next backoff delay
    * and retries, up to [[RetryBackoff.maxRetries]] CONSECUTIVE failures
    * — then the final cause is rethrown (the reference re-raises to its
    * supervisor after `@max_retries`). Any successful poll resets the
    * streak. Broken out of the thread wrapper so specs can drive it
    * synchronously with a recording `sleeper`. Returns the per-iteration
    * pacing delays that were applied (backoff sleeps go through the same
    * `sleeper` but are not part of the pacing record). */
  private[cdc] def loop(
      pollFn: () => DataFrame,
      processFn: DataFrame => (Long, Long),
      pacer: PollPacer,
      sleeper: Long => Unit,
      keepGoing: () => Boolean,
      maxPolls: Long,
      backoff: RetryBackoff = new RetryBackoff()): Seq[Long] = {
    val delays = Seq.newBuilder[Long]
    var n = 0L
    while (keepGoing() && n < maxPolls) {
      val outcome =
        try Right(processFn(pollFn()))
        catch { case scala.util.control.NonFatal(e) => Left(e) }
      outcome match {
        case Left(e) =>
          backoff.nextDelayMs() match {
            case Some(d) => if (keepGoing()) sleeper(d)
            case None => throw e // budget exhausted — surface the cause
          }
        case Right((processed, slotChanges)) =>
          backoff.reset()
          val d = pacer.nextDelayMs(processed, slotChanges)
          delays += d
          n += 1
          if (d > 0L && keepGoing() && n < maxPolls) sleeper(d)
      }
    }
    delays.result()
  }
}
