package graft

import graft.cdc.{CdcStream, StreamLatency}
import graft.model.Subscription
import graft.sources.{FileReplayLog, FileReplayLogSink, ReplayLogOffset}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.io.File
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** Cross-process transport proof (round-12 verdict task 3): the CDC
  * pipeline PRODUCES to the file-backed replay log in one JVM, a second
  * JVM TAILS it through the DSv2 source, and the orchestrator kills the
  * consumer mid-stream and restarts it from its checkpoint — proving
  * (a) the seam survives a real process boundary (bytes leave the
  * producer's address space; visibility is filesystem, not shared
  * memory), and (b) consumer crash-recovery loses nothing and
  * re-delivers only the planned-but-uncommitted batch, the replayable-
  * cursor contract of the reference's replication-slot reconnect
  * (/root/reference/test/integration/rt_channel/wal_bloat_test.exs:78-160:
  * kill the connection, reconnect, changes past the confirmed LSN are
  * re-delivered, nothing before it is lost).
  *
  * Three mains: [[XprocProducer]] (pipeline → FileReplayLogSink),
  * [[XprocConsumer]] (DSv2 tail → per-batch offset-range ledger),
  * [[XprocProbe]] (forks both, kills/restarts the consumer, audits the
  * ledger for gaps/duplicates and prints the verdict line COVERAGE
  * cites).
  */
object XprocProducer {
  def main(args: Array[String]): Unit = {
    val Array(root, topic, rateS, secondsS, partsS) = args.take(5)
    val rate = rateS.toInt; val seconds = secondsS.toInt
    val parts = partsS.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val input = MemoryStream[StreamLatency.Change](spark)
    // one subscriber per log partition: frames are keyed by subscriber
    // (per-subscriber order inside one partition, the keyed-produce
    // contract), so a single match-all subscriber would serialize the
    // whole topic into one partition — `parts` subscribers spread it.
    // `rate` is the FRAME rate: changes/s = rate / parts, each change
    // fans out to every subscriber.
    val subs = (0 until parts).map(i =>
      Subscription(s"xproc-$i", "public", "t", Nil))
    val dataSchema = Seq.empty[StreamLatency.Change].toDS().toDF()
      .drop("change_type", "commit_timestamp").schema
    val bus = CdcStream.MemoryBus()
    val sink = new FileReplayLogSink(root, topic, parts)
    val q = CdcStream.start(input.toDF(), subs, dataSchema, "t",
      pk = Seq("id"), bus = bus, triggerMs = 100L, deliverTo = Some(sink))
    val t0 = System.nanoTime()
    var nSent = 0L
    try {
      // the knee harness's shared wall-clock-pinned adaptive feeder
      nSent = StreamLatency.feedAdaptive(input, rate / parts, seconds)
      q.processAllAvailable()
    } finally q.stop()
    val wallMs = (System.nanoTime() - t0) / 1000000L
    val frames = nSent * parts // every change fans out to every subscriber
    // publish any tail still in this process's write buffers, then the
    // done marker carries the ground-truth produced frame count
    FileReplayLog.publish(root, topic)
    Files.writeString(Paths.get(root, s"$topic.producer.done"),
      s"$frames $wallMs")
    println(s"[xprocproducer] changes=$nSent frames=$frames wall_ms=$wallMs " +
      s"frame_rate_sustained=${frames * 1000L / math.max(1L, wallMs)}")
    spark.stop()
  }
}

/** Tails the topic through the DSv2 source, appending one ledger line
  * per (micro-batch, partition): `life batchId partition from untilExcl
  * count p50 p95 p99` — offsets are the audit trail, latency is
  * produce-stamp → batch wall. Runs until the producer's done marker
  * exists AND the backlog has drained (3 consecutive empty batches). */
object XprocConsumer {
  def main(args: Array[String]): Unit = {
    val Array(root, topic, ckpt, ledger, lifeS, maxPerTriggerS) = args.take(6)
    val life = lifeS.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = spark.readStream.format("graft-replaylog")
      .option("topic", topic).option("root", root)
      .option("maxOffsetsPerTrigger", maxPerTriggerS)
      .load()
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(100L))
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val tNow = System.currentTimeMillis()
        // one percentile sketch per partition (array form), not three —
        // the consumer's own ledger bookkeeping must not become the
        // backlog it is measuring
        val rows = b.groupBy(col("partition"))
          .agg(min("offset").as("from"), max("offset").as("max_off"),
            count(lit(1)).as("n"),
            percentile_approx(lit(tNow) - col("timestamp_ms"),
              array(lit(0.5), lit(0.95), lit(0.99)), lit(10000)).as("pcts"))
          .collect()
        if (rows.nonEmpty) {
          val lines = rows.map { r =>
            val p = r.getSeq[Long](4)
            s"$life $batchId ${r.getInt(0)} ${r.getLong(1)} " +
              s"${r.getLong(2) + 1} ${r.getLong(3)} ${p(0)} ${p(1)} ${p(2)}"
          }.mkString("", "\n", "\n")
          Files.write(Paths.get(ledger), lines.getBytes(UTF_8),
            StandardOpenOption.CREATE, StandardOpenOption.APPEND)
        }
        ()
      }.start()
    // done when the producer's marker exists AND the query's committed
    // end offsets equal the on-disk end offsets (empty micro-batches
    // don't run foreachBatch, so "N empty batches" can never fire — the
    // committed-offset comparison is the exact drain test)
    val doneMarker = new File(root, s"$topic.producer.done")
    def drained(): Boolean = {
      val lp = q.lastProgress
      if (lp == null || lp.sources.isEmpty) return false
      val end = Option(lp.sources.apply(0).endOffset).getOrElse(return false)
      ReplayLogOffset.parse(end).parts == FileReplayLog.endOffsets(root, topic)
    }
    while (!(doneMarker.exists() && drained())) {
      // a dead query can never drain — surface ITS exception instead of
      // spinning until the orchestrator's generic timeout discards it
      if (!q.isActive)
        throw q.exception.map(e => e: Throwable).getOrElse(
          new IllegalStateException("consumer query stopped unexpectedly"))
      Thread.sleep(100L)
    }
    q.stop()
    println(s"[xprocconsumer] life=$life done")
    spark.stop()
  }
}

/** Forks the producer and the consumer as separate JVMs, kills the
  * consumer mid-stream (SIGKILL — no graceful shutdown), restarts it on
  * the same checkpoint, then audits the ledger against the on-disk end
  * offsets: per-partition range union must cover [0, end) with NO gaps
  * (no loss); every ledger range must be dense (count == until-from);
  * overlap across the kill is the planned-but-uncommitted batch being
  * re-delivered — at-least-once, counted and reported, exactly the slot
  * re-delivery semantics. */
object XprocProbe {
  private def fork(main: String, args: Seq[String]): Process = {
    val javaBin = Paths.get(System.getProperty("java.home"), "bin", "java")
      .toString
    val jvmArgs = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments.asScala.toSeq
    val cmd = Seq(javaBin) ++ jvmArgs ++
      Seq("-cp", System.getProperty("java.class.path"), main) ++ args
    val pb = new ProcessBuilder(cmd.asJava)
    pb.environment().put("SPARK_GRAFT_CPUS",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    pb.redirectErrorStream(false)
    pb.redirectError(ProcessBuilder.Redirect.DISCARD)
    pb.redirectOutput(ProcessBuilder.Redirect.INHERIT)
    pb.start()
  }

  def main(args: Array[String]): Unit = {
    val rate = if (args.nonEmpty) args(0).toInt else 100000
    val seconds = if (args.length > 1) args(1).toInt else 20
    val parts = if (args.length > 2) args(2).toInt else 8
    val root = Files.createTempDirectory("xproc").toFile.getAbsolutePath
    val topic = "xproc"
    val ckpt = s"$root/ckpt"
    val ledger = s"$root/ledger.tsv"
    val t0 = System.nanoTime()
    // admission cap rate/2 per 100 ms trigger: batches stay bounded (the
    // kill lands between ledger appends, not inside one giant catch-up
    // batch) while restart catch-up still has 5× headroom over the feed
    val maxPerTrigger = math.max(1, rate / 2).toString
    val producer = fork("graft.XprocProducer",
      Seq(root, topic, rate.toString, seconds.toString, parts.toString))
    val consumer1 = fork("graft.XprocConsumer",
      Seq(root, topic, ckpt, ledger, "1", maxPerTrigger))
    // kill the consumer MID-STREAM, deterministically: wait until its
    // ledger shows real consumption (not just JVM/Spark startup), then
    // SIGKILL while the producer is still feeding
    val ledgerPath = Paths.get(ledger)
    val killDeadline = System.nanoTime() + seconds * 700000000L
    while (System.nanoTime() < killDeadline &&
        (!Files.exists(ledgerPath) ||
          Files.readAllLines(ledgerPath).asScala.count(_.startsWith("1 ")) < 40))
      Thread.sleep(100L)
    consumer1.destroyForcibly()
    consumer1.waitFor()
    println(s"[xproc] consumer killed at t+${(System.nanoTime() - t0) / 1000000L} ms " +
      s"after ${Files.readAllLines(ledgerPath).asScala.count(_.startsWith("1 "))} " +
      "life-1 ledger lines")
    val consumer2 = fork("graft.XprocConsumer",
      Seq(root, topic, ckpt, ledger, "2", maxPerTrigger))
    assert(producer.waitFor(seconds * 1000L + 120000L,
      java.util.concurrent.TimeUnit.MILLISECONDS), "producer timed out")
    assert(consumer2.waitFor(120000L,
      java.util.concurrent.TimeUnit.MILLISECONDS), "consumer 2 timed out")
    // ---- audit ----
    val done = Files.readString(Paths.get(root, s"$topic.producer.done"))
      .trim.split(" ")
    val produced = done(0).toLong
    val producerWallMs = done(1).toLong
    val ends = FileReplayLog.endOffsets(root, topic)
    assert(ends.values.sum == produced,
      s"log end offsets ${ends.values.sum} != produced $produced")
    // ledger: life batchId partition from untilExcl count p50 p95 p99.
    // The SIGKILL can land mid-append and tear the final line — a torn
    // line is uncommitted by construction (the ledger write precedes
    // the offset commit, so its range is re-delivered and re-logged by
    // life 2), so lines that don't parse into 9 longs are dropped, not
    // fatal.
    val lines = Files.readAllLines(Paths.get(ledger)).asScala
      .filter(_.nonEmpty)
      .flatMap { s =>
        val parts = s.split(" ")
        if (parts.length != 9) None
        else try Some(parts.map(_.toLong))
        catch { case _: NumberFormatException => None }
      }.toSeq
    lines.foreach { l =>
      assert(l(5) == l(4) - l(3),
        s"non-dense batch range: ${l.mkString(" ")}")
    }
    var lost = 0L
    var redelivered = 0L
    ends.foreach { case (p, end) =>
      val ranges = lines.filter(_(2) == p).map(l => (l(3), l(4)))
        .sortBy(_._1)
      var covered = 0L // exclusive end of contiguous coverage from 0
      ranges.foreach { case (from, until) =>
        assert(from <= covered, s"GAP in partition $p: [${covered}, $from)")
        redelivered += math.max(0L, math.min(covered, until) - from)
        covered = math.max(covered, until)
      }
      if (covered < end) lost += end - covered
    }
    assert(lost == 0L, s"LOST $lost records")
    val l1 = lines.filter(_(0) == 1L)
    val l2 = lines.filter(_(0) == 2L)
    val consumed = lines.map(l => l(4) - l(3)).sum
    // life-1 steady = median per-batch p99 before the kill; life-2 tail
    // = worst p99 over the last 5 ledger lines (post-catch-up steady —
    // the catch-up batches themselves carry the backlog's age by design)
    def med(xs: Seq[Long]): Long =
      if (xs.isEmpty) -1L else xs.sorted.apply(xs.size / 2)
    val life1P99 = med(l1.map(_(8)))
    val life2TailP99 = if (l2.isEmpty) -1L else l2.takeRight(5).map(_(8)).max
    println(s"[xproc] rate=$rate parts=$parts produced=$produced " +
      s"consumed_ranges=$consumed distinct=${consumed - redelivered} " +
      s"redelivered=$redelivered lost=$lost " +
      s"producer_sustained=${produced * 1000L / math.max(1L, producerWallMs)}/s " +
      s"life1_batches=${l1.size} life1_p99_median_ms=$life1P99 " +
      s"life2_tail_p99_ms=$life2TailP99 verdict=PASS")
  }
}
