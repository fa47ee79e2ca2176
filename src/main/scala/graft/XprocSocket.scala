package graft

import graft.sources.{FileReplayLog, SocketRelay}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** The TCP relay as its own JVM: serves the topic over a socket and
  * appends `wallMs sentTotal` stats samples for the probe's
  * backpressure audit. Exits when the stop marker appears. */
object XprocRelay {
  def main(args: Array[String]): Unit = {
    val Array(root, topic, portFile, statsFile, stopMarker) = args.take(5)
    val server = new SocketRelay.Server(root, topic).start()
    // temp-write + ATOMIC_MOVE (r13 advice): Files.writeString is
    // create-then-write, so a probe polling for the file's existence
    // could read it empty between the two; the rename makes the content
    // appear atomically
    val tmpPort = Paths.get(portFile + ".tmp")
    Files.writeString(tmpPort, server.localPort.toString)
    Files.move(tmpPort, Paths.get(portFile),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    while (!Files.exists(Paths.get(stopMarker))) {
      Files.write(Paths.get(statsFile),
        s"${System.currentTimeMillis()} ${server.sentTotal}\n".getBytes(UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
      Thread.sleep(100L)
    }
    server.stop()
  }
}

/** Socket-leg probe (round-12 verdict task 3 follow-through): producer
  * JVM → file log → RELAY JVM → TCP → this process's consumer. The
  * file log stays the durability story ([[XprocProbe]] proves
  * kill/restart); the socket is the FLOW-CONTROL story, mirroring the
  * reference's replication connection
  * (replication_connection.ex:334 — a socket with keepalive and
  * status updates):
  *
  *  - BACKPRESSURE: mid-produce, the consumer throttles itself for a
  *    few seconds. The relay's bounded-buffer send loop must stall at
  *    consumer speed — the audit asserts the in-flight window
  *    (relay-sent minus consumer-consumed) stays in the
  *    socket-buffer-sized band while the on-disk backlog grows past it
  *    by an order of magnitude; a relay that slurped the backlog into
  *    heap or kernel buffers fails the bound.
  *  - RECONNECT: the consumer drops the connection abruptly
  *    mid-stream and redials with its last COMMITTED cursors. Frames
  *    past the committed cursor that were received before the drop are
  *    re-delivered (at-least-once, counted exactly); per-partition
  *    order holds within each connection; the final union covers
  *    [0, end) with no gaps — the replication-slot reconnect contract.
  *
  * Prints one `[xprocsocket] … verdict=PASS` line for COVERAGE. */
object XprocSocketProbe {
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
    pb.redirectError(ProcessBuilder.Redirect.DISCARD)
    pb.redirectOutput(ProcessBuilder.Redirect.INHERIT)
    pb.start()
  }

  /** In-flight bound for the backpressure audit: 2× send + receive
    * socket buffers at minimum frame size, plus the relay's bounded
    * read-ahead — generous at ~8× the measured window, tiny vs the
    * backlog the bound is checked against. */
  val InflightBound = 100000L

  def main(args: Array[String]): Unit = {
    val rate = if (args.nonEmpty) args(0).toInt else 320000
    val seconds = if (args.length > 1) args(1).toInt else 12
    val parts = if (args.length > 2) args(2).toInt else 8
    val slowMs = 4000L
    val slowRate = 15000 // frames/s during the throttled window
    val commitEvery = 50000L
    val root = Files.createTempDirectory("xprocsock").toFile.getAbsolutePath
    val topic = "xprocsock"
    val portFile = s"$root/relay.port"
    val statsFile = s"$root/relay.stats"
    val stopMarker = s"$root/relay.stop"

    val producer = fork("graft.XprocProducer",
      Seq(root, topic, rate.toString, seconds.toString, parts.toString))
    val relay = fork("graft.XprocRelay",
      Seq(root, topic, portFile, statsFile, stopMarker))
    // a failed audit must not strand the children: the relay polls the
    // stop marker forever, which otherwise holds the orchestrator's
    // pipes open long after an assertion kills this main
    sys.addShutdownHook {
      try Files.writeString(Paths.get(stopMarker), "stop")
      catch { case _: Exception => () }
      producer.destroyForcibly(); relay.destroyForcibly()
    }
    // loop until the content PARSES (r13 advice): even with the relay's
    // atomic move, the reader must not die on a transiently unreadable
    // file — retry until an int comes back
    def readPort(): Int = {
      var port = Option.empty[Int]
      while (port.isEmpty) {
        if (Files.exists(Paths.get(portFile)))
          port = scala.util.Try(
            Files.readString(Paths.get(portFile)).trim.toInt).toOption
        if (port.isEmpty) Thread.sleep(50L)
      }
      port.get
    }
    val port = readPort()

    // disk-side sampler: (wallMs, publishedTotal) — the backlog half of
    // the backpressure audit
    val diskSamples = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    @volatile var sampling = true
    val sampler = new Thread(() => while (sampling) {
      diskSamples.add((System.currentTimeMillis(),
        FileReplayLog.endOffsets(root, topic).values.sum))
      Thread.sleep(100L)
    }, "disk-sampler")
    sampler.setDaemon(true); sampler.start()

    // ---- consumer (this process) ----
    val nextExpected = scala.collection.mutable.Map.empty[Int, Long]
    var committed = Map.empty[Int, Long]
    var consumed = 0L
    var sinceCommit = 0L
    var redelivered = 0L
    val consumedSamples = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var client = new SocketRelay.Client("127.0.0.1", port, committed)
    // after a redial the relay re-sends from the committed cursor, so
    // expectation per partition resets; frames below the pre-drop
    // nextExpected are the re-delivery
    val preDropExpected = scala.collection.mutable.Map.empty[Int, Long]
    var phase = 0 // 0 fast, 1 slow, 2 fast-until-drop, 3 post-redial
    var slowStartMs = 0L; var slowEndMs = 0L; var slowStartConsumed = 0L
    var redialMs = 0L; var redialConsumed = 0L
    var dropAt = Long.MaxValue
    val doneMarker = Paths.get(root, s"$topic.producer.done")
    var lastSample = 0L
    val t0 = System.currentTimeMillis()
    def sample(): Unit = {
      val now = System.currentTimeMillis()
      if (now - lastSample >= 50L) {
        lastSample = now
        consumedSamples += ((now, consumed))
      }
    }
    def drained(): Boolean =
      Files.exists(doneMarker) && {
        val ends = FileReplayLog.endOffsets(root, topic)
        ends.nonEmpty && ends.forall { case (p, e) =>
          nextExpected.getOrElse(p, 0L) >= e }
      }
    var done = false
    while (!done) {
      client.next() match {
        case Some(f) if f.isHeartbeat =>
          // keepalive: the relay is caught up — the moment to run the
          // (file-stat-priced) drain check instead of per frame
          if (drained()) done = true
        case Some(f) =>
          val exp = nextExpected.getOrElse(f.partition,
            committed.getOrElse(f.partition, 0L))
          // per-partition offsets strictly increase within a
          // connection, so each re-delivered frame (below the pre-drop
          // high-water mark) is counted exactly once
          if (phase == 3 && f.offset < preDropExpected.getOrElse(f.partition, 0L))
            redelivered += 1
          assert(f.offset == exp,
            s"out-of-order in partition ${f.partition}: got ${f.offset}, " +
              s"expected $exp")
          nextExpected(f.partition) = f.offset + 1
          consumed += 1; sinceCommit += 1
          sample()
          if (sinceCommit >= commitEvery) {
            committed = nextExpected.toMap
            client.ack(committed)
            sinceCommit = 0L
          }
          phase match {
            case 0 if consumed >= 300000L =>
              phase = 1; slowStartMs = System.currentTimeMillis()
              slowStartConsumed = consumed
            case 1 =>
              val now = System.currentTimeMillis()
              if (now >= slowStartMs + slowMs) {
                phase = 2; slowEndMs = now
                dropAt = consumed + 300000L
              } else {
                // rate-limit: stay at slowRate by pacing against the
                // window start
                val ahead = consumed - slowStartConsumed -
                  (now - slowStartMs) * slowRate / 1000L
                if (ahead > 0)
                  Thread.sleep(math.min(50L, ahead * 1000L / slowRate))
              }
            case 2 if consumed >= dropAt =>
              // abrupt drop + redial from committed
              preDropExpected ++= nextExpected
              committedAtDrop = committed
              client.close()
              Thread.sleep(500L)
              nextExpected.clear()
              nextExpected ++= committed
              client = new SocketRelay.Client("127.0.0.1", port, committed)
              phase = 3
              redialMs = System.currentTimeMillis()
              redialConsumed = consumed
            case _ => ()
          }
        case None =>
          // connection ended server-side (shouldn't happen) — redial
          Thread.sleep(200L)
          client = new SocketRelay.Client("127.0.0.1", port,
            nextExpected.toMap)
      }
    }
    val wallMs = System.currentTimeMillis() - t0
    client.close()
    sampling = false
    Files.writeString(Paths.get(stopMarker), "stop")
    producer.waitFor(); relay.waitFor()

    // ---- audit ----
    val doneParts = Files.readString(doneMarker).trim.split(" ")
    val produced = doneParts(0).toLong
    val ends = FileReplayLog.endOffsets(root, topic)
    assert(ends.values.sum == produced, "log ends != produced")
    val lost = ends.map { case (p, e) =>
      math.max(0L, e - nextExpected.getOrElse(p, 0L)) }.sum
    assert(lost == 0L, s"LOST $lost frames")
    assert(consumed - redelivered == produced,
      s"distinct consumed ${consumed - redelivered} != produced $produced")
    // backpressure: in-flight window at slow-window end vs disk backlog
    val stats = Files.readAllLines(Paths.get(statsFile)).asScala
      .map(_.split(" ")).filter(_.length == 2)
      .map(a => (a(0).toLong, a(1).toLong)).toSeq
    // SERIES ALIGNMENT (r13 advice): the relay stats tick every 100 ms
    // and the consumer samples every ~50 ms, independently — subtracting
    // the latest-before-t values of each lets the sent sample be up to
    // ~100 ms staler than the consumed one, so the difference can read
    // negative or inflated on a healthy run. Anchor both series at the
    // SAME instant: take the relay's own last sample at/before the
    // slow-window end as t*, read `sent` exactly there, and interpolate
    // the (denser, monotone) consumed/disk series to t*.
    def interp(samples: Seq[(Long, Long)], t: Long): Long = {
      val sorted = samples.sortBy(_._1)
      val below = sorted.takeWhile(_._1 <= t).lastOption
      val above = sorted.find(_._1 > t)
      (below, above) match {
        case (Some((t0, v0)), Some((t1, v1))) if t1 > t0 =>
          v0 + (v1 - v0) * (t - t0) / (t1 - t0)
        case (Some((_, v0)), _) => v0
        case (None, Some((_, v1))) => v1
        case _ => 0L
      }
    }
    val sentSample = stats.filter(_._1 <= slowEndMs)
      .sortBy(_._1).lastOption.getOrElse((slowEndMs, 0L))
    val tStar = sentSample._1
    val sentAtSlowEnd = sentSample._2
    val consumedAtSlowEnd = interp(consumedSamples.toSeq, tStar)
    val publishedAtSlowEnd = interp(diskSamples.asScala.toSeq, tStar)
    val inflight = sentAtSlowEnd - consumedAtSlowEnd
    val backlog = publishedAtSlowEnd - sentAtSlowEnd
    // the interpolation of a step-shaped counter is linear between
    // samples, so the aligned difference still carries a small residual:
    // at the throttled consume rate (15k/s) a 50 ms sample gap bounds it
    // under ~1k frames — the slack below is 5× that, tiny vs the bound
    val InterpSlack = 5000L
    assert(inflight >= -InterpSlack && inflight < InflightBound,
      s"backpressure failed: in-flight $inflight frames at t*=$tStar " +
        s"(bound $InflightBound) — relay buffered the backlog")
    assert(backlog > 2L * InflightBound,
      s"backpressure unproven: disk backlog $backlog at slow-window end " +
        "never exceeded the in-flight bound — raise the rate")
    println(s"[xprocsocket] rate=$rate parts=$parts produced=$produced " +
      s"consumed=$consumed redelivered=$redelivered lost=0 " +
      s"sustained=${consumed * 1000L / math.max(1L, wallMs)}/s " +
      s"catchup_rate=${(consumed - redialConsumed) * 1000L /
        math.max(1L, t0 + wallMs - redialMs)}/s " +
      s"slow_window_ms=$slowMs inflight_at_slow_end=$inflight " +
      s"disk_backlog_at_slow_end=$backlog " +
      s"uncommitted_at_drop=${(preDropExpected.map { case (p, e) =>
        e - committedAtDrop.getOrElse(p, 0L) }).sum} verdict=PASS")
  }

  // the committed map frozen at drop time, for the re-delivery window
  // accounting in the verdict line
  private var committedAtDrop: Map[Int, Long] = Map.empty
}
