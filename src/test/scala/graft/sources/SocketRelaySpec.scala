package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

/** The TCP relay over the file log: framing roundtrip, per-partition
  * order, cursor-addressed start, abrupt-disconnect + redial resume
  * (the replication-slot reconnect contract at connection level), ACK
  * status plumbing, and heartbeat keepalive when caught up. No Spark —
  * the relay is pure I/O over the log files. */
class SocketRelaySpec extends AnyFunSuite {

  private def tmp(): String =
    Files.createTempDirectory("sockrelay").toFile.getAbsolutePath

  private def fill(root: String, topic: String, parts: Int,
      perPart: Int): Unit = {
    (0 until parts).foreach(p => (0 until perPart).foreach(i =>
      FileReplayLog.append(root, topic, p, s"k$p-$i",
        s"v$p-$i".getBytes(UTF_8), (p * 10000 + i).toLong)))
    FileReplayLog.publish(root, topic)
  }

  test("framing roundtrip: frames arrive in per-partition offset " +
      "order with timestamps and value lengths intact") {
    val root = tmp(); val topic = "t"
    fill(root, topic, parts = 3, perPart = 50)
    val server = new SocketRelay.Server(root, topic).start()
    try {
      val client = new SocketRelay.Client("127.0.0.1", server.localPort,
        Map.empty)
      val next = scala.collection.mutable.Map.empty[Int, Long]
      var n = 0
      while (n < 150) {
        val f = client.next().get
        if (!f.isHeartbeat) {
          assert(f.offset == next.getOrElse(f.partition, 0L),
            s"order break in p${f.partition}")
          assert(f.timestampMs == f.partition * 10000 + f.offset)
          assert(f.valueLen == s"v${f.partition}-${f.offset}".length)
          next(f.partition) = f.offset + 1
          n += 1
        }
      }
      client.close()
      assert(next == Map(0 -> 50L, 1 -> 50L, 2 -> 50L))
    } finally server.stop()
  }

  test("cursor-addressed start: a client naming offsets reads exactly " +
      "the suffix, like a replication slot's confirmed LSN") {
    val root = tmp(); val topic = "t"
    fill(root, topic, parts = 2, perPart = 20)
    val server = new SocketRelay.Server(root, topic).start()
    try {
      val client = new SocketRelay.Client("127.0.0.1", server.localPort,
        Map(0 -> 15L, 1 -> 20L)) // p1 fully consumed
      val got = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
      while (got.size < 5) {
        val f = client.next().get
        if (!f.isHeartbeat) got += ((f.partition, f.offset))
      }
      client.close()
      assert(got.toSeq == (15L until 20L).map(o => (0, o)))
    } finally server.stop()
  }

  test("abrupt disconnect + redial from committed cursors: the " +
      "uncommitted window is re-delivered, nothing is lost, order holds") {
    val root = tmp(); val topic = "t"
    fill(root, topic, parts = 1, perPart = 100)
    val server = new SocketRelay.Server(root, topic).start()
    try {
      var client = new SocketRelay.Client("127.0.0.1", server.localPort,
        Map.empty)
      // consume 60, commit at 40, drop abruptly
      var seen = 0L
      while (seen < 60) {
        val f = client.next().get
        if (!f.isHeartbeat) { assert(f.offset == seen); seen += 1 }
      }
      client.close()
      // redial with the committed cursor: 40..59 re-delivered, then new
      client = new SocketRelay.Client("127.0.0.1", server.localPort,
        Map(0 -> 40L))
      var expect = 40L
      var redelivered = 0
      while (expect < 100) {
        val f = client.next().get
        if (!f.isHeartbeat) {
          assert(f.offset == expect, s"resume order: ${f.offset} vs $expect")
          if (f.offset < 60) redelivered += 1
          expect += 1
        }
      }
      client.close()
      assert(redelivered == 20, "uncommitted window must re-deliver exactly")
    } finally server.stop()
  }

  test("ACK status lines reach the server; heartbeats flow when caught " +
      "up; late publishes resume the stream on the same connection") {
    val root = tmp(); val topic = "t"
    fill(root, topic, parts = 1, perPart = 10)
    val server = new SocketRelay.Server(root, topic).start()
    try {
      val client = new SocketRelay.Client("127.0.0.1", server.localPort,
        Map.empty)
      var seen = 0L
      while (seen < 10) {
        val f = client.next().get
        if (!f.isHeartbeat) seen += 1
      }
      client.ack(Map(0 -> 10L))
      // caught up: heartbeats (and the ack lands server-side)
      var beats = 0
      while (beats < 3) { if (client.next().get.isHeartbeat) beats += 1 }
      val deadline = System.currentTimeMillis() + 5000
      while (server.lastAck.isEmpty &&
        System.currentTimeMillis() < deadline) Thread.sleep(10L)
      assert(server.lastAck == Map(0 -> 10L), "status update lost")
      // a publish AFTER catch-up flows without redialing
      FileReplayLog.append(root, topic, 0, "k", "late".getBytes(UTF_8), 99L)
      FileReplayLog.publish(root, topic)
      var late: Option[SocketRelay.Frame] = None
      while (late.isEmpty) {
        val f = client.next().get
        if (!f.isHeartbeat) late = Some(f)
      }
      assert(late.get.offset == 10L && late.get.timestampMs == 99L)
      client.close()
    } finally server.stop()
  }
}
