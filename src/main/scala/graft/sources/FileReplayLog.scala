package graft.sources

import java.io.{BufferedOutputStream, File, FileOutputStream, RandomAccessFile}
import java.nio.ByteBuffer
import java.util.concurrent.ConcurrentHashMap

/** Filesystem-backed twin of [[ReplayLog]]: the same Kafka-shaped
  * partitioned, append-only, offset-addressed log, durable on disk so
  * the producer and the consumer can be SEPARATE PROCESSES — the
  * cross-process transport the in-JVM registry cannot exercise
  * (serialization, visibility-through-the-filesystem, consumer
  * kill/restart against a log that outlives it). The reference's
  * transport always crosses a process boundary — the replication
  * connection is a real socket
  * (/root/reference/lib/realtime/tenants/replication_connection.ex:334)
  * and tenant broadcasts hop nodes via gen_rpc
  * (/root/reference/lib/realtime_web/tenant_broadcaster.ex:20-38) —
  * so the claim "the seam survives a process boundary" needs a log
  * whose bytes actually leave the producer's address space.
  *
  * Layout: `<root>/<topic>/p<N>.log` (length-framed records:
  * int64 timestampMs, int32 keyLen | -1, key UTF-8, int32 valueLen | -1,
  * value) plus `<root>/<topic>/p<N>.idx` (one big-endian int64 per
  * record: its .log file position). A partition's offset count IS
  * `idx.length / 8`, so end offsets need no broker round-trip, and a
  * reader positions at any offset with one idx seek — the replayable
  * cursor contract of a replication slot / Kafka partition.
  *
  * Write protocol: appends buffer in-process and become visible at
  * [[publish]] (the sink calls it from `DeliverySink.flush`, once per
  * Spark partition per micro-batch). The .log buffer is flushed BEFORE
  * the .idx buffer, so a concurrent reader's `idx.length / 8` never
  * counts a record whose bytes are not yet fully in the .log file; a
  * torn 8-byte idx tail floors out of the division until complete.
  * ONE producer process per partition (the broker-side invariant Kafka
  * enforces by ownership; here by convention — the probe's sharded
  * producers own disjoint partition sets).
  */
object FileReplayLog {

  private final class Writer(dir: File, partition: Int) {
    dir.mkdirs()
    private val logFile = new File(dir, s"p$partition.log")
    private val idxFile = new File(dir, s"p$partition.idx")
    private val log = new BufferedOutputStream(
      new FileOutputStream(logFile, true), 1 << 16)
    private val idx = new BufferedOutputStream(
      new FileOutputStream(idxFile, true), 1 << 13)
    // resume after producer restart: next offset + current log position
    // come from what is already on disk
    private var pos: Long = logFile.length()
    private var n: Long = idxFile.length() / 8L

    def append(timestampMs: Long, key: String, value: Array[Byte]): Long =
      synchronized {
        val k = if (key == null) null else key.getBytes("UTF-8")
        val head = ByteBuffer.allocate(12)
        head.putLong(timestampMs)
        head.putInt(if (k == null) -1 else k.length)
        log.write(head.array())
        var len = 12L
        if (k != null) { log.write(k); len += k.length }
        val vh = ByteBuffer.allocate(4)
        vh.putInt(if (value == null) -1 else value.length)
        log.write(vh.array())
        len += 4
        if (value != null) { log.write(value); len += value.length }
        val ib = ByteBuffer.allocate(8)
        ib.putLong(pos)
        idx.write(ib.array())
        pos += len
        val off = n
        n += 1
        off
      }

    def publish(): Unit = synchronized {
      log.flush() // .log first: idx length is the readers' offset truth
      idx.flush()
    }
  }

  // per-process writer handles: the sink object is deserialized per Spark
  // task, so the handle must be JVM-static (one OS file handle per
  // partition, appends serialized on the writer lock)
  private val writers = new ConcurrentHashMap[String, Writer]()

  private def writer(root: String, topic: String, p: Int): Writer =
    writers.computeIfAbsent(s"$root/$topic/$p",
      _ => new Writer(new File(root, topic), p))

  /** Append one record; returns its assigned offset. Visible to other
    * processes only after [[publish]]. */
  def append(root: String, topic: String, partition: Int, key: String,
      value: Array[Byte], timestampMs: Long = 0L): Long =
    writer(root, topic, partition).append(timestampMs, key, value)

  /** Flush this process's buffered appends for `topic` to the
    * filesystem — the produce-side visibility barrier. */
  def publish(root: String, topic: String): Unit = {
    val prefix = s"$root/$topic/"
    writers.forEach { (k, w) => if (k.startsWith(prefix)) w.publish() }
  }

  /** Partitions present on disk for `topic` (sorted). */
  def partitions(root: String, topic: String): Seq[Int] = {
    val dir = new File(root, topic)
    Option(dir.listFiles()).getOrElse(Array.empty[File]).toSeq
      .map(_.getName)
      .collect { case n if n.startsWith("p") && n.endsWith(".idx") =>
        n.stripPrefix("p").stripSuffix(".idx").toInt }
      .sorted
  }

  /** Exclusive end offset per partition — `idx.length / 8`, the number
    * of fully published records. */
  def endOffsets(root: String, topic: String): Map[Int, Long] =
    partitions(root, topic).map { p =>
      p -> new File(new File(root, topic), s"p$p.idx").length / 8L
    }.toMap

  /** Records of one partition in `[from, until)` — the replay read.
    * One idx seek + one sequential log scan; safe to call while the
    * producer appends (reads never pass the published idx length). */
  def read(root: String, topic: String, partition: Int, from: Long,
      until: Long): Seq[ReplayLog.Record] = {
    val dir = new File(root, topic)
    val idxFile = new File(dir, s"p$partition.idx")
    val logFile = new File(dir, s"p$partition.log")
    if (!idxFile.exists()) return Nil
    val published = idxFile.length / 8L
    val lo = math.max(from, 0L)
    val hi = math.min(until, published)
    if (lo >= hi) return Nil
    val idx = new RandomAccessFile(idxFile, "r")
    val log = new RandomAccessFile(logFile, "r")
    try {
      idx.seek(lo * 8L)
      val startPos = idx.readLong()
      log.seek(startPos)
      val out = Vector.newBuilder[ReplayLog.Record]
      var o = lo
      while (o < hi) {
        val ts = log.readLong()
        val kLen = log.readInt()
        val key = if (kLen < 0) null else {
          val b = new Array[Byte](kLen); log.readFully(b); new String(b, "UTF-8")
        }
        val vLen = log.readInt()
        val value = if (vLen < 0) null else {
          val b = new Array[Byte](vLen); log.readFully(b); b
        }
        out += ReplayLog.Record(topic, partition, o, ts, key, value)
        o += 1
      }
      out.result()
    } finally { idx.close(); log.close() }
  }

  /** Forget this process's writer handles for `topic` WITHOUT touching
    * the files — the next append re-attaches from the on-disk lengths,
    * exactly what a restarted producer process does (specs use it to
    * simulate that restart in one JVM). */
  private[graft] def dropWriters(root: String, topic: String): Unit = {
    val prefix = s"$root/$topic/"
    val it = writers.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey.startsWith(prefix)) { e.getValue.publish(); it.remove() }
    }
  }

  /** Drop a topic directory (probe/spec hygiene) and forget this
    * process's writer handles for it. */
  def delete(root: String, topic: String): Unit = {
    val prefix = s"$root/$topic/"
    val it = writers.keySet().iterator()
    while (it.hasNext) if (it.next().startsWith(prefix)) it.remove()
    val dir = new File(root, topic)
    Option(dir.listFiles()).getOrElse(Array.empty[File]).foreach(_.delete())
    dir.delete()
    ()
  }
}

/** Outbound cross-process transport: [[ReplayLogSink]]'s file-backed
  * twin — frames keyed by `subscriptionId` (hash-modded over
  * `numPartitions`, offset `partitionBase` for sharded producers owning
  * disjoint partition ranges), appended to the durable log, published
  * at partition flush so a consumer process sees whole micro-batches. */
final class FileReplayLogSink(val root: String, val topic: String,
    val numPartitions: Int = 4, val partitionBase: Int = 0)
    extends graft.cdc.CdcStream.DeliverySink {
  require(numPartitions > 0, "numPartitions must be positive")

  def offer(d: graft.cdc.CdcStream.Delivery): Unit = {
    val p = partitionBase +
      (d.subscriptionId.hashCode & 0x7fffffff) % numPartitions
    FileReplayLog.append(root, topic, p, d.subscriptionId,
      d.frame.getBytes("UTF-8"), System.currentTimeMillis())
    ()
  }

  override def flush(): Unit = FileReplayLog.publish(root, topic)
}
