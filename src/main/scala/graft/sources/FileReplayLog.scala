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
  * Spark partition per micro-batch). Pending idx entries stay IN HEAP
  * until publish and reach the file only AFTER the .log flush — so a
  * concurrent reader's `idx.length / 8` can never count a record whose
  * bytes are not yet fully in the .log file, structurally (the .log
  * buffer may auto-flush early, which is safe in that direction); a
  * torn 8-byte idx tail floors out of the division until complete.
  * ONE producer process per partition (the broker-side invariant Kafka
  * enforces by ownership; here by convention — the probe's sharded
  * producers own disjoint partition sets).
  */
object FileReplayLog {

  private[sources] final class Writer(dir: File, partition: Int) {
    dir.mkdirs()
    private val logFile = new File(dir, s"p$partition.log")
    private val idxFile = new File(dir, s"p$partition.idx")
    // sanitize a torn idx TAIL before appending (r12 advice): a crash
    // mid `idxPending.writeTo` can leave the idx length not a multiple
    // of 8. Concurrent readers are safe (their offset count floors out
    // of `length / 8`), but a restarted producer appending 8-byte
    // entries AFTER the torn bytes would permanently misalign every
    // subsequent offset — so the writer truncates to the last complete
    // entry first. The torn entry's log bytes (flushed before idx, so
    // already on disk) become orphans, which read() never addresses.
    locally {
      val torn = idxFile.length % 8L
      if (torn != 0L) {
        val raf = new RandomAccessFile(idxFile, "rw")
        try raf.setLength(idxFile.length - torn) finally raf.close()
      }
    }
    private val log = new BufferedOutputStream(
      new FileOutputStream(logFile, true), 1 << 16)
    private val idx = new FileOutputStream(idxFile, true)
    // pending idx entries stay IN HEAP until publish: the idx file's
    // length is the readers' offset truth, so no idx byte may reach the
    // filesystem before its record's log bytes — a buffered idx stream
    // would auto-flush mid-batch independently of the log buffer and
    // hand readers offsets whose bytes are not on disk yet. The heap
    // staging is bounded by one micro-batch per partition (8 bytes per
    // record), and publish() writes it only AFTER the log flush.
    private var idxPending = new java.io.ByteArrayOutputStream(1 << 13)
    // resume after producer restart: next offset + current log position
    // come from what is already on disk. pos starts at the FILE length,
    // which after a crash may include orphan bytes past the last idx
    // entry (a flush died between log and idx) — safe by construction:
    // new records land after the orphans and the reader addresses every
    // record by its own idx position, never by contiguity (see read()).
    private var pos: Long = logFile.length()
    private var n: Long = idxFile.length / 8L
    // 8-byte idx scratch, reused under the lock — the append hot path
    // allocates nothing inside the critical section
    private val idxScratch = new Array[Byte](8)

    private def stageIdx(): Unit = {
      var p = pos
      var i = 7
      while (i >= 0) { idxScratch(i) = (p & 0xff).toByte; p >>= 8; i -= 1 }
      idxPending.write(idxScratch, 0, 8)
    }

    /** Append one PRE-FRAMED record (built by [[frame]] outside the
      * lock — at knee-order rates the critical section must be two
      * buffered writes and a counter bump, nothing else). */
    def appendFramed(record: Array[Byte]): Long = synchronized {
      log.write(record)
      stageIdx()
      pos += record.length
      val off = n
      n += 1
      off
    }

    /** Append `count` pre-framed records in one lock acquisition — the
      * producer-client batching that makes the durable seam keep pace
      * at knee-order rates (measured r12: per-record locking capped the
      * in-JVM durable produce below 320k; 64-record chunks restore it). */
    def appendFramedBatch(records: Array[Array[Byte]], count: Int): Unit =
      synchronized {
        var j = 0
        while (j < count) {
          val record = records(j)
          log.write(record)
          stageIdx()
          pos += record.length
          n += 1
          j += 1
        }
      }

    def publish(): Unit = synchronized {
      log.flush() // .log first: idx length is the readers' offset truth
      if (idxPending.size > 0) {
        idxPending.writeTo(idx)
        idx.flush()
        idxPending.reset()
      }
    }

    /** Flush and release the OS file handles (topic delete / handle
      * drop) — without this every churned topic leaks two descriptors
      * per partition until GC. */
    def close(): Unit = synchronized {
      try publish() finally { log.close(); idx.close() }
    }
  }

  /** Serialize one record to its on-disk framing — lock-free, called
    * on the producing thread before [[Writer.appendFramed]]. */
  private[sources] def frame(timestampMs: Long, key: String,
      value: Array[Byte]): Array[Byte] = {
    val k = if (key == null) null else key.getBytes("UTF-8")
    val kLen = if (k == null) 0 else k.length
    val vLen = if (value == null) 0 else value.length
    val out = new Array[Byte](12 + kLen + 4 + vLen)
    val bb = ByteBuffer.wrap(out)
    bb.putLong(timestampMs)
    bb.putInt(if (k == null) -1 else kLen)
    if (k != null) bb.put(k)
    bb.putInt(if (value == null) -1 else vLen)
    if (value != null) bb.put(value)
    out
  }

  // per-process writer handles: the sink object is deserialized per Spark
  // task, so the handle must be JVM-static (one OS file handle per
  // partition, appends serialized on the writer lock)
  private val writers = new ConcurrentHashMap[String, Writer]()

  private[sources] def writer(root: String, topic: String, p: Int): Writer =
    writers.computeIfAbsent(s"$root/$topic/$p",
      _ => new Writer(new File(root, topic), p))

  /** Append one record; returns its assigned offset. Visible to other
    * processes only after [[publish]]. */
  def append(root: String, topic: String, partition: Int, key: String,
      value: Array[Byte], timestampMs: Long = 0L): Long =
    writer(root, topic, partition).appendFramed(frame(timestampMs, key, value))

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

  private def trimFile(dir: File, p: Int) = new File(dir, s"p$p.trim")

  /** Oldest RETAINED offset of a partition — 0 until retention has
    * trimmed. The marker is an 8-byte big-endian sidecar
    * (`p<N>.trim`): offsets below it are unreachable through [[read]]
    * even though their bytes still sit in the single-file .log (at
    * scale the log would be segment files and the pre-trim segments
    * would be unlinked — the single-file layout keeps the bytes but
    * the ADDRESSING contract is identical). */
  def beginningOffset(root: String, topic: String, partition: Int): Long = {
    val f = trimFile(new File(root, topic), partition)
    if (!f.exists() || f.length < 8L) 0L
    else {
      val raf = new RandomAccessFile(f, "r")
      try raf.readLong() finally raf.close()
    }
  }

  /** Oldest retained offset per partition. */
  def beginningOffsets(root: String, topic: String): Map[Int, Long] =
    partitions(root, topic)
      .map(p => p -> beginningOffset(root, topic, p)).toMap

  /** The slot-overflow watchdog — the `max_slot_wal_keep_size` analog
    * (the reference's WAL-bloat integration,
    * test/integration/rt_channel/wal_bloat_test.exs:22-33,78-160: a
    * 32 MB slot cap under a 1 GB WAL burst invalidates the slot and the
    * replication connection redials past the gap). Advances each
    * partition's beginning so at most `maxRecords` PUBLISHED records
    * stay retained, REGARDLESS of any consumer's cursor — retention is
    * the broker/database's decision, exactly what makes the contract
    * at-most-once once a consumer stalls past it. Returns the new
    * beginnings; a consumer whose committed cursor fell below its
    * partition's beginning resumes at the beginning with the gap
    * COUNTED (see [[SocketRelay.Server.lostTotal]]). */
  def enforceRetention(root: String, topic: String,
      maxRecords: Long): Map[Int, Long] = {
    val dir = new File(root, topic)
    endOffsets(root, topic).map { case (p, end) =>
      val begin = beginningOffset(root, topic, p)
      val target = math.max(begin, end - maxRecords)
      if (target > begin) {
        val raf = new RandomAccessFile(trimFile(dir, p), "rw")
        try { raf.seek(0L); raf.writeLong(target) } finally raf.close()
      }
      p -> target
    }
  }

  /** Bulk-read chunk bound (bytes). The bulk body read buffers a span
    * of the .log file in heap; an UNBOUNDED span both risks the Int
    * cast (a caller-sized range whose records span > 2 GiB would wrap
    * negative — r13 advice) and doubles the range's heap footprint. So
    * [[read]] slices the range into chunks of at most this many bytes
    * (one readFully each); a single record larger than the bound falls
    * back to the per-field path (no span buffer at all), so position
    * arithmetic stays in Long end to end and no allocation exceeds the
    * bound plus one record. */
  private[sources] val ReadChunkBytes: Long = 64L << 20

  /** Records of one partition in `[from, until)` — the replay read.
    * One bulk idx read, then every record is addressed by ITS OWN idx
    * position (one seek each — free when the region is contiguous, and
    * the only correct addressing when it is not: after a producer
    * crash between the log flush and the idx write, orphan log bytes
    * can sit between indexed records, and a contiguity-assuming scan
    * would return them as shifted records with no error). Safe to call
    * while the producer appends — reads never pass the published idx
    * length, and idx bytes only reach disk after their log bytes. */
  def read(root: String, topic: String, partition: Int, from: Long,
      until: Long): Seq[ReplayLog.Record] =
    read(root, topic, partition, from, until, ReadChunkBytes)

  /** [[read]] with an explicit chunk bound — the spec seam (a tiny
    * bound forces every chunk shape: multi-record, single-record, and
    * the oversized-record per-field fallback). */
  private[sources] def read(root: String, topic: String, partition: Int,
      from: Long, until: Long, chunkBytes: Long): Seq[ReplayLog.Record] = {
    val dir = new File(root, topic)
    val idxFile = new File(dir, s"p$partition.idx")
    val logFile = new File(dir, s"p$partition.log")
    if (!idxFile.exists()) return Nil
    val published = idxFile.length / 8L
    // retention clamp: offsets below the trim marker are gone (the
    // slot-overflow contract — see enforceRetention); callers that need
    // to DETECT the clamp compare against beginningOffset first
    val lo = math.max(from, beginningOffset(root, topic, partition))
    val hi = math.min(until, published)
    if (lo >= hi) return Nil
    val count = (hi - lo).toInt
    val idx = new RandomAccessFile(idxFile, "r")
    val log = new RandomAccessFile(logFile, "r")
    try {
      idx.seek(lo * 8L)
      val posBytes = new Array[Byte](count * 8)
      idx.readFully(posBytes)
      val posBuf = ByteBuffer.wrap(posBytes)
      val out = Vector.newBuilder[ReplayLog.Record]
      // BULK body read (round-13; chunk-bounded round-14): the
      // per-record path paid ~5 syscalls each (seek + one read per
      // field — the single-threaded socket relay topped out at ~94k
      // frames/s on exactly this). All records up to the second-to-last
      // lie inside [pos(lo), pos(hi-1)) — each record's bytes start at
      // ITS OWN idx position and end at or before the next one (crash
      // orphans only pad the gap between them) — so a readFully per
      // ≤`chunkBytes` slice covers them and the parse is in-heap
      // slicing at absolute-position offsets, orphan-safe by the same
      // addressing as before. Only the LAST record, whose end no idx
      // entry bounds, always takes the per-field path; a single record
      // (plus its orphan gap) larger than the bound takes it too, so no
      // Int cast ever sees a >`chunkBytes` span.
      def posAt(k: Int): Long = posBuf.getLong(k * 8)
      def readOne(position: Long, offset: Long): ReplayLog.Record = {
        log.seek(position)
        val ts = log.readLong()
        val kLen = log.readInt()
        val key = if (kLen < 0) null else {
          val b = new Array[Byte](kLen); log.readFully(b); new String(b, "UTF-8")
        }
        val vLen = log.readInt()
        val value = if (vLen < 0) null else {
          val b = new Array[Byte](vLen); log.readFully(b); b
        }
        ReplayLog.Record(topic, partition, offset, ts, key, value)
      }
      val lastPos = posAt(count - 1)
      var o = lo
      var i = 0
      while (i < count - 1) {
        val chunkBase = posAt(i)
        // extend the chunk while the NEXT record still ends in-bound;
        // all arithmetic on raw Long file positions
        var j = i + 1
        while (j < count - 1 && posAt(j + 1) - chunkBase <= chunkBytes) j += 1
        val span = posAt(j) - chunkBase
        if (span > chunkBytes) {
          // only possible at j == i + 1: one record (plus any crash-
          // orphan gap before the next) exceeds the bound — per-field
          // path, no span buffer
          out += readOne(chunkBase, o)
          o += 1
          i = j
        } else {
          val body = new Array[Byte](span.toInt)
          log.seek(chunkBase)
          log.readFully(body)
          val bodyBuf = ByteBuffer.wrap(body)
          while (i < j) {
            bodyBuf.position((posAt(i) - chunkBase).toInt)
            val ts = bodyBuf.getLong
            val kLen = bodyBuf.getInt
            val key = if (kLen < 0) null else {
              val b = new Array[Byte](kLen); bodyBuf.get(b)
              new String(b, "UTF-8")
            }
            val vLen = bodyBuf.getInt
            val value = if (vLen < 0) null else {
              val b = new Array[Byte](vLen); bodyBuf.get(b); b
            }
            out += ReplayLog.Record(topic, partition, o, ts, key, value)
            o += 1
            i += 1
          }
        }
      }
      out += readOne(lastPos, o)
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
      if (e.getKey.startsWith(prefix)) { e.getValue.close(); it.remove() }
    }
  }

  /** Drop a topic directory (probe/spec hygiene) and forget this
    * process's writer handles for it — handles are CLOSED first (file
    * descriptors released; a sink still caching a closed handle fails
    * loudly on its next append instead of writing to an unlinked
    * inode). */
  def delete(root: String, topic: String): Unit = {
    dropWriters(root, topic)
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

  // Producer-client batching, the Kafka-producer discipline: offer()
  // frames the record lock-free and STAGES it per partition in this
  // task's sink instance (Spark deserializes one sink copy per task, so
  // staging needs no synchronization); a 64-record chunk — or the
  // partition flush at micro-batch end — appends under ONE lock
  // acquisition. Measured r12: per-record locking capped the in-JVM
  // durable produce below 320k/s (p99 1.1–1.3 s); chunked appends
  // sustain it. Per-subscriber order is unchanged (a subscriber's
  // frames stage in produce order on whichever task produced them —
  // the same interleaving contract as the unbatched path), and
  // durability semantics are unchanged: everything is on disk at
  // `flush`, which precedes the engine's batch completion.
  private val ChunkSize = 64
  @transient private lazy val handles =
    new Array[FileReplayLog.Writer](numPartitions)
  @transient private lazy val staged =
    Array.fill(numPartitions)(new Array[Array[Byte]](ChunkSize))
  @transient private lazy val stagedN = new Array[Int](numPartitions)

  private def handle(i: Int): FileReplayLog.Writer = {
    var w = handles(i)
    if (w == null) {
      w = FileReplayLog.writer(root, topic, partitionBase + i)
      handles(i) = w
    }
    w
  }

  def offer(d: graft.cdc.CdcStream.Delivery): Unit = {
    val i = (d.subscriptionId.hashCode & 0x7fffffff) % numPartitions
    val buf = staged(i)
    buf(stagedN(i)) = FileReplayLog.frame(System.currentTimeMillis(),
      d.subscriptionId, d.frame.getBytes("UTF-8"))
    stagedN(i) += 1
    if (stagedN(i) == ChunkSize) {
      handle(i).appendFramedBatch(buf, ChunkSize)
      stagedN(i) = 0
    }
  }

  override def flush(): Unit = {
    var i = 0
    while (i < numPartitions) {
      if (stagedN(i) > 0) {
        handle(i).appendFramedBatch(staged(i), stagedN(i))
        stagedN(i) = 0
      }
      i += 1
    }
    FileReplayLog.publish(root, topic)
  }
}
