package graft.sources

import graft.SparkSpec
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

/** The file-backed log: byte-roundtrip through the on-disk framing,
  * publish-gated visibility, producer-restart reattach, and the DSv2
  * micro-batch tail (admission + checkpoint restart) over the `root`
  * option — everything the cross-process probe relies on, provable in
  * one JVM because the contract is the FILES, not shared memory. */
class FileReplayLogSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("freplay").toFile.getAbsolutePath

  test("append/publish/read roundtrip: offsets dense per partition, " +
      "null key and value preserved, timestamps carried") {
    val root = tmp()
    val topic = "t"
    assert(FileReplayLog.append(root, topic, 0, "k0", "v0".getBytes(UTF_8), 5L) == 0L)
    assert(FileReplayLog.append(root, topic, 0, null, "v1".getBytes(UTF_8), 6L) == 1L)
    assert(FileReplayLog.append(root, topic, 0, "k2", null, 7L) == 2L)
    assert(FileReplayLog.append(root, topic, 3, "x", "y".getBytes(UTF_8), 8L) == 0L)
    FileReplayLog.publish(root, topic)
    assert(FileReplayLog.partitions(root, topic) == Seq(0, 3))
    assert(FileReplayLog.endOffsets(root, topic) == Map(0 -> 3L, 3 -> 1L))
    val recs = FileReplayLog.read(root, topic, 0, 0L, 10L)
    assert(recs.map(_.offset) == Seq(0L, 1L, 2L))
    assert(recs.map(_.timestampMs) == Seq(5L, 6L, 7L))
    assert(recs(0).key == "k0" && new String(recs(0).value, UTF_8) == "v0")
    assert(recs(1).key == null && new String(recs(1).value, UTF_8) == "v1")
    assert(recs(2).key == "k2" && recs(2).value == null)
    // mid-log positioning: one idx seek, not a scan from zero
    assert(FileReplayLog.read(root, topic, 0, 1L, 2L).map(r =>
      new String(r.value, UTF_8)) == Seq("v1"))
  }

  test("unpublished appends are invisible to readers; publish is the " +
      "visibility barrier") {
    val root = tmp()
    val topic = "t"
    FileReplayLog.append(root, topic, 0, "k", "early".getBytes(UTF_8))
    FileReplayLog.publish(root, topic)
    FileReplayLog.append(root, topic, 0, "k", "buffered".getBytes(UTF_8))
    // a reader (other process) sees only the published prefix
    assert(FileReplayLog.endOffsets(root, topic) == Map(0 -> 1L))
    assert(FileReplayLog.read(root, topic, 0, 0L, 10L).size == 1)
    FileReplayLog.publish(root, topic)
    assert(FileReplayLog.endOffsets(root, topic) == Map(0 -> 2L))
  }

  test("a restarted producer process re-attaches from on-disk lengths: " +
      "offsets continue, bytes intact") {
    val root = tmp()
    val topic = "t"
    assert(FileReplayLog.append(root, topic, 0, "a", "1".getBytes(UTF_8)) == 0L)
    FileReplayLog.dropWriters(root, topic) // simulated process restart
    assert(FileReplayLog.append(root, topic, 0, "b", "2".getBytes(UTF_8)) == 1L)
    FileReplayLog.publish(root, topic)
    val recs = FileReplayLog.read(root, topic, 0, 0L, 10L)
    assert(recs.map(r => new String(r.value, UTF_8)) == Seq("1", "2"))
  }

  test("crash-orphaned log bytes are unreachable: a producer that died " +
      "between log flush and idx write leaves garbage the reader never " +
      "returns, and restart-resume appends cleanly after it") {
    val root = tmp()
    val topic = "t"
    FileReplayLog.append(root, topic, 0, "a", "one".getBytes(UTF_8))
    FileReplayLog.append(root, topic, 0, "b", "two".getBytes(UTF_8))
    FileReplayLog.publish(root, topic)
    FileReplayLog.dropWriters(root, topic)
    // simulate the crash window: log bytes hit disk, their idx entry
    // did not (publish flushes .log before .idx, so this is exactly
    // what a kill between the two leaves behind)
    val logFile = new java.io.File(new java.io.File(root, topic), "p0.log")
    val orphan = new java.io.FileOutputStream(logFile, true)
    orphan.write("GARBAGE-ORPHAN-RECORD-BYTES".getBytes(UTF_8))
    orphan.close()
    // restarted producer re-attaches from on-disk lengths and appends
    FileReplayLog.append(root, topic, 0, "c", "three".getBytes(UTF_8))
    FileReplayLog.publish(root, topic)
    assert(FileReplayLog.endOffsets(root, topic) == Map(0 -> 3L))
    val recs = FileReplayLog.read(root, topic, 0, 0L, 10L)
    assert(recs.map(r => new String(r.value, UTF_8)) ==
      Seq("one", "two", "three"),
      "orphan bytes leaked into the offset space")
    assert(recs.map(_.key) == Seq("a", "b", "c"))
  }

  test("a torn 8-byte idx tail is truncated on writer restart: offsets " +
      "stay aligned, the torn entry's record becomes an orphan") {
    val root = tmp()
    val topic = "t"
    FileReplayLog.append(root, topic, 0, "a", "one".getBytes(UTF_8))
    FileReplayLog.append(root, topic, 0, "b", "two".getBytes(UTF_8))
    FileReplayLog.publish(root, topic)
    FileReplayLog.dropWriters(root, topic)
    // simulate a crash mid idxPending.writeTo: the log bytes of a third
    // record are fully on disk (log flushes first), but only 4 of its 8
    // idx bytes made it
    val dir = new java.io.File(root, topic)
    val logOut = new java.io.FileOutputStream(
      new java.io.File(dir, "p0.log"), true)
    logOut.write("TORN-RECORD-LOG-BYTES".getBytes(UTF_8)); logOut.close()
    val idxOut = new java.io.FileOutputStream(
      new java.io.File(dir, "p0.idx"), true)
    idxOut.write(Array[Byte](0, 0, 0, 1)); idxOut.close()
    // a concurrent reader floors the torn tail out already
    assert(FileReplayLog.endOffsets(root, topic) == Map(0 -> 2L))
    // a RESTARTED producer must truncate the tail before appending —
    // without that, its 8-byte entries land after the 4 torn bytes and
    // every subsequent offset is permanently misaligned
    FileReplayLog.append(root, topic, 0, "c", "three".getBytes(UTF_8))
    FileReplayLog.publish(root, topic)
    assert(new java.io.File(dir, "p0.idx").length % 8 == 0,
      "idx left misaligned after restart")
    assert(FileReplayLog.endOffsets(root, topic) == Map(0 -> 3L))
    val recs = FileReplayLog.read(root, topic, 0, 0L, 10L)
    assert(recs.map(r => new String(r.value, UTF_8)) ==
      Seq("one", "two", "three"),
      "torn idx tail misaligned the offset space")
  }

  test("chunk-bounded bulk read: every chunk shape (multi-record, " +
      "single-record, oversized-record fallback) returns byte-identical " +
      "records, orphan gaps included") {
    val root = tmp()
    val topic = "t"
    // varying sizes: tiny, ~100 B, one BIG record that exceeds small
    // chunk bounds, null key/value — plus a crash-orphan gap mid-range
    val values = Seq("a", "b" * 100, "BIG" * 200, "c", null, "d" * 50)
    values.zipWithIndex.foreach { case (v, i) =>
      FileReplayLog.append(root, topic, 0,
        if (i == 4) null else s"k$i",
        if (v == null) null else v.getBytes(UTF_8), i.toLong)
      if (i == 2) { // orphan bytes between records 2 and 3
        FileReplayLog.publish(root, topic)
        FileReplayLog.dropWriters(root, topic)
        val logFile = new java.io.File(new java.io.File(root, topic), "p0.log")
        val out = new java.io.FileOutputStream(logFile, true)
        out.write("ORPHAN-GAP".getBytes(UTF_8)); out.close()
      }
    }
    FileReplayLog.publish(root, topic)
    val expected = FileReplayLog.read(root, topic, 0, 0L, 10L)
    assert(expected.size == values.size)
    // bounds that exercise: 1 B (every record oversized → per-field
    // path), 40 B (mixed single/multi chunks), 200 B (multi-record
    // chunks with the BIG record oversized), 1 MB (one chunk)
    for (bound <- Seq(1L, 40L, 200L, 1L << 20)) {
      val got = FileReplayLog.read(root, topic, 0, 0L, 10L, bound)
      assert(got.map(_.offset) == expected.map(_.offset), s"bound=$bound")
      assert(got.map(_.timestampMs) == expected.map(_.timestampMs), s"bound=$bound")
      assert(got.map(_.key) == expected.map(_.key), s"bound=$bound")
      assert(got.map(r => Option(r.value).map(new String(_, UTF_8))) ==
        expected.map(r => Option(r.value).map(new String(_, UTF_8))),
        s"bound=$bound")
    }
    // sub-ranges cross chunk math too (from > 0, until < end)
    for (bound <- Seq(1L, 40L)) {
      val got = FileReplayLog.read(root, topic, 0, 1L, 5L, bound)
      assert(got.map(_.offset) == Seq(1L, 2L, 3L, 4L), s"bound=$bound")
      assert(got.map(r => Option(r.value).map(new String(_, UTF_8))) ==
        expected.slice(1, 5).map(r => Option(r.value).map(new String(_, UTF_8))),
        s"bound=$bound")
    }
  }

  test("DSv2 tail over root: admission cap bounds batches, checkpoint " +
      "restart resumes at the committed offset — no loss, no re-read") {
    val root = tmp()
    val topic = "t"
    val ckpt = tmp()
    (0 until 50).foreach(i =>
      FileReplayLog.append(root, topic, i % 2, s"k$i",
        s"v$i".getBytes(UTF_8), i.toLong))
    FileReplayLog.publish(root, topic)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
    val sizes = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    def drainOnce(): Unit = {
      val q = spark.readStream.format("graft-replaylog")
        .option("topic", topic).option("root", root)
        .option("maxOffsetsPerTrigger", "10")
        .load()
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = b.select("partition", "offset").collect()
          sizes.add(rows.length)
          rows.foreach(r => seen.add((r.getInt(0), r.getLong(1))))
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    drainOnce()
    import scala.jdk.CollectionConverters._
    assert(seen.asScala.toSet.size == 50, s"first life read ${seen.size}")
    assert(sizes.asScala.forall(_ <= 10), s"admission violated: ${sizes.asScala}")
    // append 10 more; the restarted query must read exactly those
    (50 until 60).foreach(i =>
      FileReplayLog.append(root, topic, i % 2, s"k$i",
        s"v$i".getBytes(UTF_8), i.toLong))
    FileReplayLog.publish(root, topic)
    val before = seen.size
    drainOnce()
    val all = seen.asScala.toSeq
    assert(all.size - before == 10,
      s"restart re-read or lost: ${all.size - before}")
    assert(all.toSet.size == 60, "duplicate (partition, offset) delivered")
    assert(all.groupBy(_._1).forall { case (_, xs) =>
      xs.map(_._2).sorted == (0L until xs.size.toLong) },
      "per-partition offsets not dense from 0")
  }
}
