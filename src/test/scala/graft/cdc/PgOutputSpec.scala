package graft.cdc

import graft.SparkSpec
import graft.cdc.PgOutput._
import java.nio.ByteBuffer

/** Binary pgoutput decode: relation registry, tuple markers (n/u/t/b),
  * transaction state, truncate fan-out, and a schema change mid-stream. */
class PgOutputSpec extends SparkSpec {

  private val relEvents = RelationMeta(42, "public", "events", "d", Seq(
    RelColumn("id", "int8", isKey = true),
    RelColumn("name", "text", isKey = false)))

  private def seqd(msgs: Array[Byte]*): Iterator[(Long, Array[Byte])] =
    msgs.zipWithIndex.map { case (m, i) => (i.toLong, m) }.iterator

  test("Relation → Insert → Update decodes against the registry") {
    val out = decodeIterator(seqd(
      encodeBegin(7L, 1700000000000000L, 11),
      encodeRelation(relEvents),
      encodeInsert(42, Seq(TText("1"), TText("alice"))),
      encodeUpdate(42, Some(Seq(TText("1"), TText("alice"))),
        Seq(TText("1"), TText("bob"))),
      encodeCommit(7L, 8L, 1700000000000000L))).toSeq
    assert(out.map(_.message) ==
      Seq("BEGIN", "RELATION", "INSERT", "UPDATE", "COMMIT"))
    val ins = out(2)
    assert(ins.change_table == "events" && ins.change_schema == "public")
    assert(ins.record == Map("id" -> "1", "name" -> "alice"))
    assert(ins.xid == 11 && ins.commit_timestamp == "2023-11-14T22:13:20.000000Z")
    val upd = out(3)
    assert(upd.record("name") == "bob" && upd.old_record("name") == "alice")
  }

  test("schema change mid-stream: a newer Relation overwrites the registry") {
    val relV2 = RelationMeta(42, "public", "events", "d", Seq(
      RelColumn("id", "int8", isKey = true),
      RelColumn("name", "text", isKey = false),
      RelColumn("age", "int4", isKey = false)))
    val out = decodeIterator(seqd(
      encodeRelation(relEvents),
      encodeInsert(42, Seq(TText("1"), TText("alice"))),
      encodeRelation(relV2), // ALTER TABLE ADD COLUMN mid-stream
      encodeInsert(42, Seq(TText("2"), TText("bob"), TText("33"))))).toSeq
    assert(out(1).record == Map("id" -> "1", "name" -> "alice"))
    assert(out(3).record == Map("id" -> "2", "name" -> "bob", "age" -> "33"))
  }

  test("unchanged-TOAST marker lands in unchanged_toast, not record") {
    val out = decodeIterator(seqd(
      encodeRelation(relEvents),
      encodeUpdate(42, None, Seq(TText("1"), TToast)))).toSeq
    val upd = out(1)
    assert(upd.record == Map("id" -> "1"))
    assert(upd.unchanged_toast == Seq("name"))
  }

  test("explicit SQL NULL is an entry with null value") {
    val out = decodeIterator(seqd(
      encodeRelation(relEvents),
      encodeInsert(42, Seq(TText("1"), TNull)))).toSeq
    assert(out(1).record == Map("id" -> "1", "name" -> null))
  }

  test("DELETE carries the key tuple as old_record") {
    val out = decodeIterator(seqd(
      encodeRelation(relEvents),
      encodeDelete(42, Seq(TText("1"), TNull)))).toSeq
    assert(out(1).message == "DELETE" && out(1).record == null)
    assert(out(1).old_record("id") == "1")
  }

  test("TRUNCATE fans out one record per truncated relation") {
    val relOther = RelationMeta(43, "public", "users", "d", Seq(
      RelColumn("id", "int8", isKey = true)))
    val out = decodeIterator(seqd(
      encodeRelation(relEvents),
      encodeRelation(relOther),
      encodeTruncate(Seq(42, 43)))).toSeq
    val tr = out.filter(_.message == "TRUNCATE")
    assert(tr.map(_.change_table) == Seq("events", "users"))
  }

  test("tuple for an unknown relation id decodes as UNSUPPORTED") {
    val out = decodeIterator(seqd(
      encodeInsert(99, Seq(TText("1"))))).toSeq
    assert(out.head.message == "UNSUPPORTED")
  }

  test("binary-format ('b') values decode typed: bool, int8, timestamp, uuid") {
    val relBin = RelationMeta(50, "public", "bin", "d", Seq(
      RelColumn("ok", "bool", isKey = false),
      RelColumn("n", "int8", isKey = false),
      RelColumn("at", "timestamp", isKey = false),
      RelColumn("u", "uuid", isKey = false)))
    def bval(data: Array[Byte]): Array[Byte] =
      Array('b'.toByte) ++ ByteBuffer.allocate(4).putInt(data.length).array() ++ data
    val tuple = ByteBuffer.allocate(2).putShort(4.toShort).array() ++
      bval(Array(1.toByte)) ++
      bval(ByteBuffer.allocate(8).putLong(123456789L).array()) ++
      bval(ByteBuffer.allocate(8).putLong(1700000000000000L - PgEpochMicros).array()) ++
      bval(ByteBuffer.allocate(16).putLong(0x1122334455667788L).putLong(0x99aabbccddeeff00L).array())
    val insert = Array('I'.toByte) ++
      ByteBuffer.allocate(4).putInt(50).array() ++ Array('N'.toByte) ++ tuple
    val out = decodeIterator(seqd(encodeRelation(relBin), insert)).toSeq
    val rec = out(1).record
    assert(rec("ok") == "true" && rec("n") == "123456789")
    assert(rec("at") == "2023-11-14T22:13:20.000000Z")
    assert(rec("u") == "11223344-5566-7788-99aa-bbccddeeff00")
  }

  test("DataFrame-level decode runs per partition with its own registry") {
    import spark.implicits._
    // two partitions, each with its own Relation preamble (as a real slot
    // re-sends Relation after reconnect) — registry is partition-local
    val msgs: Seq[(Int, Long, Array[Byte])] = Seq(
      (0, 0L, encodeRelation(relEvents)),
      (0, 1L, encodeInsert(42, Seq(TText("1"), TText("p0")))),
      (1, 0L, encodeRelation(relEvents)),
      (1, 1L, encodeInsert(42, Seq(TText("2"), TText("p1")))))
    val df = msgs.toDF("p", "seq", "msg").repartition(2, $"p")
    val decoded = PgOutput.decodeChanges(df, "msg", "seq")
    val names = decoded.filter(_.message == "INSERT")
      .collect().map(_.record("name")).sorted.toSeq
    assert(names == Seq("p0", "p1"))
  }

  test("v2 streamed transaction: chunks buffer, interleave, apply at commit") {
    val out = decodeIterator(seqd(
      // chunk 1 of streamed xid 77 (relation + one insert)
      encodeStreamStart(77),
      streamed(77, encodeRelation(relEvents)),
      streamed(77, encodeInsert(42, Seq(TText("1"), TText("big-a")))),
      encodeStreamStop(),
      // a small transaction commits BETWEEN the chunks
      encodeBegin(10L, 1700000000000000L, 90),
      encodeInsert(42, Seq(TText("2"), TText("small"))),
      encodeCommit(10L, 11L, 1700000000000000L),
      // chunk 2 of xid 77, then its commit
      encodeStreamStart(77, firstSegment = false),
      streamed(77, encodeInsert(42, Seq(TText("3"), TText("big-b")))),
      encodeStreamStop(),
      encodeStreamCommit(77, 20L, 21L, 1700009999000000L))).toSeq
    // the small txn's insert emits in place; the streamed changes emit
    // only at Stream Commit, in chunk order, re-stamped with the commit
    // lsn + timestamp and the stream's xid
    assert(out.map(_.message) == Seq(
      "BEGIN", "INSERT", "COMMIT",
      "RELATION", "INSERT", "INSERT", "COMMIT"))
    val small = out.find(c => c.message == "INSERT" && c.xid == 90).get
    assert(small.record("name") == "small")
    val big = out.filter(c => c.message == "INSERT" && c.xid == 77)
    assert(big.map(_.record("name")) == Seq("big-a", "big-b"),
      "chunk order preserved across Stream Stop/Start")
    assert(big.forall(_.lsn == 20L), "re-stamped with the commit lsn")
    assert(big.forall(_.commit_timestamp.startsWith("2023-11-15T")),
      "streamed rows carry the STREAM commit ts, not the small txn's")
  }

  test("v2 streamed abort discards the transaction; registry survives") {
    val out = decodeIterator(seqd(
      encodeStreamStart(88),
      streamed(88, encodeRelation(relEvents)),
      streamed(88, encodeInsert(42, Seq(TText("9"), TText("ghost")))),
      encodeStreamStop(),
      encodeStreamAbort(88, 88),
      // the relation learned inside the aborted stream still types
      // later messages (metadata is not transactional work)
      encodeBegin(30L, 1700000000000000L, 91),
      encodeInsert(42, Seq(TText("4"), TText("alive"))),
      encodeCommit(30L, 31L, 1700000000000000L))).toSeq
    assert(!out.exists(c => c.record != null && c.record.get("name").contains("ghost")),
      "aborted streamed changes never emit")
    assert(out.count(_.message == "STREAM_ABORT") == 1)
    val live = out.find(_.message == "INSERT").get
    assert(live.record("name") == "alive" && live.change_table == "events")
  }

  test("logical decoding message ('M') decodes prefix + content + lsn") {
    val out = decodeIterator(seqd(
      encodeBegin(7L, 1700000000000000L, 11),
      encodeLogicalMessage(transactional = true, lsn = 55L,
        prefix = "wal_event", content = "hello ✓".getBytes("UTF-8")),
      encodeCommit(7L, 8L, 1700000000000000L))).toSeq
    assert(out.map(_.message) == Seq("BEGIN", "MESSAGE", "COMMIT"))
    val m = out(1)
    assert(m.lsn == 55L, "a message carries its OWN lsn field")
    assert(m.record == Map("prefix" -> "wal_event",
      "content" -> "hello ✓", "transactional" -> "true"))
    assert(m.xid == 11, "transactional message belongs to the open txn")
  }

  test("'M' inside a streamed chunk buffers and applies at commit") {
    val out = decodeIterator(seqd(
      encodeStreamStart(77),
      streamed(77, encodeRelation(relEvents)),
      streamed(77, encodeLogicalMessage(transactional = true, lsn = 60L,
        prefix = "audit", content = "x".getBytes("UTF-8"))),
      streamed(77, encodeInsert(42, Seq(TText("1"), TText("a")))),
      encodeStreamStop(),
      encodeStreamCommit(77, 20L, 21L, 1700009999000000L))).toSeq
    assert(out.map(_.message) ==
      Seq("RELATION", "MESSAGE", "INSERT", "COMMIT"))
    val m = out(1)
    assert(m.xid == 77 && m.record("prefix") == "audit")
    assert(m.lsn == 20L,
      "buffered chunk messages re-stamp with the stream-commit lsn")
  }
}
