package graft.cdc

import graft.SparkSpec
import graft.cdc.PgOutput.WalChange

class MirrorSpec extends SparkSpec {
  import spark.implicits._

  private def ch(seq: Long, msg: String, rec: Map[String, String],
      old: Map[String, String] = null): WalChange =
    WalChange(seq, 0L, 0L, msg, "public", "t",
      "2024-01-01T00:00:00.000000Z", rec, old, Nil)

  test("mirror keeps the last write per pk; trailing DELETE removes") {
    val changes = Seq(
      ch(1, "INSERT", Map("id" -> "1", "v" -> "a")),
      ch(2, "UPDATE", Map("id" -> "1", "v" -> "b")),   // k1 final = b
      ch(3, "INSERT", Map("id" -> "2", "v" -> "x")),
      ch(4, "DELETE", null, Map("id" -> "2")),          // k2 gone
      ch(5, "INSERT", Map("id" -> "3", "v" -> "y")),
      ch(6, "DELETE", null, Map("id" -> "3")),
      ch(7, "INSERT", Map("id" -> "3", "v" -> "z"))     // re-insert after delete
    ).toDF()
    val got = Mirror.fromWal(changes, "id")
      .select("id", "seq").as[(String, Long)].collect().toMap
    assert(got == Map("1" -> 2L, "3" -> 7L), s"got $got")
    val v = Mirror.fromWal(changes, "id")
      .select("id", "record").as[(String, Map[String, String])]
      .collect().toMap
    assert(v("1")("v") == "b" && v("3")("v") == "z")
  }

  test("DELETE pk is read from old_record (record is null)") {
    val changes = Seq(
      ch(1, "INSERT", Map("id" -> "9", "v" -> "a")),
      ch(2, "DELETE", null, Map("id" -> "9"))).toDF()
    assert(Mirror.fromWal(changes, "id").count() == 0)
  }

  test("scd2: versions chain, DELETE closes without opening, current flagged") {
    def chT(seq: Long, msg: String, ts: String, rec: Map[String, String],
        old: Map[String, String] = null): WalChange =
      WalChange(seq, 0L, 0L, msg, "public", "t", ts, rec, old, Nil)
    val changes = Seq(
      chT(1, "INSERT", "t1", Map("id" -> "1", "v" -> "a")),
      chT(2, "UPDATE", "t2", Map("id" -> "1", "v" -> "b")),
      chT(3, "INSERT", "t3", Map("id" -> "2", "v" -> "x")),
      chT(4, "DELETE", "t4", null, Map("id" -> "2"))).toDF()
    val got = Mirror.scd2FromWal(changes, "id")
      .select("id", "seq", "valid_from", "valid_to", "is_current")
      .as[(String, Long, String, String, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, Option(r._4), r._5))).toMap
    assert(got(("1", 1L)) == (("t1", Some("t2"), false)), "closed by update")
    assert(got(("1", 2L)) == (("t2", None, true)), "open version is current")
    assert(got(("2", 3L)) == (("t3", Some("t4"), false)),
      "DELETE closes the version but emits none itself")
    assert(got.size == 3)
  }

  test("TRUNCATE empties the mirror; later writes re-populate") {
    val changes = Seq(
      ch(1, "INSERT", Map("id" -> "1", "v" -> "a")),
      ch(2, "INSERT", Map("id" -> "2", "v" -> "x")),
      ch(3, "TRUNCATE", null),                        // table emptied
      ch(4, "INSERT", Map("id" -> "2", "v" -> "y"))   // re-born after
    ).toDF()
    val got = Mirror.fromWal(changes, "id")
      .select("id", "seq").as[(String, Long)].collect().toMap
    assert(got == Map("2" -> 4L), s"rows before TRUNCATE must not survive: $got")
  }

  test("TRUNCATE-free stream is unaffected by the truncate guard") {
    val changes = Seq(
      ch(1, "INSERT", Map("id" -> "1", "v" -> "a")),
      ch(2, "UPDATE", Map("id" -> "1", "v" -> "b"))).toDF()
    assert(Mirror.fromWal(changes, "id").count() == 1)
  }

  test("scd2: TRUNCATE closes open versions at its commit timestamp") {
    def chT(seq: Long, msg: String, ts: String, rec: Map[String, String],
        old: Map[String, String] = null): WalChange =
      WalChange(seq, 0L, 0L, msg, "public", "t", ts, rec, old, Nil)
    val changes = Seq(
      chT(1, "INSERT", "t1", Map("id" -> "1", "v" -> "a")),
      chT(2, "UPDATE", "t2", Map("id" -> "1", "v" -> "b")), // open at trunc
      chT(3, "INSERT", "t2", Map("id" -> "2", "v" -> "x")), // open at trunc
      chT(4, "TRUNCATE", "t3", null),
      chT(5, "INSERT", "t4", Map("id" -> "2", "v" -> "y"))) // reopens after
    val got = Mirror.scd2FromWal(changes.toDF(), "id")
      .select("id", "seq", "valid_from", "valid_to", "is_current")
      .as[(String, Long, String, String, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, Option(r._4), r._5))).toMap
    assert(got(("1", 1L)) == (("t1", Some("t2"), false)), "closed by update")
    assert(got(("1", 2L)) == (("t2", Some("t3"), false)),
      "open version closed by TRUNCATE, not current")
    assert(got(("2", 3L)) == (("t2", Some("t3"), false)),
      "TRUNCATE beats the key's own later re-insert as the closer")
    assert(got(("2", 5L)) == (("t4", None, true)), "post-truncate version open")
    assert(got.size == 4)
  }

  test("streamUpserts: keyed mirror across micro-batches, replay-immune") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[WalChange](spark)
    val q = Mirror.streamUpserts(input.toDF(), "id")
      .writeStream.format("memory").queryName("mirror_out")
      .outputMode("update").start()
    try {
      input.addData(
        ch(1, "INSERT", Map("id" -> "1", "v" -> "a")),
        ch(2, "UPDATE", Map("id" -> "1", "v" -> "b")),
        ch(3, "INSERT", Map("id" -> "2", "v" -> "x")))
      q.processAllAvailable()
      val b1 = spark.table("mirror_out")
        .select("pk", "op", "seq").as[(String, String, Long)].collect().toSet
      assert(b1 == Set(("1", "UPSERT", 2L), ("2", "UPSERT", 3L)),
        "one row per touched key, folded in-batch")
      // batch 2: delete k2, replay k1's seq 2 (must be ignored)
      input.addData(
        ch(4, "DELETE", null, Map("id" -> "2")),
        ch(2, "UPDATE", Map("id" -> "1", "v" -> "stale")))
      q.processAllAvailable()
      val all = spark.table("mirror_out")
        .select("pk", "op", "seq").as[(String, String, Long)].collect()
      assert(all.count(_._1 == "2") == 2 &&
        all.contains(("2", "DELETE", 4L)), "tombstone emitted for k2")
      assert(all.count(_._1 == "1") == 1, "replayed seq produced no row")
      // batch 3: re-insert after delete
      input.addData(ch(5, "INSERT", Map("id" -> "2", "v" -> "z")))
      q.processAllAvailable()
      val last = spark.table("mirror_out")
        .select("pk", "op", "seq").as[(String, String, Long)].collect()
      assert(last.contains(("2", "UPSERT", 5L)))
    } finally q.stop()
  }

  test("snapshotDiff classifies INSERT/UPDATE/DELETE; unchanged drop") {
    val changes = Seq(
      ch(1, "INSERT", Map("id" -> "1", "v" -> "a")),   // unchanged later
      ch(2, "INSERT", Map("id" -> "2", "v" -> "x")),   // updated at 6
      ch(3, "INSERT", Map("id" -> "3", "v" -> "y")),   // deleted at 7
      ch(6, "UPDATE", Map("id" -> "2", "v" -> "x2")),
      ch(7, "DELETE", null, Map("id" -> "3")),
      ch(8, "INSERT", Map("id" -> "4", "v" -> "new"))  // inserted after cut
    ).toDF()
    val oldM = Mirror.fromWal(changes.where($"seq" < 5), "id")
    val newM = Mirror.fromWal(changes, "id")
    val got = Mirror.snapshotDiff(oldM, newM, "id")
      .select("id", "change").as[(String, String)].collect().toMap
    assert(got == Map("2" -> "UPDATE", "3" -> "DELETE", "4" -> "INSERT"),
      "key 1 is unchanged and absent from the diff")
  }

  test("wal2json stream → streaming mirror, end to end") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def row(seq: Long, action: String, id: String, v: String): (Long, String) = {
      val cols = s"""[{"name":"id","type":"text","typeoid":25,"value":"$id"},
        |{"name":"v","type":"text","typeoid":25,"value":"$v"}]""".stripMargin
        .replace("\n", "")
      val body = action match {
        case "D" => s""""identity":$cols"""
        case _   => s""""columns":$cols"""
      }
      (seq, s"""{"action":"$action","schema":"public","table":"t",
        |"timestamp":"2024-01-01 00:00:00+00",$body}""".stripMargin
        .replace("\n", ""))
    }
    val input = MemoryStream[(Long, String)](spark)
    val decoded = Wal2Json.decodeChanges(
      input.toDF().toDF("seq", "json"), "json", "seq").toDF()
    val q = Mirror.streamUpserts(decoded, "id")
      .writeStream.format("memory").queryName("w2j_mirror")
      .outputMode("update").start()
    try {
      input.addData(row(1, "I", "k1", "a"), row(2, "U", "k1", "b"))
      q.processAllAvailable()
      input.addData(row(3, "D", "k1", "b"))
      q.processAllAvailable()
      val got = spark.table("w2j_mirror")
        .select("pk", "op", "seq").as[(String, String, Long)].collect().toSet
      assert(got == Set(("k1", "UPSERT", 2L), ("k1", "DELETE", 3L)),
        "decoded wal2json rows drive the keyed mirror state")
    } finally q.stop()
  }

  test("incremental re-compaction equals full compaction") {
    // a checkpointed mirror re-enters the same path as INSERT-shaped
    // changes at its materialization seq — compacting (mirror(half1) ∪
    // half2) must equal compacting the full history
    val half1 = Seq(
      ch(1, "INSERT", Map("id" -> "1", "v" -> "a")),
      ch(2, "INSERT", Map("id" -> "2", "v" -> "x")),
      ch(3, "DELETE", null, Map("id" -> "2")),       // dead before checkpoint
      ch(4, "INSERT", Map("id" -> "3", "v" -> "m")))
    val half2 = Seq(
      ch(5, "UPDATE", Map("id" -> "1", "v" -> "b")), // survives as update
      ch(6, "DELETE", null, Map("id" -> "3")),       // dies after checkpoint
      ch(7, "INSERT", Map("id" -> "2", "v" -> "y"))) // re-born after checkpoint
    def compact(df: org.apache.spark.sql.DataFrame) =
      Mirror.fromWal(df, "id")
    val full = compact((half1 ++ half2).toDF())
      .select("id", "seq", "record")
      .as[(String, Long, Map[String, String])].collect().toSet
    val checkpoint = compact(half1.toDF())
      .as[(String, Long, Map[String, String], String)].collect().map {
        case (id, seq, rec, ts) => ch(seq, "INSERT", rec)
      }
    val incr = compact((checkpoint.toSeq ++ half2).toDF())
      .select("id", "seq", "record")
      .as[(String, Long, Map[String, String])].collect().toSet
    assert(incr == full, s"$incr vs $full")
  }

  test("snapshotDiffAtPrefix ≡ snapshotDiff of two fromWal mirrors") {
    import org.apache.spark.sql.functions.col
    // deletes, re-inserts, a TRUNCATE inside the prefix, and changes on
    // both sides of the boundary — every per-side presence rule fires
    val changes = Seq(
      ch(1, "INSERT", Map("id" -> "1", "v" -> "a")),  // k1 old head until 6
      ch(2, "INSERT", Map("id" -> "2", "v" -> "x")),
      ch(3, "TRUNCATE", null),                         // wipes 1,2 in OLD
      ch(4, "INSERT", Map("id" -> "2", "v" -> "y")),  // k2 back, old+new
      ch(5, "INSERT", Map("id" -> "3", "v" -> "p")),  // k3 old only…
      ch(6, "UPDATE", Map("id" -> "1", "v" -> "b")),  // k1 new-only head
      ch(7, "DELETE", null, Map("id" -> "3")),         // …k3 deleted in new
      ch(8, "INSERT", Map("id" -> "4", "v" -> "q")),  // k4 new only
      ch(9, "UPDATE", Map("id" -> "2", "v" -> "z"))   // k2 moved seq
    ).toDF()
    val prefix = col("seq") < 6
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("id", "old_seq", "new_seq", "change")
      .as[(String, Option[Long], Option[Long], String)].collect().toSet
    val composed = rows(Mirror.snapshotDiff(
      Mirror.fromWal(changes.where(prefix), "id"),
      Mirror.fromWal(changes, "id"), "id"))
    val fused = rows(Mirror.snapshotDiffAtPrefix(changes, "id", prefix))
    assert(fused == composed, s"fused $fused vs composed $composed")
    // sanity on content, not just agreement
    assert(fused == Set(
      ("1", None, Some(6L), "INSERT"),       // old head seq 1 ≤ trunc 3
      ("2", Some(4L), Some(9L), "UPDATE"),
      ("3", Some(5L), None, "DELETE"),
      ("4", None, Some(8L), "INSERT")), s"got $fused")
  }
}
