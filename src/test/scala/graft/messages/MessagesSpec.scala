package graft.messages

import graft.SparkSpec
import java.sql.Timestamp

class MessagesSpec extends SparkSpec {
  import spark.implicits._
  import MessagesSpec.Msg

  private def t(s: String) = Timestamp.valueOf(s)

  lazy val msgs = Seq(
    Msg(1, "room1", "p1", true, "broadcast", t("2024-01-01 10:00:00")),
    Msg(2, "room1", "p2", true, "broadcast", t("2024-01-01 10:00:01")),
    Msg(3, "room1", "p3", false, "broadcast", t("2024-01-01 10:00:02")), // public → excluded
    Msg(4, "room1", "p4", true, "presence", t("2024-01-01 10:00:03")),   // wrong extension
    Msg(5, "room1", "p5", true, "broadcast", t("2024-01-01 09:00:00")),  // before since
    Msg(6, "room1", "p6", true, "broadcast", t("2024-01-01 11:30:00")),  // after now+1min
    Msg(7, "room2", "p7", true, "broadcast", t("2024-01-01 10:00:00"))
  ).toDF().withColumnRenamed("insertedAt", "inserted_at").withColumnRenamed("priv", "private")

  test("replay filters private/broadcast/topic/time and orders chronologically") {
    val got = Messages.replay(msgs, "room1",
      t("2024-01-01 09:30:00"), t("2024-01-01 10:30:00"), 10)
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(1, 2))
  }

  test("replay caps at the hard limit and keeps newest") {
    val many = (1 to 40).map(i =>
      Msg(i.toLong, "r", s"p$i", true, "broadcast", t(f"2024-01-01 10:${i % 60}%02d:00")))
      .toDF().withColumnRenamed("insertedAt", "inserted_at").withColumnRenamed("priv", "private")
    val got = Messages.replay(many, "r",
      t("2024-01-01 00:00:00"), t("2024-01-02 00:00:00"), 99)
      .count()
    assert(got == Messages.ReplayHardLimit)
  }

  test("per-topic replay ranks within topic") {
    val got = Messages.replayPerTopic(msgs,
      t("2024-01-01 09:30:00"), t("2024-01-01 10:30:00"), 1)
      .select("id").as[Long].collect().toSet
    assert(got == Set(2, 7)) // newest qualifying per topic
  }

  test("dedup drops already-replayed ids") {
    val replayed = Seq((1L, "x")).toDF("id", "junk")
    val got = Messages.dedupAgainstReplayed(msgs, replayed)
      .select("id").as[Long].collect().toSet
    assert(!got.contains(1L) && got.contains(2L))
  }

  test("partitioned write produces daily partitions and prunes on read") {
    val dir = java.nio.file.Files.createTempDirectory("msglog").toString
    val two = Seq(
      Msg(1, "r", "a", true, "broadcast", t("2024-01-01 10:00:00")),
      Msg(2, "r", "b", true, "broadcast", t("2024-01-02 10:00:00"))
    ).toDF().withColumnRenamed("insertedAt", "inserted_at").withColumnRenamed("priv", "private")
    Messages.write(two, dir)
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("inserted_date=2024-01-01", "inserted_date=2024-01-02"))
    val pruned = spark.read.parquet(dir)
      .where(org.apache.spark.sql.functions.col("inserted_date") === "2024-01-02")
    assert(pruned.count() == 1)
    // partition filter must reach the scan (pruning, not post-filter)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || pruned.inputFiles.length == 1)
  }

  test("retention keeps only the last 72h") {
    val got = Messages.retained(msgs, t("2024-01-04 10:00:01"))
      .select("id").as[Long].collect().toSet
    assert(got == Set(2, 3, 4, 6)) // 10:00:01 and later survive the -72h cutoff
  }

  test("dropExpired deletes only fully-expired day partitions") {
    val dir = java.nio.file.Files.createTempDirectory("msgdrop").toString
    val three = Seq(
      Msg(1, "r", "a", true, "broadcast", t("2024-01-01 10:00:00")),
      Msg(2, "r", "b", true, "broadcast", t("2024-01-02 18:00:00")),
      Msg(3, "r", "c", true, "broadcast", t("2024-01-05 09:00:00"))
    ).toDF().withColumnRenamed("insertedAt", "inserted_at")
      .withColumnRenamed("priv", "private")
    Messages.write(three, dir)
    // now = Jan 5 12:00 → cutoff instant Jan 2 12:00 → only the Jan 1
    // partition lies entirely before the cutoff; Jan 2 still holds the
    // live 18:00 row and must survive as a partition
    val dropped = Messages.dropExpired(spark, dir, t("2024-01-05 12:00:00"))
    assert(dropped == Seq("inserted_date=2024-01-01"))
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).sorted
    assert(dirs.toSeq ==
      Seq("inserted_date=2024-01-02", "inserted_date=2024-01-05"))
    // surviving rows still filter row-level through `retained`
    val live = Messages.retained(
        spark.read.parquet(dir).drop("inserted_date"),
        t("2024-01-05 12:00:00"))
      .select("id").as[Long].collect().toSet
    assert(live == Set(2, 3))
    // idempotent: a second run drops nothing
    assert(Messages.dropExpired(spark, dir, t("2024-01-05 12:00:00")).isEmpty)
  }

  test("replay clamp is the reference max(min(l,25),1): zero and negative " +
      "limits still replay ONE message") {
    val one = Messages.replay(msgs, "room1",
      t("2024-01-01 09:30:00"), t("2024-01-01 10:30:00"), 0)
      .select("id").as[Long].collect().toSeq
    assert(one == Seq(2)) // the newest qualifying, exactly one
    assert(Messages.replay(msgs, "room1",
      t("2024-01-01 09:30:00"), t("2024-01-01 10:30:00"), -5).count() == 1)
  }

  test("replayOnJoin: arm order (unauthorized before channel check), " +
      "non-map replay is empty-ok, raw-param defaults and clamps, " +
      "empty-ok joins still emit one row") {
    val joins = Seq(
      // valid: absent limit defaults 25 (raw-path, NOT the changeset 10)
      (1L, "room1", true, true, true, true, Some("0"), None),
      // read=false beats everything — even the public-channel arm
      (2L, "room1", false, false, true, true, Some("0"), None),
      // public + replay (read ok) → invalid_replay_channel
      (3L, "room1", false, true, true, true, Some("0"), None),
      // non-map replay on private → silently ok with EMPTY replay
      (4L, "room1", true, true, true, false, None, None),
      // since absent → invalid_replay_params (no default for since)
      (5L, "room1", true, true, true, true, None, None),
      // limit junk → invalid_replay_params
      (6L, "room1", true, true, true, true, Some("0"), Some("abc")),
      // limit 0 clamps to 1 → exactly the newest message
      (7L, "room1", true, true, true, true, Some("0"), Some("0")),
      // no replay requested → ok empty
      (8L, "room1", true, true, false, false, None, None),
      // valid params, topic with no qualifying rows → ok, one null row
      (9L, "nowhere", true, true, true, true, Some("0"), None))
      .toDF("join_id", "topic", "private", "read_policy",
        "replay_requested", "replay_is_map", "since_raw", "limit_raw")
    val out = Messages.replayOnJoin(joins, msgs,
        t("2024-01-01 10:30:00"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
    val byJoin = out.groupBy(_._1)
    assert(byJoin(1L).map(_._3).toSet == Set(1L, 2L, 5L)) // all qualifying
    assert(byJoin(2L).toSeq == Seq((2L, "unauthorized", -1L)))
    assert(byJoin(3L).toSeq == Seq((3L, "invalid_replay_channel", -1L)))
    assert(byJoin(4L).toSeq == Seq((4L, "ok", -1L)))
    assert(byJoin(5L).toSeq == Seq((5L, "invalid_replay_params", -1L)))
    assert(byJoin(6L).toSeq == Seq((6L, "invalid_replay_params", -1L)))
    assert(byJoin(7L).map(_._3).toSeq == Seq(2L)) // clamped to newest 1
    assert(byJoin(8L).toSeq == Seq((8L, "ok", -1L)))
    assert(byJoin(9L).toSeq == Seq((9L, "ok", -1L)))
  }
}

object MessagesSpec {
  case class Msg(id: Long, topic: String, payload: String, priv: Boolean,
      extension: String, insertedAt: Timestamp)
}
