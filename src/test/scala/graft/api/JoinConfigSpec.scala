package graft.api

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Pins the join-payload changeset semantics
  * (payloads/{join,config,broadcast,presence,flexible_boolean}.ex):
  * flexible booleans (strings AND booleans, numbers error), defaults,
  * replay integer casts, postgres_changes nil handling, presence-key
  * generation, and the embed-shape errors. */
class JoinConfigSpec extends SparkSpec {

  private def parse(payloads: String*): Seq[Row] = {
    val df = spark.createDataFrame(
      payloads.zipWithIndex.map { case (p, i) => (i.toLong, p) })
      .toDF("join_id", "payload")
    JoinConfig.parse(df, "payload")
      .orderBy("join_id")
      .select("valid", "private", "ack", "presence_enabled",
        "presence_key", "presence_key_generated", "replay_limit",
        "replay_since", "n_postgres_changes", "access_token")
      .collect().toSeq
  }

  test("flexible booleans: JSON bools and case-insensitive strings cast; " +
      "numbers and other strings LOG invalid but apply the default " +
      "(validation is log-only, realtime_channel.ex:62-71)") {
    val rows = parse(
      """{"config": {"private": true, "broadcast": {"ack": "True"}}}""",
      """{"config": {"private": "FALSE"}}""",
      """{"config": {"private": 1}}""",
      """{"config": {"private": "yes"}}""")
    assert(rows(0).getBoolean(0) && rows(0).getBoolean(1)
      && rows(0).getBoolean(2))
    assert(rows(1).getBoolean(0) && !rows(1).getBoolean(1))
    // invalid private: flagged for the log, but the join proceeds PUBLIC
    assert(!rows(2).getBoolean(0) && !rows(2).getBoolean(1))
    assert(!rows(3).getBoolean(0) && !rows(3).getBoolean(1))
  }

  test("defaults: absent config is a valid join with everything false, " +
      "replay limit 10 / since 0, zero changes, key generated") {
    val r = parse("""{"access_token": "tok"}""").head
    assert(r.getBoolean(0) && !r.getBoolean(1) && !r.getBoolean(2)
      && !r.getBoolean(3))
    assert(r.isNullAt(4) && r.getBoolean(5))
    assert(r.getInt(6) == 10 && r.getLong(7) == 0L && r.getInt(8) == 0)
    assert(r.getString(9) == "tok")
  }

  test("replay: integer-shaped strings cast, junk rejects; presence key " +
      "nil/empty generates, non-empty passes through") {
    val rows = parse(
      """{"config": {"broadcast": {"replay": {"limit": "7", "since": 3}},""" +
        """ "presence": {"key": ""}}}""",
      """{"config": {"broadcast": {"replay": {"limit": "abc"}}}}""",
      """{"config": {"presence": {"key": "door-1", "enabled": "true"}}}""")
    assert(rows(0).getBoolean(0) && rows(0).getInt(6) == 7
      && rows(0).getLong(7) == 3L)
    assert(rows(0).isNullAt(4) && rows(0).getBoolean(5))
    // junk limit: logged invalid, the join replays the DEFAULT 10
    assert(!rows(1).getBoolean(0) && rows(1).getInt(6) == 10)
    assert(rows(2).getString(4) == "door-1" && !rows(2).getBoolean(5)
      && rows(2).getBoolean(3))
  }

  test("postgres_changes: null means [], nil entries are filtered not " +
      "errors; non-array / non-map embeds log invalid and default") {
    val rows = parse(
      """{"config": {"postgres_changes": [{"event": "INSERT"}, null]}}""",
      """{"config": {"postgres_changes": null}}""",
      """{"config": {"postgres_changes": "x"}}""",
      """{"config": "nope"}""",
      """{"config": {"broadcast": 5, "private": true}}""")
    assert(rows(0).getBoolean(0) && rows(0).getInt(8) == 1)
    assert(rows(1).getBoolean(0) && rows(1).getInt(8) == 0)
    assert(!rows(2).getBoolean(0) && rows(2).getInt(8) == 0)
    // non-map config: the whole embed defaults — joins public, key gen
    assert(!rows(3).getBoolean(0) && !rows(3).getBoolean(1)
      && rows(3).getBoolean(5) && rows(3).getInt(6) == 10)
    // non-map broadcast defaults ITS fields; sibling private still casts
    assert(!rows(4).getBoolean(0) && !rows(4).getBoolean(2)
      && rows(4).getBoolean(1))
  }

  test("flexible_boolean SQL function matches the column twin") {
    GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT flexible_boolean('TRUE'), flexible_boolean('false'), " +
        "flexible_boolean('1'), flexible_boolean(NULL)").head
    assert(got.getBoolean(0) && !got.getBoolean(1)
      && got.isNullAt(2) && got.isNullAt(3))
  }
}
