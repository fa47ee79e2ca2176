package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** wal2json format-version-2 parse — fixtures follow the wal2json v2
  * documented output shape with the reference's slot options (include-pk,
  * include-timestamp, include-type-oids; list_changes migration :42-56). */
class Wal2JsonSpec extends SparkSpec {
  import spark.implicits._

  private def decode(rows: (Long, String)*) =
    Wal2Json.decodeChanges(rows.toSeq.toDF("seq", "w2j"), "w2j", "seq")

  test("INSERT: typed values decode to their text rendering") {
    val json =
      """{"action":"I","schema":"public","table":"events",
        |"timestamp":"2021-11-05 17:20:53.270228+00",
        |"columns":[
        | {"name":"id","type":"int8","typeoid":20,"value":42},
        | {"name":"flag","type":"bool","typeoid":16,"value":true},
        | {"name":"note","type":"text","typeoid":25,"value":"hi there"},
        | {"name":"score","type":"float8","typeoid":701,"value":9.25},
        | {"name":"gone","type":"text","typeoid":25,"value":null}],
        |"pk":[{"name":"id","type":"int8"}]}""".stripMargin.replace("\n", "")
    val f = decode((7L, json)).collect().head
    assert(f.message == "INSERT")
    assert(f.change_schema == "public" && f.change_table == "events")
    assert(f.commit_timestamp == "2021-11-05T17:20:53.270228Z")
    assert(f.record == Map("id" -> "42", "flag" -> "true",
      "note" -> "hi there", "score" -> "9.25", "gone" -> null))
    assert(f.old_record == null, "INSERT has no identity")
    assert(f.unchanged_toast.isEmpty)
    assert(f.seq == 7L)
  }

  test("UPDATE: identity becomes old_record; absent TOAST key stays absent") {
    // wal2json omits unchanged TOAST columns from `columns` — the same
    // key-absence contract toastMerge consumes (old image carries it)
    val json =
      """{"action":"U","schema":"public","table":"t",
        |"timestamp":"2024-01-02 03:04:05.000001+00",
        |"columns":[{"name":"id","type":"int4","typeoid":23,"value":1},
        | {"name":"v","type":"text","typeoid":25,"value":"new"}],
        |"identity":[{"name":"id","type":"int4","typeoid":23,"value":1},
        | {"name":"v","type":"text","typeoid":25,"value":"old"},
        | {"name":"big","type":"text","typeoid":25,"value":"toasted-old"}],
        |"pk":[{"name":"id","type":"int4"}]}""".stripMargin.replace("\n", "")
    val f = decode((1L, json)).collect().head
    assert(f.message == "UPDATE")
    assert(!f.record.contains("big"), "unchanged TOAST is key-absent")
    assert(f.record == Map("id" -> "1", "v" -> "new"))
    assert(f.old_record == Map("id" -> "1", "v" -> "old",
      "big" -> "toasted-old"))
  }

  test("DELETE: identity only, record is null") {
    val json =
      """{"action":"D","schema":"s","table":"t",
        |"timestamp":"2024-01-02 03:04:05.5+00",
        |"identity":[{"name":"id","type":"int8","typeoid":20,"value":3}],
        |"pk":[{"name":"id","type":"int8"}]}""".stripMargin.replace("\n", "")
    val f = decode((1L, json)).collect().head
    assert(f.message == "DELETE" && f.record == null)
    assert(f.old_record == Map("id" -> "3"))
    assert(f.commit_timestamp == "2024-01-02T03:04:05.500000Z")
  }

  test("jsonb column values decode as raw JSON text") {
    val json =
      """{"action":"I","schema":"p","table":"t","timestamp":"2024-01-01 00:00:00+00",
        |"columns":[{"name":"doc","type":"jsonb","typeoid":3802,
        | "value":{"a":[1,2],"b":"x"}}]}""".stripMargin.replace("\n", "")
    val f = decode((1L, json)).collect().head
    assert(f.record("doc") == """{"a":[1,2],"b":"x"}""")
  }

  test("action mapping: T/B/C and unknown→ERROR like apply_rls's CASE") {
    val mk = (a: String) =>
      s"""{"action":"$a","schema":"s","table":"t","timestamp":"2024-01-01 00:00:00+00"}"""
    val got = decode((0L, mk("T")), (1L, mk("B")), (2L, mk("C")),
        (3L, mk("X")))
      .collect().sortBy(_.seq).map(_.message).toSeq
    assert(got == Seq("TRUNCATE", "BEGIN", "COMMIT", "ERROR"))
  }

  test("action M: logical messages shape like the pgoutput tag-M record") {
    val json =
      """{"action":"M","transactional":true,"prefix":"realtime",
        |"content":"{\"event\":\"go\"}",
        |"timestamp":"2024-01-01 00:00:00+00"}""".stripMargin.replace("\n", "")
    val m = decode((0L, json)).collect().head
    assert(m.message == "MESSAGE")
    assert(m.change_schema == null && m.change_table == null)
    assert(m.record == Map(
      "prefix" -> "realtime",
      "content" -> """{"event":"go"}""",
      "transactional" -> "true"))
    // a row change is unaffected by the new message fields (they parse
    // as nulls and the columns map wins)
    val ins =
      """{"action":"I","schema":"s","table":"t","timestamp":"2024-01-01 00:00:00+00",
        |"columns":[{"name":"a","type":"int8","typeoid":20,"value":1}]}"""
        .stripMargin.replace("\n", "")
    assert(decode((1L, ins)).collect().head.record == Map("a" -> "1"))
  }

  test("decodeRaw exposes pk column names and typeoids") {
    val json =
      """{"action":"I","schema":"s","table":"t","timestamp":"2024-01-01 00:00:00+00",
        |"columns":[{"name":"a","type":"int8","typeoid":20,"value":1},
        | {"name":"b","type":"text","typeoid":25,"value":"x"}],
        |"pk":[{"name":"a","type":"int8"}]}""".stripMargin.replace("\n", "")
    val raw = Wal2Json.decodeRaw(Seq(json).toDF("w2j"), "w2j")
    val row = raw.select(col("pk_columns"),
        col("wal.columns").getField("typeoid").as("oids")).collect().head
    assert(row.getSeq[String](0) == Seq("a"))
    assert(row.getSeq[Long](1) == Seq(20L, 25L))
  }

  test("malformed JSON decodes as an in-band ERROR row, never a crash") {
    val got = decode(
        (1L, "{ this is not json"),
        (2L, """{"action":"I","schema":"s","table":"t","timestamp":"2024-01-01 00:00:00+00","columns":[{"name":"a","type":"text","value":"ok"}]}"""))
      .collect().sortBy(_.seq)
    assert(got(0).message == "ERROR" && got(0).change_table == null &&
      got(0).record == null, "corrupt row is data, not an exception")
    assert(got(1).message == "INSERT" && got(1).record("a") == "ok",
      "a corrupt row does not poison its batch")
  }

  test("quoteWal2json escapes ONLY backslash, comma, dot, whitespace — " +
      "no quote stripping (live 20260528 semantics)") {
    def q(s: String, t: String): String = Seq(1).toDF("x")
      .select(Wal2Json.quoteWal2json(lit(s), lit(t)).as("q"))
      .as[String].head()
    // dots and spaces inside an identifier are escaped (the r13 verdict's
    // canonical divergence case)
    assert(q("public", "a.b c") == "public.a\\.b\\ c")
    // backslashes are escaped
    assert(q("s", "has\\slash") == "s.has\\\\slash")
    // quotes pass through untouched — neither stripped nor escaped
    assert(q("s", "has\"quote") == "s.has\"quote")
    assert(q("public", "\"my tbl\"") == "public.\"my\\ tbl\"")
    // commas cannot split the add-tables list
    assert(q("s", "a,b") == "s.a\\,b")
    // the plain-name no-op case
    assert(q("public", "orders") == "public.orders")
    // tabs/newlines are [:space:] too
    assert(q("s", "a\tb\nc") == "s.a\\\tb\\\nc")
  }

  test("timestamp normalization is session-timezone independent") {
    // date_format renders in spark.sql.session.timeZone — the formatter
    // must instead derive the text from the epoch-micros instant, so a
    // non-UTC session cannot produce local time falsely labeled Z
    val mk = (ts: String) =>
      s"""{"action":"I","schema":"s","table":"t","timestamp":"$ts","columns":[{"name":"a","type":"text","value":"x"}]}"""
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val got = decode(
          (1L, mk("2021-11-05 17:20:53.270228+00")),
          (2L, mk("2021-11-05 19:20:53.270228+02")), // same instant, +02 source
          (3L, mk("2024-01-01 00:30:00+05:30")))
        .collect().sortBy(_.seq).map(_.commit_timestamp).toSeq
      assert(got == Seq(
        "2021-11-05T17:20:53.270228Z",
        "2021-11-05T17:20:53.270228Z",
        "2023-12-31T19:00:00.000000Z"), s"got $got")
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("typeoid absent (wal2json ≤ 2.4) still parses; type name remains") {
    val json =
      """{"action":"I","schema":"s","table":"t","timestamp":"2024-01-01 00:00:00+00",
        |"columns":[{"name":"a","type":"integer","value":5}]}"""
        .stripMargin.replace("\n", "")
    val f = decode((1L, json)).collect().head
    assert(f.record("a") == "5")
  }
}
