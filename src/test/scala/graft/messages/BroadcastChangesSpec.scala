package graft.messages

import graft.SparkSpec
import graft.sources.ReplayLog
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.charset.StandardCharsets.UTF_8

/** The S7 bridge end-to-end: a change stream triggers
  * `broadcast_changes` → `send` (messages rows appended to the message
  * log), and a second, independent consumer streams the log back out as
  * broadcast frames — the reference's trigger → `realtime.messages` →
  * replication-connection loop
  * (migrations/20240919163303_add_payload_to_messages.ex:18-53,
  * replication_connection.ex:406-467). Asserts the no-double-encoding
  * rule (payload text splices VERBATIM into the frame), binary
  * passthrough (send_binary bytes survive bit-identically), the raise
  * path (invalid operation never becomes a message), and the loop's
  * validation order (oversize payloads reach the loop but are not
  * published). */
class BroadcastChangesSpec extends SparkSpec {
  import BroadcastChangesSpec._

  /** Serialize message rows into the log (the messages-table WAL) and
    * stream them back out through the DSv2 adapter — `inserted_at` rides
    * as epoch-micros so the round-trip is exact. */
  private def appendToLog(topic: String, msgs: DataFrame): Unit =
    msgs.select(to_json(struct(
        col("id"), col("payload"),
        base64(col("binary_payload")).as("binary_b64"),
        col("event"), col("topic"), col("private"), col("extension"),
        unix_micros(col("inserted_at")).as("inserted_us"))).as("j"))
      .collect().zipWithIndex.foreach { case (r, i) =>
        ReplayLog.append(topic, 0, i.toString, r.getString(0).getBytes(UTF_8))
      }

  private val logSchema = StructType(Seq(
    StructField("id", LongType), StructField("payload", StringType),
    StructField("binary_b64", StringType), StructField("event", StringType),
    StructField("topic", StringType), StructField("private", BooleanType),
    StructField("extension", StringType),
    StructField("inserted_us", LongType)))

  private def consumeLog(topic: String): DataFrame =
    spark.read.format("graft-replaylog").option("topic", topic).load()
      .select(from_json(col("value").cast("string"), logSchema).as("m"))
      .select(
        col("m.id").as("id"), col("m.payload").as("payload"),
        unbase64(col("m.binary_b64")).as("binary_payload"),
        col("m.event").as("event"), col("m.topic").as("topic"),
        col("m.private").as("private"), col("m.extension").as("extension"),
        timestamp_micros(col("m.inserted_us")).as("inserted_at"))

  test("insert → message log → stream → delivery: payload verbatim, " +
      "raise path drops, oversize validated in the loop") {
    import spark.implicits._
    val topic = "bc-e2e-" + System.nanoTime()
    val recJson = """{"k":"v","n":7}"""
    val big = "x" * 600 // > the 0-KB cap (500 B padding)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Chg](spark)
    input.addData(Seq(
      Chg(1L, "INSERT", recJson, null, "public", "t", "room1", 1000L),
      Chg(2L, "UPDATE", recJson, recJson, "public", "t", "room1", 2000L),
      Chg(3L, "DELETE", null, recJson, "public", "t", "room2", 3000L),
      Chg(4L, "TRUNCATE", null, null, "public", "t", "room1", 4000L),
      Chg(5L, "INSERT", "\"" + big + "\"", null, "public", "t", "room2", 5000L)))
    // the "trigger" side: every micro-batch shapes and appends — the
    // analog of realtime.send's INSERT INTO realtime.messages
    val q = input.toDF()
      .withColumn("inserted_at", timestamp_micros(col("insertedUs")))
      .drop("insertedUs")
      .withColumnRenamed("tableName", "table_name")
      .withColumnRenamed("tableSchema", "table_schema")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val bridged = BroadcastChanges.changesToMessages(
          batch, topicCol = col("topic_name"), eventCol = lit("change"))
        // the raise path: an invalid operation never becomes a message
        appendToLog(topic, bridged.where(col("error").isNull))
        ()
      }.start()
    try { q.processAllAvailable() } finally q.stop()

    // the independent consumer: replication-connection loop over the log
    val frames = BroadcastChanges.streamOut(
      consumeLog(topic), tenantId = "t0", maxPayloadKb = 0L)
    val byId = frames.collect().map(r => r.getAs[Long]("metadata_id") -> r).toMap

    assert(byId.keySet == Set(1L, 2L, 3L, 5L), "TRUNCATE row must be absent")
    val f1 = byId(1L)
    assert(f1.getAs[String]("status") == "delivered")
    assert(f1.getAs[String]("tenant_topic") == "t0-private:room1")
    assert(f1.getAs[String]("user_event") == "change")
    assert(f1.getAs[String]("encoding") == "json")
    // no-double-encoding: the record JSON appears VERBATIM in the body;
    // the trailing id is realtime.send's id-if-absent splice
    assert(f1.getAs[String]("payload_text") ==
      s"""{"old_record":null,"record":$recJson,"operation":"INSERT","table":"t","schema":"public","id":"1"}""")
    assert(byId(2L).getAs[String]("payload_text").contains(
      s""""old_record":$recJson,"record":$recJson,"operation":"UPDATE""""))
    assert(byId(3L).getAs[String]("payload_text").contains(
      s""""record":null,"operation":"DELETE""""))
    // loop-side size validation: the row IS in the log, but not published
    assert(byId(5L).getAs[String]("status") == "payload_size_exceeded")
    assert(byId(5L).getAs[String]("payload_text") == null)
    ReplayLog.delete(topic)
  }

  test("send_binary: bytes pass through bit-identical, encoding=binary, " +
      "null payload is the swallowed-warning drop") {
    import spark.implicits._
    val topic = "bc-bin-" + System.nanoTime()
    val payload = (0 until 32).map(_.toByte).toArray
    val rows = Seq(
      (10L, payload, "room9"),
      (11L, null: Array[Byte], "room9")) // warning path: dropped
      .toDF("doc_id", "body", "chan")
    val msgs = BroadcastChanges.sendBinary(rows,
      payloadCol = col("body"), eventCol = lit("bin"),
      topicCol = col("chan"), idCol = col("doc_id"),
      insertedAtCol = lit("2024-01-01 00:00:00").cast("timestamp"))
    assert(msgs.count() == 1, "null bytea insert is swallowed, not raised")
    appendToLog(topic, msgs)
    val out = BroadcastChanges.streamOut(
      consumeLog(topic), tenantId = "t0", maxPayloadKb = 1L).collect()
    assert(out.length == 1)
    val f = out.head
    assert(f.getAs[String]("status") == "delivered")
    assert(f.getAs[String]("encoding") == "binary")
    assert(f.getAs[Array[Byte]]("payload_binary").toSeq == payload.toSeq,
      "bytea must survive the log round-trip bit-identically")
    assert(f.getAs[String]("payload_text") == null)
    ReplayLog.delete(topic)
  }

  test("send: swallow-to-WARNING arm (…20260605120000_rename_broadcast_" +
      "send_warning.ex) — a failed insert becomes a WARNING side row, " +
      "the caller never sees an error") {
    import spark.implicits._
    val rows = Seq(
      (1L, """{"a":1}""", "roomW", null: String),
      (2L, """{"a":2}""", "roomW",
        "new row violates row-level security policy"),
      (3L, """{"a":3}""", "roomW", null: String))
      .toDF("rid", "body", "chan", "sqlerrm")
    val out = BroadcastChanges.send(rows,
      payloadCol = col("body"), eventCol = lit("msg"),
      topicCol = col("chan"), idCol = col("rid").cast("string"),
      insertedAtCol = lit("2024-01-01 00:00:00").cast("timestamp"),
      insertErrorCol = col("sqlerrm")).collect().sortBy(_.getString(0))
    // void return: every input produced exactly one row — no throw
    assert(out.length == 3, "the caller sees every send complete")
    val warned = out(1)
    assert(warned.getAs[String]("error") ==
      BroadcastChanges.SendWarningPrefix +
        "new row violates row-level security policy")
    assert(warned.getAs[String]("payload") == null,
      "the insert never happened — no payload on the warning row")
    // the inserted set is error IS NULL, splice applied as usual
    val inserted = out.filter(_.getAs[String]("error") == null)
    assert(inserted.length == 2)
    assert(inserted.forall(r =>
      r.getAs[String]("payload").endsWith(s""","id":"${r.getString(0)}"}""")))
  }

  test("binary_payload wins over payload (pick_payload, replication_" +
      "connection.ex:515-517) and frames as V2 user_broadcast with " +
      "enc byte 0") {
    import spark.implicits._
    import graft.api.V2Frames
    val bin = Array[Byte](0, -1, 127, -128, 42) // not valid UTF-8
    val both = Seq((7L, """{"shadow":true}""", "roomB"))
      .toDF("id", "payload", "topic")
      .select(col("id"), col("payload"),
        lit(bin).as("binary_payload"), lit("ev").as("event"),
        col("topic"), lit(true).as("private"),
        lit("broadcast").as("extension"),
        lit("2024-01-01 00:00:00").cast("timestamp").as("inserted_at"))
    val f = BroadcastChanges.streamOut(both, "t0", 1L).collect().head
    assert(f.getAs[String]("status") == "delivered")
    assert(f.getAs[String]("encoding") == "binary",
      "both set → binary wins")
    assert(f.getAs[String]("payload_text") == null,
      "the json payload is NOT what travels")
    assert(f.getAs[Array[Byte]]("payload_binary").toSeq == bin.toSeq)
    // the frame the serializer would emit: enc byte 0, payload verbatim
    val frame = V2Frames.encodeUserBroadcast(
      f.getAs[String]("tenant_topic"), f.getAs[String]("user_event"),
      Some(s"""{"id":"${f.getAs[Long]("metadata_id")}"}"""),
      payloadIsJson = false, f.getAs[Array[Byte]]("payload_binary"))
    assert(frame(0) == 4, "opcode user_broadcast")
    assert(frame(4) == 0, "enc byte 0 = raw binary")
    val dec = V2Frames.decode(frame)
    assert(!dec.payload_is_json)
    assert(dec.payload.toSeq == bin.toSeq)
    assert(dec.topic == "t0-private:roomB")
  }

  test("loop requires id/topic/event/private/inserted_at: first missing " +
      "field names the error, reference check order") {
    import spark.implicits._
    val base = Seq((1L, """{"a":1}""", "e", "top", true, 1000L))
      .toDF("id", "payload", "event", "topic", "private", "us")
      .select(col("id"), col("payload"),
        lit(null).cast("binary").as("binary_payload"),
        col("event"), col("topic"), col("private"),
        lit("broadcast").as("extension"),
        timestamp_micros(col("us")).as("inserted_at"))
    def statusWith(f: DataFrame => DataFrame): String =
      BroadcastChanges.streamOut(f(base), "t0", 1L)
        .collect().head.getAs[String]("status")
    assert(statusWith(identity) == "delivered")
    assert(statusWith(_.withColumn("inserted_at",
      lit(null).cast("timestamp"))) == "inserted_at_missing")
    assert(statusWith(_.withColumn("event",
      lit(null).cast("string"))) == "event_missing")
    assert(statusWith(_.withColumn("id",
      lit(null).cast("long"))) == "id_missing")
    assert(statusWith(_.withColumn("topic",
      lit(null).cast("string"))) == "topic_missing")
    assert(statusWith(_.withColumn("private",
      lit(null).cast("boolean"))) == "private_missing")
    assert(statusWith(_.withColumn("payload",
      lit(null).cast("string"))) == "payload_missing")
    // public channel: tenant_topic drops the -private marker
    val pub = BroadcastChanges.streamOut(
      base.withColumn("private", lit(false)), "t0", 1L).collect().head
    assert(pub.getAs[String]("tenant_topic") == "t0:top")
  }

  test("hostile identifiers: a quote/backslash in table or schema is " +
      "JSON-escaped like jsonb_build_object, never a malformed frame") {
    import spark.implicits._
    val changes = Seq(
      (1L, "INSERT", """{"k":"v"}""", null: String, "a\"b\\c", "s\nx", "r"))
      .toDF("id", "operation", "record", "old_record",
        "table_name", "table_schema", "topic_name")
      .withColumn("inserted_at", lit("2024-01-01 00:00:00").cast("timestamp"))
    val payload = BroadcastChanges.changesToMessages(changes,
        topicCol = col("topic_name"), eventCol = lit("change"))
      .select("payload").as[String].collect().head
    // byte-exact: the escaping the reference's jsonb_build_object applies
    // (plus send()'s generated-id splice at the tail)
    assert(payload ==
      """{"old_record":null,"record":{"k":"v"},"operation":"INSERT",""" +
        """"table":"a\"b\\c","schema":"s\nx","id":"1"}""")
    // and it PARSES — the round-trip recovers the raw identifiers
    val parsed = spark.range(1).select(
      from_json(lit(payload), org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("table",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("schema",
          org.apache.spark.sql.types.StringType)))).as("p"))
      .select("p.table", "p.schema").collect().head
    assert(parsed.getString(0) == "a\"b\\c")
    assert(parsed.getString(1) == "s\nx")
  }

  test("send: the generated id is spliced into payloads lacking an 'id' " +
      "key; key EXISTENCE is the test (explicit null id kept verbatim)") {
    import spark.implicits._
    val rows = Seq(
      (1L, """{"v":7}"""),               // no id key → spliced
      (2L, """{"id":"mine","v":8}"""),   // client id → verbatim
      (3L, """{"id":null,"v":9}"""),     // key EXISTS (null) → verbatim
      (4L, "{}"),                        // empty object → spliced
      (5L, null: String))                // null payload → untouched
      .toDF("rid", "body")
    val out = BroadcastChanges.send(rows, payloadCol = col("body"),
        eventCol = lit("e"), topicCol = lit("top"),
        idCol = concat(lit("gen-"), col("rid")),
        insertedAtCol = lit("2024-01-01 00:00:00").cast("timestamp"))
      .collect().map(r => r.getAs[String]("id") ->
        r.getAs[String]("payload")).toMap
    assert(out("gen-1") == """{"v":7,"id":"gen-1"}""")
    assert(out("gen-2") == """{"id":"mine","v":8}""")
    assert(out("gen-3") == """{"id":null,"v":9}""")
    assert(out("gen-4") == """{"id":"gen-4"}""")
    assert(out("gen-5") == null)
    // the spliced payload PARSES and recovers the id
    val parsed = spark.range(1).select(get_json_object(
      lit(out("gen-1")), "$.id")).head.getString(0)
    assert(parsed == "gen-1")
  }

  test("rate limit sits between the size check and delivered, matching " +
      "the reference's with-chain order") {
    import spark.implicits._
    val base = Seq(
      (1L, """{"a":1}""", false), // under limit → delivered
      (2L, """{"a":2}""", true),  // admission says over → rate_limited
      (3L, "\"" + "x" * 1600 + "\"", true)) // oversize wins over rate limit
      .toDF("id", "payload", "over_rate")
      .select(col("id"), col("payload"),
        lit(null).cast("binary").as("binary_payload"),
        lit("e").as("event"), lit("top").as("topic"),
        lit(true).as("private"), lit("broadcast").as("extension"),
        lit("2024-01-01 00:00:00").cast("timestamp").as("inserted_at"),
        col("over_rate"))
    val statuses = BroadcastChanges.streamOut(base, "t0", 1L,
        rateLimited = col("over_rate"))
      .collect().map(r => r.getAs[Long]("metadata_id") ->
        r.getAs[String]("status")).toMap
    assert(statuses == Map(1L -> "delivered", 2L -> "rate_limited",
      3L -> "payload_size_exceeded"))
  }
}

object BroadcastChangesSpec {
  /** Change row fed to the bridge (Encoder case class — companion-object
    * scoped per the repo's spec conventions). */
  final case class Chg(id: Long, operation: String, record: String,
      old_record: String, tableSchema: String, tableName: String,
      topic_name: String, insertedUs: Long)
}
