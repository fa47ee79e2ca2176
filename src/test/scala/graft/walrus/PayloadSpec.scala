package graft.walrus

import graft.SparkSpec
import graft.filters.FilterParser
import graft.model.Subscription
import org.apache.spark.sql.functions._

/** Payload shaping: per-group projection, TOAST fallback, and the in-band
  * error-row matrix (400 no-pk, 401 unauthorized, 413 oversize). */
class PayloadSpec extends SparkSpec {
  import spark.implicits._
  import PayloadSpec.Chg

  lazy val matched = {
    val changes = Seq(
      Chg(1, "INSERT", "small", "2024-01-01T00:00:00.000Z"),
      Chg(2, "UPDATE", "x" * 100, "2024-01-01T00:00:01.000Z")
    ).toDF().withColumnRenamed("payload", "details")
    Walrus.matchSubscriptions(changes, subs, changes.drop("change_type", "commit_timestamp").schema, "t")
  }

  lazy val subs = Seq(
    Subscription("sAuth", "public", "t", Nil, claimsRole = "authenticated"),
    Subscription("sAnon", "public", "t", Nil, claimsRole = "anon"))

  private def shaped(pk: Seq[String], maxBytes: Int = 1 << 20,
      denied: Set[String] = Set.empty) =
    Payload.shape(matched, subs, Seq("id", "details"), pk, maxBytes, denied)

  test("401: denied role gets error row, record suppressed, ids kept") {
    val rows = shaped(pk = Seq("id"), denied = Set("anon"))
      .select("claims_role", "record", "errors", "subscription_ids")
      .as[(String, String, Seq[String], Seq[String])].collect()
    val anon = rows.filter(_._1 == "anon")
    assert(anon.nonEmpty && anon.forall(r =>
      r._2 == null && r._3 == Seq(Payload.Err401) && r._4 == Seq("sAnon")))
    val auth = rows.filter(_._1 == "authenticated")
    assert(auth.forall(r => r._2 != null && r._3 == null))
  }

  test("400: table without pk errors every row") {
    val rows = shaped(pk = Nil)
      .select("record", "errors").as[(String, Seq[String])].collect()
    assert(rows.nonEmpty &&
      rows.forall(r => r._1 == null && r._2 == Seq(Payload.Err400)))
  }

  test("empty subscription set yields an empty, well-typed result") {
    val out = Payload.shape(matched, Nil, Seq("id", "details"), Seq("id"))
    assert(out.count() == 0)
    assert(out.columns.contains("subscription_ids"))
  }

  test("413: oversize record keeps only values ≤64 bytes, with error") {
    val rows = shaped(pk = Seq("id"), maxBytes = 60)
      .where(col("claims_role") === "authenticated")
      .select("id", "record", "errors").as[(Int, String, Seq[String])]
      .collect().sortBy(_._1)
    assert(rows(0)._2 != null && rows(0)._3 == null)       // small row ok
    // oversize row: record delivered, but the 100-byte value is dropped
    // (reference 20260626120000:604 keeps values with octet_length ≤ 64)
    assert(rows(1)._2 == """{"id":2}""" && rows(1)._3 == Seq(Payload.Err413))
  }

  test("record only for INSERT/UPDATE; DELETE carries old_record instead") {
    val changes = Seq(
      Chg(7, "DELETE", "gone", "2024-01-01T00:00:02.000Z")
    ).toDF().withColumnRenamed("payload", "details")
      .withColumn("old_id", col("id"))
      .withColumn("old_details", lit("prior"))
    val m = Walrus.matchSubscriptions(changes, subs,
      changes.drop("change_type", "commit_timestamp", "old_id", "old_details").schema, "t")
    val rows = Payload.shape(m, subs, Seq("id", "details"), Seq("id"))
      .select("record", "old_record").as[(String, String)].collect()
    assert(rows.nonEmpty && rows.forall(r =>
      r._1 == null && r._2 == """{"id":7,"details":"prior"}"""))
  }

  test("DELETE old_record is pk-only when RLS is enabled") {
    val changes = Seq(
      Chg(7, "DELETE", "gone", "2024-01-01T00:00:02.000Z")
    ).toDF().withColumnRenamed("payload", "details")
      .withColumn("old_id", col("id"))
      .withColumn("old_details", lit("prior"))
    val m = Walrus.matchSubscriptions(changes, subs,
      changes.drop("change_type", "commit_timestamp", "old_id", "old_details").schema, "t")
    val rows = Payload.shape(m, subs, Seq("id", "details"), Seq("id"),
        rlsEnabled = true)
      .select("old_record").as[String].collect()
    assert(rows.nonEmpty && rows.forall(_ == """{"id":7}"""))
  }
}

object PayloadSpec {
  case class Chg(id: Int, change_type: String, payload: String,
      commit_timestamp: String)
}
