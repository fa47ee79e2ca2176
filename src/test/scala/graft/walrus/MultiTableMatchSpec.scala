package graft.walrus

import graft.SparkSpec
import graft.cdc.PgOutput
import graft.cdc.PgOutput.{RelColumn, RelationMeta, TText}
import graft.filters.FilterParser
import graft.model.Subscription
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass multi-table routing over the generic decoded-WAL shape,
  * including the decode → match composition. */
class MultiTableMatchSpec extends SparkSpec {
  import spark.implicits._

  private def f(dsl: String) = FilterParser.parse(dsl).toOption.get

  private val registry = Map(
    ("public", "orders") -> StructType(Seq(
      StructField("id", LongType), StructField("amount", DoubleType))),
    ("public", "users") -> StructType(Seq(
      StructField("id", LongType), StructField("name", StringType))))

  private val subs = Seq(
    Subscription("sOrders", "public", "orders", f("amount=gt.100")),
    Subscription("sUsers", "public", "users", f("name=eq.ada")),
    Subscription("sAll", "public", "*", Nil))

  private def chg(tbl: String, tpe: String, rec: (String, String)*) =
    ("public", tbl, tpe, rec.toMap)

  test("routes two tables + a wildcard subscription in one battery pass") {
    val stream = Seq(
      chg("orders", "INSERT", "id" -> "1", "amount" -> "250.0"),
      chg("orders", "INSERT", "id" -> "2", "amount" -> "50.0"),
      chg("users", "UPDATE", "id" -> "3", "name" -> "ada"),
      chg("users", "INSERT", "id" -> "4", "name" -> "bob"),
      chg("unregistered", "INSERT", "id" -> "5")
    ).toDF("change_schema", "change_table", "change_type", "record")
    val out = MultiTableMatch.matchSubscriptions(stream, registry, subs)
      .select(element_at($"record", "id").as("id"), $"subscription_ids")
      .as[(String, Seq[String])].collect().toMap
    assert(out("1") == Seq("sAll", "sOrders"))
    assert(out("2") == Seq("sAll"))
    assert(out("3") == Seq("sAll", "sUsers"))
    assert(out("4") == Seq("sAll"))
    assert(out("5") == Seq()) // unregistered table: fail closed
  }

  test("filter values are compared with the table's column types") {
    // "90.0" < "250.0" lexically but 90.0 < 250.0 numerically — a string
    // compare would invert this filter
    val stream = Seq(chg("orders", "INSERT", "id" -> "1", "amount" -> "90.0"))
      .toDF("change_schema", "change_table", "change_type", "record")
    val out = MultiTableMatch.matchSubscriptions(stream, registry,
        Seq(Subscription("s", "public", "orders", f("amount=lt.250"))))
      .select($"subscription_ids").as[Seq[String]].head()
    assert(out == Seq("s"))
  }

  test("TRUNCATE routes to '*'-action subscribers of that table only") {
    val stream = Seq(
      ("public", "orders", "TRUNCATE", Map.empty[String, String]))
      .toDF("change_schema", "change_table", "change_type", "record")
    val out = MultiTableMatch.matchSubscriptions(stream, registry, subs ++ Seq(
        Subscription("sIns", "public", "orders", Nil, actionFilter = "INSERT")))
      .select($"subscription_ids").as[Seq[String]].head()
    // sOrders has a filter but action '*' → still gets the truncate;
    // sIns (INSERT-only) does not
    assert(out == Seq("sAll", "sOrders"))
  }

  test("decoded pgoutput stream feeds the multi-table matcher directly") {
    val relOrders = RelationMeta(1, "public", "orders", "d", Seq(
      RelColumn("id", "int8", isKey = true),
      RelColumn("amount", "float8", isKey = false)))
    val relUsers = RelationMeta(2, "public", "users", "d", Seq(
      RelColumn("id", "int8", isKey = true),
      RelColumn("name", "text", isKey = false)))
    val msgs = Seq(
      (0L, PgOutput.encodeRelation(relOrders)),
      (1L, PgOutput.encodeRelation(relUsers)),
      (2L, PgOutput.encodeBegin(5L, 1700000000000000L, 1)),
      (3L, PgOutput.encodeInsert(1, Seq(TText("10"), TText("500.0")))),
      (4L, PgOutput.encodeInsert(2, Seq(TText("11"), TText("ada")))),
      (5L, PgOutput.encodeCommit(5L, 6L, 1700000000000000L)))
    val decoded = PgOutput.decodeChanges(
        msgs.toDF("seq", "msg").repartition(1), "msg", "seq")
      .filter(c => Set("INSERT", "UPDATE", "DELETE", "TRUNCATE")(c.message))
      .toDF()
      .withColumnRenamed("message", "change_type")
    val out = MultiTableMatch.matchSubscriptions(decoded, registry, subs)
      .select(element_at($"record", "id").as("id"), $"subscription_ids")
      .as[(String, Seq[String])].collect().toMap
    assert(out("10") == Seq("sAll", "sOrders"))
    assert(out("11") == Seq("sAll", "sUsers"))
  }
}
