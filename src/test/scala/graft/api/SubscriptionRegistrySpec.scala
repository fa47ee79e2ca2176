package graft.api

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SubscriptionRegistrySpec extends AnyFunSuite {

  private val tSchema = StructType(Seq(
    StructField("id", IntegerType), StructField("details", StringType)))
  private def reg = new SubscriptionRegistry(Map(
    ("public", "test") -> tSchema,
    ("public", "other") -> tSchema,
    ("audit", "log") -> tSchema))

  test("subscribe validates and canonicalizes") {
    val r = reg
    val got = r.subscribe("s1", "public", "test", "id=gt.0,details=eq.x")
    assert(got.isRight && got.toOption.get.head.filters.head.column == "details")
    assert(r.forTable("public", "test").size == 1)
  }

  test("wildcard table expands across catalog") {
    val r = reg
    val got = r.subscribe("s1", "public", "*")
    assert(got.toOption.get.map(_.table).sorted == Seq("other", "test"))
    assert(r.all.size == 2)
  }

  test("wildcard schema expands, select on wildcard rejected") {
    val r = reg
    assert(r.subscribe("s1", "*", "*").toOption.get.size == 3)
    assert(r.subscribe("s2", "*", "test", selectedColumns = Seq("id")).isLeft)
  }

  test("upsert replaces same (id, entity)") {
    val r = reg
    r.subscribe("s1", "public", "test", "id=gt.0")
    r.subscribe("s1", "public", "test", "id=gt.5")
    assert(r.all.size == 1 && r.all.head.filters.head.value == "5")
  }

  test("channels-per-client cap: upsert doesn't double-count, wildcard " +
      "expansion can trip it in one call") {
    val r = new SubscriptionRegistry(Map(
      ("public", "test") -> tSchema,
      ("public", "other") -> tSchema,
      ("audit", "log") -> tSchema), maxChannelsPerClient = 2)
    assert(r.subscribe("c1", "public", "test").isRight)
    // replacing the same (id, entity) stays at 1 channel
    assert(r.subscribe("c1", "public", "test", "id=gt.5").isRight)
    assert(r.subscribe("c1", "public", "other").isRight)
    // a third distinct entity exceeds the cap of 2 — rejected, state intact
    val over = r.subscribe("c1", "audit", "log")
    assert(over.swap.toOption.get.contains("too many channels"))
    assert(r.all.size == 2)
    // a 3-table wildcard blows the cap atomically (nothing inserted)
    val r2 = new SubscriptionRegistry(Map(
      ("public", "test") -> tSchema,
      ("public", "other") -> tSchema,
      ("audit", "log") -> tSchema), maxChannelsPerClient = 2)
    assert(r2.subscribe("c2", "*", "*").isLeft && r2.all.isEmpty)
    // other clients are unaffected by c1's count
    assert(r.subscribe("c3", "audit", "log").isRight)
  }

  test("invalid filters and unknown columns are rejected at subscribe time") {
    val r = reg
    assert(r.subscribe("s1", "public", "test", "nope=eq.1").isLeft)
    assert(r.subscribe("s1", "public", "test", "id=eq.abc").isLeft)
    assert(r.subscribe("s1", "public", "test", "id=foo.1").isLeft)
    assert(r.subscribe("s1", "public", "nosuch").isLeft)
    assert(r.subscribe("s1", "public", "test",
      selectedColumns = Seq("ghost")).isLeft)
    assert(r.all.isEmpty)
  }

  test("revalidate drops subscriptions invalidated by schema change") {
    val r = reg
    r.subscribe("s1", "public", "test", "details=eq.x")
    r.subscribe("s2", "public", "test", "id=gt.0")
    r.subscribe("s3", "public", "other", "id=gt.0")
    // new catalog: 'details' column dropped from test; 'other' table gone
    val newCat = Map(
      ("public", "test") -> StructType(Seq(StructField("id", IntegerType))),
      ("audit", "log") -> tSchema)
    val dropped = r.revalidate(newCat)
    assert(dropped.map(_._1).sorted == Seq("s1", "s3"))
    assert(r.all.map(_.subscriptionId) == Seq("s2"))
  }

  test("unsubscribe removes all entity rows of the id") {
    val r = reg
    r.subscribe("s1", "public", "*")
    r.subscribe("s2", "public", "test")
    assert(r.unsubscribe("s1") == 2)
    assert(r.all.map(_.subscriptionId) == Seq("s2"))
  }
}
