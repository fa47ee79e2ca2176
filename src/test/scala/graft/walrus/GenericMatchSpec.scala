package graft.walrus

import graft.SparkSpec
import graft.filters.FilterParser
import graft.model.{Filter, Subscription}
import org.apache.spark.sql.functions._

/** The generic runtime evaluator must agree with the compiled-predicate
  * battery on every operator — differential conformance. */
class GenericMatchSpec extends SparkSpec {
  import spark.implicits._
  import WalrusSpec.Change

  lazy val changes = Seq(
    Change(1, "INSERT", "alpha", 60.0),
    Change(2, "INSERT", "beta", 40.0),
    Change(3, "UPDATE", "alpha", 70.0),
    Change(4, "DELETE", null, 80.0)
  ).toDF()

  private def f(dsl: String) = FilterParser.parse(dsl).toOption.get
  lazy val dataSchema = changes.drop("change_type").schema

  lazy val subs = Seq(
    Subscription("s01", "public", "t", f("value=gt.50,category=eq.alpha"), actionFilter = "INSERT"),
    Subscription("s02", "public", "t", f("category=in.(alpha,beta)")),
    Subscription("s03", "public", "t", f("category=not.like.a%")),
    Subscription("s04", "public", "t", f("value=lte.40"), actionFilter = "UPDATE"),
    Subscription("s05", "public", "t", Nil, actionFilter = "DELETE"),
    Subscription("s06", "public", "t", f("category=is.null")),
    Subscription("s07", "public", "t", f("category=isdistinct.alpha")),
    Subscription("s08", "public", "t", f("category=match.^(al|be)")),
    Subscription("s09", "public", "t", f("category=imatch.^ALPHA$")),
    Subscription("s10", "public", "t", f("id=not.in.(1,2)")),
    Subscription("s11", "public", "t", f("nope=eq.1")),
    Subscription("s12", "public", "t", f("value=neq.60"))
  )

  test("generic path equals compiled path across all operators") {
    val compiled = Walrus.matchSubscriptions(changes, subs, dataSchema, "t")
      .select(col("id"), explode(col("subscription_ids")).as("subscription_id"))
      .as[(Int, String)].collect().toSet
    val generic = GenericMatch.matchExploded(
        changes, subs, dataSchema, "t", "id")
      .as[(Int, String)].collect().toSet
    assert(generic == compiled)
    assert(compiled.nonEmpty)
  }

  test("generic path handles numeric-vs-text comparison typing") {
    // "40.0" as filter text must equal double 40.0 numerically
    val s = Seq(Subscription("sx", "public", "t", Seq(Filter("value", "eq", "40.0"))))
    val got = GenericMatch.matchExploded(changes, s, dataSchema, "t", "id")
      .as[(Int, String)].collect().toSet
    assert(got == Set((2, "sx")))
  }
}
