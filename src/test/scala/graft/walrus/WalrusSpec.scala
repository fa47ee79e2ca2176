package graft.walrus

import graft.SparkSpec
import graft.filters.FilterParser
import graft.model.Subscription
import org.apache.spark.sql.functions._

/** J1 matcher: action routing, predicate groups, fail-closed, dedup of
  * identical filter groups. */
class WalrusSpec extends SparkSpec {
  import spark.implicits._
  import WalrusSpec.Change

  lazy val changes = Seq(
    Change(1, "INSERT", "a", 60.0),
    Change(2, "INSERT", "b", 40.0),
    Change(3, "UPDATE", "a", 70.0),
    Change(4, "DELETE", "a", 80.0)
  ).toDF()

  private def f(dsl: String) = FilterParser.parse(dsl).toOption.get

  lazy val dataSchema = changes.drop("change_type").schema

  test("action + filters route to the right subscriptions") {
    val subs = Seq(
      Subscription("sA", "public", "t", f("value=gt.50,category=eq.a"), actionFilter = "INSERT"),
      Subscription("sB", "public", "t", f("category=eq.a")),
      Subscription("sC", "public", "t", Nil, actionFilter = "DELETE"),
      // identical to sB → must share one compiled predicate group
      Subscription("sD", "public", "t", f("category=eq.a"))
    )
    val out = Walrus.matchSubscriptions(changes, subs, dataSchema, "t")
      .select($"id", $"subscription_ids")
      .as[(Int, Seq[String])].collect().toMap
    assert(out(1) == Seq("sA", "sB", "sD"))
    assert(out(2) == Seq())
    assert(out(3) == Seq("sB", "sD"))
    assert(out(4) == Seq("sB", "sC", "sD"))
  }

  test("matchedOnly drops unmatched changes") {
    val subs = Seq(Subscription("s1", "public", "t", f("value=gt.75")))
    val got = Walrus.matchedOnly(changes, subs, dataSchema, "t")
      .select("id").as[Int].collect().toSeq
    assert(got == Seq(4))
  }

  test("subscriptions for other tables are ignored") {
    val subs = Seq(
      Subscription("s1", "public", "other", f("category=eq.a")),
      Subscription("s2", "public", "*", Nil))
    val out = Walrus.matchSubscriptions(changes, subs, dataSchema, "t")
      .agg(sum(size($"subscription_ids"))).as[Long].head()
    assert(out == 4) // only wildcard s2 matches every change
  }

  test("battery applied STRAIGHT onto a parquet scan compiles in " +
      "whole-stage codegen (lazy ColumnarToRow loads must not re-emit " +
      "inside arm blocks)") {
    // in-memory fixtures are LocalTableScan — no deferred column loads —
    // so the regression needs a real file scan under the battery
    val dir = java.nio.file.Files.createTempDirectory("bat-parquet")
      .toFile.getAbsolutePath
    changes.write.mode("overwrite").parquet(dir)
    val scanned = spark.read.parquet(dir)
    val subs = Seq(
      // two arms over two DIFFERENT scan columns — each arm's first
      // reference used to re-declare the deferred load
      Subscription("sA", "public", "t", f("value=gt.50,category=eq.a")),
      Subscription("sB", "public", "t", f("category=eq.b")))
    val df = Walrus.matchSubscriptions(scanned, subs,
      scanned.drop("change_type").schema, "t")
    val stats = org.apache.spark.sql.execution.debug
      .codegenStringSeq(df.queryExecution.executedPlan)
    // compile failure surfaces as maxMethodCodeSize == -1 with generated
    // code present (CodegenAudit's marker); subtree 0 with no codegen at
    // all also reads -1 but carries no code
    assert(stats.forall { case (_, code, st) =>
      st.maxMethodCodeSize >= 0 || code.trim.isEmpty },
      "a generated stage failed to compile — it would run interpreted")
    // and the results are right (codegen path, not just compiling)
    val out = df.select($"id", $"subscription_ids")
      .as[(Int, Seq[String])].collect().toMap
    assert(out(1) == Seq("sA") && out(2) == Seq("sB") &&
      out(3) == Seq("sA") && out(4) == Seq("sA"))
  }

  test("deleteFilterSource: DELETEs match through the OLD image only; " +
      "UPDATEs never do (apply_rls's DELETE visibility arm)") {
    // new image absent on DELETE (the WAL carries only identity); the
    // UPDATE's old image would pass the filter but must be ignored
    val chg = Seq(
      (1, "DELETE", null: java.lang.Double, java.lang.Double.valueOf(90.0)),
      (2, "DELETE", null: java.lang.Double, java.lang.Double.valueOf(10.0)),
      (3, "UPDATE", java.lang.Double.valueOf(10.0),
        java.lang.Double.valueOf(90.0)),
      (4, "INSERT", java.lang.Double.valueOf(90.0), null: java.lang.Double))
      .toDF("id", "change_type", "value", "old_value")
    val subs = Seq(
      Subscription("sHi", "public", "t", f("value=gt.50")),
      Subscription("sNone", "public", "t", Nil))
    val src = Walrus.deleteFilterSource(chg, Seq("value"))
    val out = Walrus.matchSubscriptions(src, subs,
        chg.select("value").schema, "t")
      .select($"id", $"subscription_ids")
      .as[(Int, Seq[String])].collect().toMap
    assert(out(1) == Seq("sHi", "sNone"), "DELETE visible via old image")
    assert(out(2) == Seq("sNone"), "DELETE old image fails the filter")
    assert(out(3) == Seq("sNone"),
      "UPDATE must NOT match through its old image")
    assert(out(4) == Seq("sHi", "sNone"))
  }

  test("filter naming a missing column fails closed") {
    val subs = Seq(Subscription("s1", "public", "t", f("nope=eq.1")))
    val n = Walrus.matchedOnly(changes, subs, dataSchema, "t").count()
    assert(n == 0)
  }

  test("TRUNCATE routes to '*' subscribers only, filters bypassed") {
    val subs = Seq(
      // '*' action with a filter the truncate row can't satisfy — still
      // delivered: truncate has no row data, filters are inapplicable
      Subscription("sStar", "public", "t", f("value=gt.1000")),
      Subscription("sIns", "public", "t", Nil, actionFilter = "INSERT"),
      Subscription("sDel", "public", "t", Nil, actionFilter = "DELETE"))
    val withTrunc = changes.withColumn("change_type",
      when($"id" === 2, "TRUNCATE").otherwise($"change_type"))
    val out = Walrus.matchSubscriptions(withTrunc, subs, dataSchema, "t")
      .select($"id", $"subscription_ids")
      .as[(Int, Seq[String])].collect().toMap
    assert(out(2) == Seq("sStar"))
    assert(out(1) == Seq("sIns")) // normal rows unaffected
    // generic path agrees
    val gen = GenericMatch.matchExploded(withTrunc, subs, dataSchema, "t", "id")
      .as[(Int, String)].collect().toSet
    assert(gen.filter(_._1 == 2) == Set((2, "sStar")))
  }

  test("codegen battery ≡ HOF battery (differential)") {
    val subs = Seq(
      Subscription("sA", "public", "t", f("value=gt.50,category=eq.a"), actionFilter = "INSERT"),
      Subscription("sB", "public", "t", f("category=eq.a")),
      Subscription("sC", "public", "t", Nil, actionFilter = "DELETE"),
      Subscription("sD", "public", "t", f("category=eq.a")))
    val withTrunc = changes.withColumn("change_type",
      when($"id" === 3, "TRUNCATE").otherwise($"change_type"))
    def run(cg: Boolean) =
      Walrus.matchSubscriptions(withTrunc, subs, dataSchema, "t", useCodegen = cg)
        .select($"id", $"subscription_ids")
        .as[(Int, Seq[String])].collect().toMap
    assert(run(true) == run(false))
  }

  test("battery runs inside whole-stage codegen, no fallback, at 200 arms") {
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.codegen.fallback", "false") // compile failure → throw
    // AQE wraps everything in AdaptiveSparkPlanExec whose pre-execution
    // plan has no WholeStageCodegen subtrees to inspect
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val subs200 = graft.Queries.manySubs.map(_._1)
      // spark.range source: a LocalRelation would be constant-folded by
      // ConvertToLocalRelation and never reach codegen
      val wide = spark.range(100).selectExpr(
        "id AS event_id",
        "CASE WHEN id % 2 = 0 THEN 'click' ELSE 'view' END AS event_type",
        "id % 50 AS user_id",
        "CAST(id % 100 AS DOUBLE) AS value",
        "CASE WHEN id % 10 < 6 THEN 'INSERT' WHEN id % 10 < 9 THEN 'UPDATE' ELSE 'DELETE' END AS change_type")
      val df = Walrus.matchSubscriptions(wide, subs200,
        wide.drop("change_type").schema, "events")
        .select(sum(size($"subscription_ids")))
      assert(df.as[Long].head() > 0) // throws here if janino rejected the 200-arm method
      val gen = org.apache.spark.sql.execution.debug
        .codegenString(df.queryExecution.executedPlan)
      // the battery Project sits INSIDE a WholeStageCodegen subtree (the
      // `*(n)` star), and the count above already proved the generated
      // method compiled (fallback=false would have thrown)
      assert(!gen.contains("Found 0 WholeStageCodegen"))
      assert(gen.contains("subscription_battery("))
    } finally {
      spark.conf.set("spark.sql.codegen.fallback", prev)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("projectRecord keeps pk and selection") {
    assert(Walrus.projectRecord(Seq("id", "a", "b"), Seq("a"), Seq("id")) == Seq("id", "a"))
    assert(Walrus.projectRecord(Seq("id", "a", "b"), Nil, Seq("id")) == Seq("id", "a", "b"))
  }

  test("toastMerge: old value only for ABSENT keys; explicit NULL stays NULL") {
    // record: 'a' present, 'b' explicitly NULLed, 'c' absent (unchanged
    // TOAST); old image has all three. Reference semantics: only 'c'
    // falls back — an UPDATE that SET b = NULL must deliver b as null,
    // not the stale old value.
    val df = Seq(1).toDF("id").select(
      map(lit("a"), lit("new_a"), lit("b"), lit(null).cast("string"))
        .as("record"),
      map(lit("a"), lit("old_a"), lit("b"), lit("old_b"), lit("c"), lit("old_c"))
        .as("old_record"))
    val m = df.select(Walrus.toastMerge($"record", $"old_record").as("m"))
      .as[Map[String, String]].head()
    assert(m == Map("a" -> "new_a", "b" -> null, "c" -> "old_c"))
    assert(m.keySet.contains("b")) // key survives with a null value
    // key order: record keys first (map order), old-only keys appended —
    // downstream JSON serialization depends on this
    val ordered = df.select(
      map_keys(Walrus.toastMerge($"record", $"old_record")))
      .as[Seq[String]].head()
    assert(ordered == Seq("a", "b", "c"))
  }
}

object WalrusSpec {
  case class Change(id: Int, change_type: String, category: String, value: Double)
}
