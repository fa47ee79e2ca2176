package graft.walrus

import graft.SparkSpec
import graft.model.{Filter, Subscription}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Randomized differential conformance: for arbitrary subscription sets
  * (random ops, values, actions, negation) over random change rows, the
  * generic data-driven matcher must produce the exact (change,
  * subscription) pair set of the compiled codegen battery — the
  * "bit-for-bit fallback" contract, exercised across the op × type grid
  * including large-long keys, null columns, and regex/like patterns.
  * Deterministic seeds (reproducible failures, oracle-stable CI). */
class MatchDifferentialSpec extends SparkSpec {
  import spark.implicits._
  import MatchDifferentialSpec.Row_

  private val dataSchema = Seq.empty[Row_].toDS().toDF()
    .drop("change_type").schema

  private val colVals: Map[String, Gen[String]] = Map(
    "big" -> Gen.oneOf("9007199254740993", "9007199254740994", "1", "-5"),
    "num" -> Gen.oneOf("1.5", "50", "99.25", "-3"),
    "name" -> Gen.oneOf("click", "view", "c%", "^c.*$", "CLICK"),
    "flag" -> Gen.oneOf("true", "false", "null"))

  private val filterGen: Gen[Filter] = for {
    c <- Gen.oneOf("big", "num", "name", "flag", "missing")
    op <- Gen.oneOf("eq", "neq", "lt", "lte", "gt", "gte", "in",
      "like", "ilike", "match", "imatch", "is", "isdistinct")
    v <- colVals.getOrElse(c, Gen.const("1"))
    vs <- Gen.nonEmptyListOf(colVals.getOrElse(c, Gen.const("1"))).map(_.take(3))
    neg <- Gen.oneOf(true, false)
  } yield Filter(c, op, v, if (op == "in") vs else Nil, neg)

  private val subsGen: Gen[Seq[Subscription]] = for {
    n <- Gen.choose(1, 6)
    subs <- Gen.listOfN(n, for {
      fs <- Gen.listOf(filterGen).map(_.take(3))
      action <- Gen.oneOf("*", "INSERT", "UPDATE", "DELETE")
    } yield (fs, action))
  } yield subs.zipWithIndex.map { case ((fs, a), i) =>
    Subscription(f"d$i%02d", "public", "t", fs, actionFilter = a)
  }

  private val rowGen: Gen[Row_] = for {
    id <- Gen.choose(1L, 40L)
    big <- Gen.oneOf(9007199254740993L, 9007199254740994L, 1L, -5L, 77L)
    num <- Gen.oneOf(Some(1.5), Some(50.0), Some(99.25), None)
    name <- Gen.oneOf(Some("click"), Some("view"), Some("CLICK"), None)
    flag <- Gen.oneOf(Some(true), Some(false), None)
    tpe <- Gen.oneOf("INSERT", "UPDATE", "DELETE", "TRUNCATE")
  } yield Row_(id, big, num, name, flag, tpe)

  test("generic matcher ≡ compiled battery over random subs × rows") {
    val params = Gen.Parameters.default
    (0 until 25).foreach { i =>
      val subs = subsGen.pureApply(params, Seed(1000L + i))
      val rows0 = Gen.listOfN(12, rowGen).pureApply(params, Seed(2000L + i))
      // unique change ids so pair sets compare cleanly (the ordinal fix
      // is covered by WalrusSpec; here we pin predicate semantics)
      val rows = rows0.zipWithIndex.map { case (r, j) => r.copy(id = j.toLong) }
      val changes = rows.toDF()
      val compiled = Walrus.matchSubscriptions(changes, subs, dataSchema, "t")
        .select($"id", explode_outer($"subscription_ids").as("sid"))
        .where($"sid".isNotNull)
        .as[(Long, String)].collect().toSet
      val generic = GenericMatch.matchExploded(
          changes, subs, dataSchema, "t", "id")
        .as[(Long, String)].collect().toSet
      assert(generic == compiled,
        s"case $i diverged: subs=$subs rows=$rows")
    }
  }
}

object MatchDifferentialSpec {
  case class Row_(id: Long, big: Long, num: Option[Double],
      name: Option[String], flag: Option[Boolean], change_type: String)
}
