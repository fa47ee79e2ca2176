package graft.filters

import graft.SparkSpec
import graft.model.Filter
import org.apache.spark.sql.DataFrame

/** Predicate-compiler semantics: 13 ops × negate, typed casts, fail-closed
  * missing columns, SQL three-valued logic — the 13-operator conformance
  * matrix of the reference (postgres_changes_test.exs:407-605) in miniature. */
class FilterCompilerSpec extends SparkSpec {
  import spark.implicits._
  import FilterCompilerSpec.R

  lazy val df: DataFrame = Seq(
    R(1, "alpha", 1.5, true),
    R(2, "beta", 2.5, false),
    R(3, "gamma", 3.5, null),
    R(4, null, 4.5, true)
  ).toDF()

  private def ids(dsl: String): Seq[Int] = {
    val fs = FilterParser.parse(dsl).fold(e => fail(e), identity)
    df.where(FilterCompiler.compileAll(fs, df.schema))
      .select("id").as[Int].collect().toSeq.sorted
  }

  test("eq / neq with typed cast")   { assert(ids("id=eq.2") == Seq(2)); assert(ids("id=neq.2") == Seq(1, 3, 4)) }
  test("lt / lte / gt / gte")        { assert(ids("score=lt.2.5") == Seq(1)); assert(ids("score=lte.2.5") == Seq(1, 2)); assert(ids("id=gt.3") == Seq(4)); assert(ids("id=gte.3") == Seq(3, 4)) }
  test("in")                         { assert(ids("name=in.(alpha,beta)") == Seq(1, 2)) }
  test("like / ilike")               { assert(ids("name=like.a%") == Seq(1)); assert(ids("name=ilike.A%") == Seq(1)) }
  test("match / imatch")             { assert(ids("name=match.^(alpha|beta)$") == Seq(1, 2)); assert(ids("name=imatch.^ALPHA$") == Seq(1)) }
  test("is null / true / false")     { assert(ids("ok=is.null") == Seq(3)); assert(ids("ok=is.true") == Seq(1, 4)); assert(ids("ok=is.false") == Seq(2)) }
  test("isdistinct")                 { assert(ids("name=isdistinct.alpha") == Seq(2, 3, 4)) }

  test("negate wraps NOT; null comparisons stay not-visible") {
    assert(ids("name=not.eq.alpha") == Seq(2, 3))     // null name row 4 excluded
    assert(ids("name=not.like.a%") == Seq(2, 3))
    assert(ids("ok=not.is.null") == Seq(1, 2, 4))     // IS NOT NULL
    assert(ids("ok=not.is.true") == Seq(2, 3))        // null-safe: null counts as not-true
    assert(ids("name=not.isdistinct.alpha") == Seq(1))
    assert(ids("id=not.in.(1,2)") == Seq(3, 4))
  }

  test("missing column fails closed") {
    assert(ids("nope=eq.1") == Seq())
    assert(ids("id=gt.0,nope=eq.1") == Seq())
  }

  test("empty filter list is visible") {
    assert(ids("") == Seq(1, 2, 3, 4))
  }

  test("validate rejects bad filters") {
    import org.apache.spark.sql.types._
    val schema = df.schema
    assert(FilterCompiler.validate(Filter("nope", "eq", "1"), schema).isLeft)
    assert(FilterCompiler.validate(Filter("id", "eq", "abc"), schema).isLeft)
    assert(FilterCompiler.validate(Filter("id", "is", "maybe"), schema).isLeft)
    assert(FilterCompiler.validate(Filter("id", "is", "true"), schema).isLeft)  // non-bool column
    assert(FilterCompiler.validate(Filter("ok", "is", "true"), schema).isRight)
    assert(FilterCompiler.validate(Filter("id", "like", "a%"), schema).isLeft)  // non-text column
    assert(FilterCompiler.validate(Filter("name", "match", "("), schema).isLeft) // bad regex
    assert(FilterCompiler.validate(Filter("id", "in", "", (1 to 101).map(_.toString)), schema).isLeft)
    assert(FilterCompiler.validate(Filter("id", "in", "", Seq("1", "2")), schema).isRight)
  }
}

object FilterCompilerSpec {
  case class R(id: Int, name: String, score: Double, ok: java.lang.Boolean)
}
