package graft.filters

import graft.model.Filter
import org.scalatest.funsuite.AnyFunSuite

/** Parser conformance, mirroring the reference doctest corpus
  * (subscriptions.ex:256-313). */
class FilterParserSpec extends AnyFunSuite {

  test("simple eq") {
    assert(FilterParser.parse("subject=eq.hey") ==
      Right(Seq(Filter("subject", "eq", "hey"))))
  }

  test("in list") {
    assert(FilterParser.parse("subject=in.(hidee,ho)") ==
      Right(Seq(Filter("subject", "in", "", Seq("hidee", "ho")))))
  }

  test("negation via not. prefix") {
    assert(FilterParser.parse("subject=not.like.hey%") ==
      Right(Seq(Filter("subject", "like", "hey%", Nil, negate = true))))
  }

  test("AND composition") {
    assert(FilterParser.parse("id=gt.0,id=lt.100") ==
      Right(Seq(Filter("id", "gt", "0"), Filter("id", "lt", "100"))))
  }

  test("empty and whitespace input → no filters") {
    assert(FilterParser.parse("") == Right(Nil))
    assert(FilterParser.parse("   ") == Right(Nil))
    assert(FilterParser.parse(null) == Right(Nil))
  }

  test("unsupported operator errors") {
    assert(FilterParser.parse("subject=foo.hey").isLeft)
    assert(FilterParser.parse("undefined").isLeft)
  }

  test("empty segment errors") {
    assert(FilterParser.parse("id=gt.0,,id=lt.1").isLeft)
  }

  test("quoted value with dot and comma survives top-level split") {
    assert(FilterParser.parse("""subject=eq."a,b.c"""") ==
      Right(Seq(Filter("subject", "eq", "a,b.c"))))
  }

  test("in list with quoted element keeps embedded comma") {
    assert(FilterParser.parse("""subject=in.(a,"b,c",d)""") ==
      Right(Seq(Filter("subject", "in", "", Seq("a", "b,c", "d")))))
  }

  test("value containing dots parses (first dot splits op)") {
    assert(FilterParser.parse("value=lt.5.5") ==
      Right(Seq(Filter("value", "lt", "5.5"))))
  }

  test("in without parens errors") {
    assert(FilterParser.parse("subject=in.a,b").isLeft)
  }

  test("unterminated quote is kept literal") {
    assert(FilterParser.parse("""subject=eq."abc""") ==
      Right(Seq(Filter("subject", "eq", "\"abc"))))
  }
}
