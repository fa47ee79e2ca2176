package graft.filters

import graft.model.Filter
import org.scalacheck.{Gen, Properties, Prop}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.types._

/** Property-based robustness for the filter DSL front end:
  *  - the parser TOTAL-functions over arbitrary input (Either, no throw);
  *  - every generated well-formed filter parses to the expected structure;
  *  - everything that parses either compiles against a schema or fails
  *    validation cleanly — never an exception at compile time (the
  *    subscribe-time contract: reject early, never blow up on the stream).
  */
object FilterPropertySpec extends Properties("FilterDSL") {

  private val schema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("name", StringType),
    StructField("score", DoubleType),
    StructField("ok", BooleanType)))

  private val colGen = Gen.oneOf("id", "name", "score", "ok", "ghost")
  private val opGen = Gen.oneOf(Filter.Ops.toSeq)
  private val valGen = Gen.oneOf("1", "abc", "5.5", "true", "null", "a%b", "^a.*$")

  property("parser never throws on arbitrary ASCII input") =
    forAll(Gen.asciiPrintableStr) { s =>
      FilterParser.parse(s).isLeft || FilterParser.parse(s).isRight
    }

  property("well-formed simple filters parse to the expected triple") =
    forAll(colGen, opGen.suchThat(_ != "in"), valGen, Gen.oneOf(true, false)) {
      (c, op, v, neg) =>
        val dsl = s"$c=${if (neg) "not." else ""}$op.$v"
        FilterParser.parse(dsl) == Right(Seq(Filter(c, op, v, Nil, neg)))
    }

  property("in-lists of simple values roundtrip") =
    forAll(colGen, Gen.nonEmptyListOf(Gen.oneOf("a", "b1", "2", "x_y"))) {
      (c, vs) =>
        FilterParser.parse(s"$c=in.(${vs.mkString(",")})") ==
          Right(Seq(Filter(c, "in", "", vs)))
    }

  property("parsed filters compile or validate-reject, never throw") =
    forAll(colGen, opGen, valGen, Gen.oneOf(true, false)) { (c, op, v, neg) =>
      val dsl = if (op == "in") s"$c=${if (neg) "not." else ""}in.($v)"
        else s"$c=${if (neg) "not." else ""}$op.$v"
      FilterParser.parse(dsl) match {
        case Left(_) => Prop.passed
        case Right(filters) =>
          filters.foreach { f =>
            FilterCompiler.validate(f, schema) match {
              case Right(_) =>
                FilterCompiler.compile(f, schema) // must not throw
              case Left(_) => () // clean rejection is fine
            }
          }
          Prop.passed
      }
    }

  property("AND-composed filters split exactly on top-level commas") =
    forAll(Gen.chooseNum(1, 5)) { n =>
      val dsl = (1 to n).map(i => s"id=gt.$i").mkString(",")
      FilterParser.parse(dsl).map(_.length) == Right(n)
    }
}
