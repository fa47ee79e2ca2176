package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** JsonQuote — the scalar JSON-string-literal renderer used by the S7
  * broadcast envelope. Parity pin: for every non-null string `s`,
  * `{"x":` + json_quote(s) + `}` must byte-equal `to_json(struct(s as x))`
  * (Jackson's own escaping), so the spliced envelope is exactly what the
  * reference's jsonb_build_object would have produced for those fields. */
class JsonQuoteSpec extends SparkSpec {

  private val hostiles = Seq(
    "plain", "a\"b", "back\\slash", "new\nline", "tab\there", "cr\rhere",
    "ctrlmix", "unié世", "\"", "\\", "", "a\"b\\c\nd")

  test("Jackson parity: json_quote(s) matches to_json(struct(s)) for " +
      "quotes, backslashes, control chars, unicode") {
    import spark.implicits._
    val df = hostiles.toDF("s")
    val rows = df.select(
        concat(lit("{\"x\":"), JsonQuote.quote(col("s")), lit("}")).as("mine"),
        to_json(struct(col("s").as("x"))).as("jackson"))
      .collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1),
      s"mismatch: ${r.getString(0)} vs ${r.getString(1)}"))
  }

  test("null renders as the JSON literal null; non-nullable output") {
    import spark.implicits._
    val out = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "s")
      .select(JsonQuote.quote(col("s")).as("q"))
    assert(!out.schema("q").nullable)
    assert(out.as[String].collect().head == "null")
  }

  test("interpreted eval agrees with codegen") {
    import org.apache.spark.sql.graft.ColumnBridge
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.unsafe.types.UTF8String
    val e = JsonQuote(org.apache.spark.sql.catalyst.expressions
      .BoundReference(0, org.apache.spark.sql.types.StringType, true))
    hostiles.foreach { s =>
      val interpreted =
        e.eval(InternalRow(UTF8String.fromString(s))).toString
      import spark.implicits._
      val viaPlan = Seq(s).toDF("s")
        .select(ColumnBridge.column(JsonQuote(
          ColumnBridge.expression(col("s")))).as("q"))
        .as[String].collect().head
      assert(interpreted == viaPlan, s"eval/codegen split on <$s>")
    }
  }

  test("SQL surface: json_quote registered via GraftFunctions") {
    graft.api.GraftFunctions.register(spark)
    val r = spark.sql("""SELECT json_quote('a"b') AS q,
        json_quote(CAST(NULL AS STRING)) AS n""").collect().head
    assert(r.getString(0) == "\"a\\\"b\"")
    assert(r.getString(1) == "null")
  }
}
