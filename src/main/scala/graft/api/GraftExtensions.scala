package graft.api

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Concat, Expression, ExpressionInfo, Literal, RegExpReplace}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** SQL surface for the library's native expressions — the
  * `SparkSessionExtensions` registration route, so a SQL-only user gets
  * the same codegen'd kernels the DataFrame API uses:
  *
  *   spark-submit --conf spark.sql.extensions=graft.api.GraftExtensions …
  *   spark.sql("SELECT quote_wal2json(s, t), json_map_project(m, 'a')")
  *
  * Registered functions:
  *  - `quote_wal2json(schema, table)` — the reference's add-tables
  *    identifier escape ([[graft.cdc.Wal2Json.quoteWal2json]];
  *    …20260528120000_wal2json_escape_special_chars.ex:7-33)
  *  - `json_map_project(map[, key, …])` — project-and-serialize a
  *    `map<string,string>` to JSON in one whole-stage-codegen expression
  *    ([[graft.plans.JsonMapProject]]); with keys, only those keys
  *  - `json_struct_project(name1, val1[, name2, val2, …])` — serialize
  *    named typed fields to a JSON object with Jackson parity
  *    ([[graft.plans.JsonStructProject]])
  *  - `misra_gries(key, k)` — bounded-memory heavy-hitter sketch
  *    aggregate, `array<struct<key,cnt>>` of ≤k candidates covering
  *    every key with count > n/(k+1) ([[graft.plans.MisraGries]])
  *  - `json_quote(s)` — render a string as a JSON string literal
  *    (quoted + escaped, NULL → `null`; [[graft.plans.JsonQuote]])
  *
  * For an already-built session (notebooks, tests), the same list
  * registers imperatively via [[GraftFunctions.register]]. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}

object GraftFunctions {

  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  /** Key/name arguments must be resolvable at plan time (they become the
    * expression's constant shape); accept any foldable string. */
  private def litString(fn: String, e: Expression): String = e match {
    case Literal(s: UTF8String, StringType) => s.toString
    case _ if e.foldable && e.dataType == StringType =>
      val v = e.eval()
      if (v == null)
        throw new IllegalArgumentException(s"$fn: literal argument is null")
      v.toString
    case other => throw new IllegalArgumentException(
      s"$fn: expected a string literal, got $other")
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private val quoteWal2json: FunctionDescription = (
    FunctionIdentifier("quote_wal2json"),
    info("quote_wal2json",
      "quote_wal2json(schema, table) - escape an identifier pair for the wal2json add-tables list"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "quote_wal2json(schema, table) takes 2 arguments")
      // the catalyst twin of Wal2Json.quoteWal2json (a SQL function builder
      // must return a resolved-shape catalyst tree, not a Column wrapper);
      // byte-parity with the column path is spec-pinned. Live 20260528
      // semantics: escape only \ , . and whitespace, no quote-stripping.
      def esc(e: Expression) =
        RegExpReplace(e, Literal("([\\\\,.\\s])"), Literal("\\\\$1"))
      Concat(Seq(esc(args(0)), Literal("."), esc(args(1))))
    })

  private val jsonMapProject: FunctionDescription = (
    FunctionIdentifier("json_map_project"),
    info("json_map_project",
      "json_map_project(map[, key, ...]) - serialize a map<string,string> to JSON, optionally keeping only the named keys"),
    (args: Seq[Expression]) => {
      require(args.nonEmpty, "json_map_project(map[, key, ...]) takes at least 1 argument")
      val keep =
        if (args.length == 1) None
        else Some(args.tail.map(litString("json_map_project", _)))
      graft.plans.JsonMapProject(args.head, keep)
    })

  private val jsonStructProject: FunctionDescription = (
    FunctionIdentifier("json_struct_project"),
    info("json_struct_project",
      "json_struct_project(name1, val1[, name2, val2, ...]) - serialize named fields to a JSON object"),
    (args: Seq[Expression]) => {
      require(args.length >= 2 && args.length % 2 == 0,
        "json_struct_project takes alternating name, value arguments")
      val names = args.grouped(2).map(p =>
        litString("json_struct_project", p.head)).toSeq
      val values = args.grouped(2).map(_(1)).toSeq
      graft.plans.JsonStructProject(names, values)
    })

  private val misraGries: FunctionDescription = (
    FunctionIdentifier("misra_gries"),
    info("misra_gries",
      "misra_gries(key, k) - bounded-memory Misra-Gries heavy-hitter sketch: at most k (key, cnt) candidates covering every key with count > n/(k+1)"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "misra_gries(key, k) takes 2 arguments")
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      val k = args(1) match {
        case e if e.foldable && Seq(ByteType, ShortType, IntegerType, LongType)
            .contains(e.dataType) && e.eval() != null =>
          e.eval().toString.toInt
        case other => throw new IllegalArgumentException(
          s"misra_gries: k must be an integer literal, got $other")
      }
      // an AggregateFunction returned bare: the analyzer wraps it in an
      // AggregateExpression at the call site (the built-in registry's own
      // convention for aggregates)
      graft.plans.MisraGries(args.head, k)
    })

  private val jsonQuote: FunctionDescription = (
    FunctionIdentifier("json_quote"),
    info("json_quote",
      "json_quote(s) - render a string as a JSON string literal (quoted + escaped; NULL renders as the JSON literal null)"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "json_quote(s) takes 1 argument")
      graft.plans.JsonQuote(args.head)
    })

  private val realtimeCast: FunctionDescription = (
    FunctionIdentifier("realtime_cast"),
    info("realtime_cast",
      "realtime_cast(val, type) - the reference's dynamic realtime.cast(val text, type_ regtype) -> jsonb: cast the text to the column type, render as JSON text; bytea passes through as a plain JSON string (no double-encoding)"),
    (args: Seq[Expression]) => {
      require(args.length == 2,
        "realtime_cast(val, type) takes 2 arguments")
      // the type is a regtype LITERAL resolved at subscribe time in the
      // reference (build_prepared_statement_sql interpolates it), so it
      // resolves at PLAN time here — each arm is the native expression,
      // no per-row type dispatch. The bytea arm is the 20260218 fix:
      // `if type_::text = 'bytea' then return to_jsonb(val)` — the raw
      // `\x…` text renders as a JSON string instead of being cast (the
      // cast re-encoded the already-encoded bytes). json/jsonb values
      // are already JSON text and pass through verbatim.
      val v = args.head
      import org.apache.spark.sql.catalyst.expressions.Cast
      import org.apache.spark.sql.types.{BooleanType, DoubleType, LongType}
      litString("realtime_cast", args(1)) match {
        case "int2" | "int4" | "int8" | "smallint" | "integer" | "bigint" =>
          Cast(Cast(v, LongType), StringType)
        case "float4" | "float8" | "real" | "double precision" =>
          Cast(Cast(v, DoubleType), StringType)
        case "bool" | "boolean" =>
          Cast(Cast(v, BooleanType), StringType)
        case "json" | "jsonb" => v
        case "bytea" | "text" | "varchar" | "uuid" | "name" =>
          graft.plans.JsonQuote(v)
        case other => throw new IllegalArgumentException(
          s"realtime_cast: unsupported type '$other'")
      }
    })

  private val flexibleBoolean: FunctionDescription = (
    FunctionIdentifier("flexible_boolean"),
    info("flexible_boolean",
      "flexible_boolean(s) - the join-payload boolean cast (payloads/flexible_boolean.ex): case-insensitive 'true'/'false' text to boolean, anything else null (= cast error upstream)"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "flexible_boolean(s) takes 1 argument")
      // the catalyst twin of JoinConfig.flexibleBoolean
      import org.apache.spark.sql.catalyst.expressions.{CaseWhen, EqualTo, Lower}
      val low = Lower(args.head)
      CaseWhen(Seq(
        (EqualTo(low, Literal("true")), Literal(true)),
        (EqualTo(low, Literal("false")), Literal(false))), None)
    })

  val all: Seq[FunctionDescription] =
    Seq(quoteWal2json, jsonMapProject, jsonStructProject, misraGries,
      jsonQuote, flexibleBoolean, realtimeCast)

  /** Imperative twin of [[GraftExtensions]] for an already-built session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}
