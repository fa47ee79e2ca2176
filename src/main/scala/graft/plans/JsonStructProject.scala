package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Serialize named, typed fields to a JSON object — `{"a":1,"b":"x"}` —
  * in one native expression, byte-equal to
  * `to_json(struct(fields…))` (null fields omitted, matching Spark's
  * `spark.sql.jsonGenerator.ignoreNullFields=true` default and the
  * reference's `jsonb_object_agg` row filter).
  *
  * Why not `to_json`: it is CodegenFallback, so every payload-group arm
  * containing it drops the whole shaping projection out of whole-stage
  * codegen — G arms × every change row, interpreted, in the CDC delivery
  * hot path. This expression's `doGenCode` emits straight-line appends
  * (no Jackson generator allocation per row, no intermediate struct), so
  * the G-arm battery stays one fused codegen'd pass.
  *
  * Supported field types (checked after resolution): string, boolean,
  * integral (byte/short/int/long), float/double, decimal. Numeric
  * rendering matches Jackson: `String.valueOf` for floating point (Spark
  * does not enable Jackson's opt-in fast double writer), plain
  * `BigDecimal.toString` for decimals. String escaping shares
  * [[JsonMapProject]]'s Jackson-parity table. Callers with other field
  * types (timestamps, nested structs) fall back to `to_json` — see
  * [[JsonStructProject.supports]].
  */
case class JsonStructProject(names: Seq[String], children: Seq[Expression])
  extends Expression {

  require(names.length == children.length,
    "one name per field expression")

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult = {
    children.find(c => !JsonStructProject.supports(c.dataType)) match {
      case Some(c) => TypeCheckResult.TypeCheckFailure(
        s"json_struct_project does not support ${c.dataType.catalogString}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }

  // """name""" JSON-escaped once, with the leading quote and trailing
  // `":` — the per-field constant prefix
  @transient private lazy val prefixes: Array[String] =
    names.map(JsonStructProject.fieldPrefix).toArray

  override def eval(input: InternalRow): Any = {
    val sb = new java.lang.StringBuilder(64)
    sb.append('{')
    var first = true
    var i = 0
    while (i < children.length) {
      val v = children(i).eval(input)
      if (v != null) {
        if (!first) sb.append(',')
        first = false
        sb.append(prefixes(i))
        children(i).dataType match {
          case StringType => JsonStructProject.q(sb, v.asInstanceOf[UTF8String])
          case FloatType => sb.append(String.valueOf(v.asInstanceOf[Float]))
          case DoubleType => sb.append(String.valueOf(v.asInstanceOf[Double]))
          case _: DecimalType =>
            sb.append(v.asInstanceOf[org.apache.spark.sql.types.Decimal]
              .toJavaBigDecimal.toString)
          case _ => sb.append(v.toString) // boolean + integrals
        }
      }
      i += 1
    }
    sb.append('}')
    UTF8String.fromString(sb.toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sb = ctx.freshName("jsb")
    val first = ctx.freshName("jfirst")
    val fieldCodes = children.zipWithIndex.map { case (c, i) =>
      val e = c.genCode(ctx)
      val appendV = c.dataType match {
        case StringType =>
          s"graft.plans.JsonStructProject.q($sb, ${e.value});"
        case FloatType | DoubleType =>
          s"$sb.append(String.valueOf(${e.value}));"
        case _: DecimalType =>
          s"$sb.append(${e.value}.toJavaBigDecimal().toString());"
        case _ =>
          s"$sb.append(${e.value});" // boolean + integrals
      }
      val prefixLit = JsonStructProject.javaStringLiteral(prefixes(i))
      s"""
         |${e.code}
         |if (!${e.isNull}) {
         |  if (!$first) $sb.append(',');
         |  $first = false;
         |  $sb.append($prefixLit);
         |  $appendV
         |}
       """.stripMargin
    }
    ev.copy(
      code = code"""
        |java.lang.StringBuilder $sb = new java.lang.StringBuilder(64);
        |boolean $first = true;
        |$sb.append('{');
        |${fieldCodes.mkString("\n")}
        |$sb.append('}');
        |UTF8String ${ev.value} = UTF8String.fromString($sb.toString());
       """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)

  override def prettyName: String = "json_struct_project"
}

object JsonStructProject {

  /** Field types this expression renders with Jackson parity. */
  def supports(dt: DataType): Boolean = dt match {
    case StringType | BooleanType | ByteType | ShortType | IntegerType |
         LongType | FloatType | DoubleType => true
    case _: DecimalType => true
    case _ => false
  }

  /** Jackson-parity quoted-string append (shared escape table). */
  def q(sb: java.lang.StringBuilder, s: UTF8String): Unit =
    JsonMapProject.appendQuotedString(sb, s)

  /** `"name":` with the name itself JSON-escaped. */
  private[plans] def fieldPrefix(name: String): String = {
    val sb = new java.lang.StringBuilder(name.length + 3)
    q(sb, UTF8String.fromString(name))
    sb.append(':')
    sb.toString
  }

  /** Emit a valid Java string literal for generated code. */
  private[plans] def javaStringLiteral(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 2)
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case c if c < 0x20 || c > 0x7e => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
    sb.toString
  }
}
