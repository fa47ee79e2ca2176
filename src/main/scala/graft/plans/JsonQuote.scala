package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Render a string as a JSON string literal — quoted and escaped with the
  * shared Jackson-parity table ([[JsonMapProject.appendQuotedString]]);
  * a NULL input renders as the four-byte literal `null` (so the result is
  * always a valid JSON value and the expression is non-nullable), matching
  * PostgreSQL's `to_jsonb(text)` / `jsonb_build_object` value rendering.
  *
  * This exists for envelope splicing: building a JSON object by `concat`
  * around ALREADY-ENCODED fragments (the no-double-encoding contract of
  * the broadcast payload path — see
  * [[graft.messages.BroadcastChanges.changesToMessages]]) needs the
  * non-JSON string fields individually escaped, which `to_json` cannot do
  * for a bare scalar and raw splicing gets wrong for any value containing
  * a quote or backslash. Codegen'd straight-line append — stays inside
  * whole-stage codegen in the CDC shaping hot path.
  */
case class JsonQuote(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"json_quote expects a string, got ${child.dataType.catalogString}")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) JsonQuote.NullLiteral
    else {
      val sb = new java.lang.StringBuilder(16)
      JsonMapProject.appendQuotedString(sb, v.asInstanceOf[UTF8String])
      UTF8String.fromString(sb.toString)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val sb = ctx.freshName("jqsb")
    ev.copy(
      code = code"""
        |${c.code}
        |UTF8String ${ev.value};
        |if (${c.isNull}) {
        |  ${ev.value} = graft.plans.JsonQuote.NullLiteral();
        |} else {
        |  java.lang.StringBuilder $sb = new java.lang.StringBuilder(16);
        |  graft.plans.JsonMapProject.appendQuotedString($sb, ${c.value});
        |  ${ev.value} = UTF8String.fromString($sb.toString());
        |}
       """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "json_quote"
}

object JsonQuote {
  /** JSON `null` as a UTF8String constant (also referenced from codegen). */
  def NullLiteral(): UTF8String = Null
  private val Null = UTF8String.fromString("null")

  /** Column-API entry point. */
  def quote(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      JsonQuote(org.apache.spark.sql.graft.ColumnBridge.expression(c)))
}
