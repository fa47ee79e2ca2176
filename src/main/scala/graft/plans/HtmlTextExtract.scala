package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The HTML→text extraction chain as ONE native kernel — the Column
  * formulation (17 stacked regexp_replace calls, see
  * [[graft.pipeline.Html]]) inlines into a single generated method of
  * ~8.6 kB, past HotSpot's 8 000-byte JIT inlining ceiling
  * (CodegenAudit caught it: the stage compiles but runs in the
  * bytecode interpreter). Here the chain runs imperatively against
  * per-JVM precompiled `java.util.regex` Patterns — semantically
  * IDENTICAL to the Column chain (same engine, same patterns, same
  * order; the spec differential-tests the two) while the generated
  * code is one call. The per-row win is real, too: the Column chain
  * re-reads the pattern from the plan per call, this compiles each
  * exactly once per JVM. */
case class HtmlTextExtract(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"html_text expects a string, got ${child.dataType.catalogString}")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else HtmlTextExtract.extract(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      |${c.code}
      |boolean ${ev.isNull} = ${c.isNull};
      |UTF8String ${ev.value} = null;
      |if (!${ev.isNull}) {
      |  ${ev.value} = graft.plans.HtmlTextExtract.extract(${c.value});
      |}
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "html_text"
}

object HtmlTextExtract {
  import java.util.regex.Pattern

  // the exact patterns of the Column chain, in its order; compiled once
  private val Head = Pattern.compile("(?is)<head[^>]*>.*?</head>")
  private val Title = Pattern.compile("(?is)<title[^>]*>.*?</title>")
  private val Script = Pattern.compile("(?is)<script[^>]*>.*?</script>")
  private val Style = Pattern.compile("(?is)<style[^>]*>.*?</style>")
  private val Comment = Pattern.compile("(?s)<!--.*?-->")
  private val Block =
    Pattern.compile("(?i)</?(p|div|br|li|h[1-6]|tr|table|ul|ol)[^>]*>")
  private val Tag = Pattern.compile("(?s)<[^>]+>")
  private val Spaces = Pattern.compile("[ \\t]+")
  private val NlPad = Pattern.compile(" ?\\n ?")
  private val NlRuns = Pattern.compile("\\n{3,}")
  private val EdgeWs = Pattern.compile("^\\s+|\\s+$")

  /** Codegen entry point (referenced from generated java). */
  def extract(html: UTF8String): UTF8String =
    UTF8String.fromString(extractString(html.toString))

  def extractString(html: String): String = {
    var s = Head.matcher(html).replaceAll("")
    s = Title.matcher(s).replaceAll("")
    s = Script.matcher(s).replaceAll("")
    s = Style.matcher(s).replaceAll("")
    s = Comment.matcher(s).replaceAll("")
    s = Block.matcher(s).replaceAll("\n")
    s = Tag.matcher(s).replaceAll("")
    // literal entity decode, &amp; last (String.replace is non-regex)
    s = s.replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'")
      .replace("&nbsp;", " ").replace("&amp;", "&")
    s = Spaces.matcher(s).replaceAll(" ")
    s = NlPad.matcher(s).replaceAll("\n")
    s = NlRuns.matcher(s).replaceAll("\n\n")
    EdgeWs.matcher(s).replaceAll("")
  }

  /** Column-API entry point. */
  def of(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      HtmlTextExtract(org.apache.spark.sql.graft.ColumnBridge.expression(c)))
}
