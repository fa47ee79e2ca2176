package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Project-and-serialize a `map<string,string>` to a JSON object in one
  * native expression: `{"k":"v",…}` for the entries whose key is in
  * `keep` (None = all), in map order, with SQL NULL values as JSON null.
  *
  * Why not `to_json(map_filter(m, …))`: `map_filter` is an interpreted
  * higher-order function that materializes an intermediate map, and
  * `to_json` is CodegenFallback — either one drops the whole payload
  * projection out of whole-stage codegen, per row, per group arm. This
  * expression's `doGenCode` emits a call to a static writer (so the
  * surrounding projection stays fused in codegen) and the writer is one
  * tight pass: no intermediate map, no Jackson generator setup per value.
  *
  * Escaping matches Jackson/Spark `to_json` byte-for-byte (`"`, `\`,
  * \b \f \n \r \t shortcuts, other control chars as \u00XX; non-ASCII
  * passes through raw UTF-8) — property-tested against `to_json` so the
  * DuckDB oracles stay valid.
  */
case class JsonMapProject(
    child: Expression,
    keep: Option[Seq[String]])
  extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  @transient private lazy val keepSet: java.util.HashSet[UTF8String] =
    JsonMapProject.toKeepSet(keep.orNull)

  override def nullSafeEval(input: Any): Any =
    JsonMapProject.write(input.asInstanceOf[MapData], keepSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val keepRef = ctx.addReferenceObj("keepSet", keepSet, "java.util.HashSet")
    defineCodeGen(ctx, ev, m =>
      s"graft.plans.JsonMapProject.write($m, $keepRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "json_map_project"
}

object JsonMapProject {

  private[plans] def toKeepSet(keep: Seq[String]): java.util.HashSet[UTF8String] =
    if (keep == null) null
    else {
      val s = new java.util.HashSet[UTF8String](keep.size * 2)
      keep.foreach(k => s.add(UTF8String.fromString(k)))
      s
    }

  /** Static writer: called from generated code and from eval. */
  def write(m: MapData, keep: java.util.HashSet[UTF8String]): UTF8String = {
    val keys = m.keyArray()
    val vals = m.valueArray()
    val sb = new java.lang.StringBuilder(32)
    sb.append('{')
    var first = true
    var i = 0
    val n = m.numElements()
    while (i < n) {
      val k = keys.getUTF8String(i)
      if (keep == null || keep.contains(k)) {
        if (!first) sb.append(',')
        first = false
        appendQuoted(sb, k)
        sb.append(':')
        if (vals.isNullAt(i)) sb.append("null")
        else appendQuoted(sb, vals.getUTF8String(i))
      }
      i += 1
    }
    sb.append('}')
    UTF8String.fromString(sb.toString)
  }

  /** Jackson-compatible string escape: `"`, `\`, \b \f \n \r \t, other
    * chars < 0x20 as \u00XX; everything else raw. Shared with
    * [[JsonStructProject]] (also called from its generated code). */
  def appendQuotedString(sb: java.lang.StringBuilder, s: UTF8String): Unit =
    appendQuoted(sb, s)

  private def appendQuoted(sb: java.lang.StringBuilder, s: UTF8String): Unit = {
    sb.append('"')
    val str = s.toString
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      c match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        // Jackson emits UPPERCASE hex (CharTypes.HC = "0123456789ABCDEF"),
        // i.e. backslash-u001B not u001b -- lowercase would break to_json
        // byte-parity for control chars 0x0B and 0x0E-0x1F
        case _ if c < 0x20 => sb.append(f"\\u${c.toInt}%04X")
        case _ => sb.append(c)
      }
      i += 1
    }
    sb.append('"')
  }
}
