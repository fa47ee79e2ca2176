package graft.filters

import graft.model.Filter

/** Parser for the PostgREST-style filter DSL used by subscriptions:
  * `"col=op.value,col2=not.op2.value2"`, comma = AND, `not.` prefix = negate,
  * `in` values wrapped in parens, double-quote quoting with backslash escapes.
  *
  * Semantics follow the reference parser
  * (/root/reference/lib/extensions/postgres_cdc_rls/subscriptions.ex:395-494,
  * doctests :256-313) re-expressed as a single-pass Scala scanner:
  *  - top-level split on `,` only at paren depth 0 and outside quotes;
  *  - a quote opens only after `.`, `(` or `,` (mid-token quotes are literal);
  *  - unsupported operator or malformed segment → Left(error);
  *  - empty / whitespace-only input → no filters.
  */
object FilterParser {

  def parse(input: String): Either[String, Seq[Filter]] = {
    val trimmed = if (input == null) "" else input.trim
    if (trimmed.isEmpty) Right(Nil)
    else {
      val segments = splitTopLevel(trimmed)
      segments.foldLeft[Either[String, Vector[Filter]]](Right(Vector.empty)) {
        case (err @ Left(_), _) => err
        case (Right(acc), seg)  => parseSegment(seg).map(acc :+ _)
      }
    }
  }

  /** Split on commas at depth 0, outside quotes. Quote state opens only after
    * `.`, `(`, `,` (or start), matching the reference scanner. */
  private[filters] def splitTopLevel(s: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var quoted = false
    var prev: Char = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quoted) {
        if (c == '\\' && i + 1 < s.length) {
          cur.append('\\').append(s.charAt(i + 1)); prev = s.charAt(i + 1); i += 1
        } else if (c == '"') { quoted = false; cur.append(c); prev = c }
        else { cur.append(c); prev = c }
      } else c match {
        case '"' if prev == '.' || prev == '(' || prev == ',' =>
          quoted = true; cur.append(c); prev = c
        case '(' => depth += 1; cur.append(c); prev = c
        case ')' => depth = math.max(0, depth - 1); cur.append(c); prev = c
        case ',' if depth == 0 => out += cur.result(); cur.clear(); prev = 0
        case _ => cur.append(c); prev = c
      }
      i += 1
    }
    out += cur.result()
    out.result()
  }

  private def parseSegment(segment: String): Either[String, Filter] = {
    val trimmed = segment.trim
    if (trimmed.isEmpty)
      Left("filter must not contain empty segments (check for extra commas)")
    else trimmed.split("=", 2) match {
      case Array(col, rest) =>
        val (negate, opValue) =
          if (rest.startsWith("not.")) (true, rest.drop(4)) else (false, rest)
        opValue.split("\\.", 2) match {
          case Array(op, value) if Filter.Ops.contains(op) =>
            formatValue(op, value).map {
              case Left(scalar) => Filter(col, op, scalar, Nil, negate)
              case Right(vs)    => Filter(col, op, "", vs, negate)
            }
          case Array(op, value) => Left(s"""["$op", "$value"]""")
          case _                => Left(s"""["$opValue"]""")
        }
      case _ => Left(s"""["$trimmed"]""")
    }
  }

  /** `in` → parenthesised list split element-wise; others → unquote. */
  private def formatValue(
      op: String, value: String): Either[String, Either[String, Seq[String]]] =
    if (op == "in") {
      if (value.length >= 2 && value.startsWith("(") && value.endsWith(")"))
        Right(Right(splitListElements(value.substring(1, value.length - 1))))
      else Left("`in` filter value must be wrapped by parentheses")
    } else Right(Left(unquote(value)))

  /** Split an `in` list body on commas, honouring double-quoted elements. */
  private[filters] def splitListElements(body: String): Seq[String] = {
    if (body.trim.isEmpty) return Nil
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var quoted = false
    var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (quoted) {
        if (c == '\\' && i + 1 < body.length) { cur.append(body.charAt(i + 1)); i += 1 }
        else if (c == '"') quoted = false
        else cur.append(c)
      } else c match {
        case '"' if cur.isEmpty => quoted = true
        case ','                => out += cur.result().trim; cur.clear()
        case _                  => cur.append(c)
      }
      i += 1
    }
    out += cur.result().trim
    out.result()
  }

  /** Strip a fully-quoted value (`"a.b"` → `a.b`); partial quotes are kept
    * verbatim, matching the reference's unquote_value fallback. */
  private[filters] def unquote(value: String): String =
    if (value.length >= 2 && value.startsWith("\"")) {
      val sb = new StringBuilder
      var i = 1
      while (i < value.length) {
        val c = value.charAt(i)
        if (c == '\\' && i + 1 < value.length) { sb.append(value.charAt(i + 1)); i += 2 }
        else if (c == '"') {
          return if (i == value.length - 1) sb.result() else value
        } else { sb.append(c); i += 1 }
      }
      value // unterminated quote → literal
    } else value
}
