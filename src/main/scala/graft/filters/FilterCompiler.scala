package graft.filters

import graft.model.Filter
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Compiles parsed [[Filter]]s into native Catalyst [[Column]] predicates.
  *
  * This replaces the reference's per-row dynamic SQL evaluation
  * (`check_equality_op`, /root/reference/lib/realtime/tenants/repo/migrations/
  * 20260626120000_readd_postgrest_filter_ops.ex:79-153) with **compile-once**
  * predicates: filter values are text, cast to the column's type at compile
  * (= subscribe) time — mirroring the reference's own optimization of
  * validating/casting in the subscribe-time trigger (same file:188-304) so the
  * hot path never does per-row type dispatch. The resulting predicates are
  * plain Catalyst expressions → whole-stage codegen'd, pushed down to scans.
  *
  * Semantics:
  *  - missing column → compile-time `lit(false)` (fail closed,
  *    `is_visible_through_filters` same file:158-185);
  *  - empty filter list → `lit(true)` (visible);
  *  - SQL three-valued logic: a NULL comparison is not visible (Spark filter
  *    drops null predicates, same as Postgres WHERE);
  *  - `negate` wraps NOT (`is` becomes IS NOT ...).
  */
object FilterCompiler {

  /** Validate a filter against a schema without compiling. Mirrors the
    * subscribe-time validation trigger (P4): column must exist, op/type
    * compatibility, `in` cardinality, `is` keywords, castable value, eager
    * regex validation. */
  def validate(f: Filter, schema: StructType): Either[String, Filter] = {
    val field = schema.fields.find(_.name == f.column)
    field match {
      case None => Left(s"column ${f.column} does not exist")
      case Some(sf) =>
        f.op match {
          case "in" =>
            if (f.values.length > Filter.MaxInValues)
              Left(s"too many values for `in` filter (${f.values.length} > ${Filter.MaxInValues})")
            else castAll(f.values, sf.dataType).left.map(identity).map(_ => f)
          case "is" =>
            val v = f.value.toLowerCase
            if (!Filter.IsKeywords.contains(v))
              Left(s"invalid `is` filter value: ${f.value}")
            else if (v != "null" && sf.dataType != BooleanType)
              Left(s"`is` with $v requires a boolean column")
            else Right(f)
          case "like" | "ilike" =>
            if (!isStringy(sf.dataType)) Left(s"${f.op} requires a text column") else Right(f)
          case "match" | "imatch" =>
            if (!isStringy(sf.dataType)) Left(s"${f.op} requires a text column")
            else
              try { java.util.regex.Pattern.compile(f.value); Right(f) }
              catch { case e: Exception => Left(s"invalid regex: ${e.getMessage}") }
          case _ =>
            castOne(f.value, sf.dataType).map(_ => f)
        }
    }
  }

  /** Compile one filter to a predicate Column against `schema`. */
  def compile(f: Filter, schema: StructType): Column =
    compileWith(f, schema, col(_))

  /** Compile against an arbitrary column accessor — e.g.
    * `c => element_at(col("record"), c)` for the generic
    * `map<col,string>` WAL shape, where the accessed value is cast to the
    * schema's column type before comparison. `schema` still provides the
    * typing and the fail-closed missing-column check. */
  def compileWith(f: Filter, schema: StructType,
      access: String => Column): Column = {
    val fieldOpt = schema.fields.find(_.name == f.column)
    fieldOpt match {
      case None => lit(false) // fail closed: filter names a missing column
      case Some(field) =>
        val dt = field.dataType
        val c = access(f.column).cast(dt)
        // The whole branch is guarded: a filter value that does not cast to
        // the column type (e.g. 'abc' for an int column) fails CLOSED like
        // missing columns and unknown ops do, instead of crashing the plan
        // build of every co-compiled subscription. validate() remains the
        // place that surfaces the error to the subscriber.
        try compileUnsafe(f, c, dt)
        catch { case _: Exception => lit(false) }
    }
  }

  private def compileUnsafe(f: Filter, c: Column, dt: DataType): Column = {
        val base: Column = f.op match {
          case "eq"  => c === typedLit(f.value, dt)
          case "neq" => c =!= typedLit(f.value, dt)
          case "lt"  => c < typedLit(f.value, dt)
          case "lte" => c <= typedLit(f.value, dt)
          case "gt"  => c > typedLit(f.value, dt)
          case "gte" => c >= typedLit(f.value, dt)
          case "in"  => c.isin(f.values.map(v => castScalar(v, dt)): _*)
          case "like"  => c.cast(StringType).like(f.value)
          case "ilike" => c.cast(StringType).ilike(f.value)
          case "match"  => c.cast(StringType).rlike(f.value)
          case "imatch" => c.cast(StringType).rlike("(?i)" + f.value)
          case "is" =>
            f.value.toLowerCase match {
              case "null" | "unknown" => if (f.negate) c.isNotNull else c.isNull
              case "true"  => if (f.negate) !(c <=> lit(true)) else c <=> lit(true)
              case "false" => if (f.negate) !(c <=> lit(false)) else c <=> lit(false)
              case _ => lit(false)
            }
          case "isdistinct" =>
            val d = typedLit(f.value, dt)
            if (f.negate) c <=> d else !(c <=> d)
          case _ => lit(false) // unknown op: fail closed
        }
        f.op match {
          case "is" | "isdistinct" => base // negation folded in (IS NOT / <=>)
          case _ => if (f.negate) !base else base
        }
  }

  /** AND-fold a filter list; empty list ⇒ visible. */
  def compileAll(filters: Seq[Filter], schema: StructType): Column =
    if (filters.isEmpty) lit(true)
    else filters.map(compile(_, schema)).reduce(_ && _)

  /** A text filter value as a literal of the column's type, resolved at
    * compile time (constant-folded — no per-row cast of the RHS). */
  private def typedLit(value: String, dt: DataType): Column =
    lit(castScalar(value, dt))

  /** Driver-side text→type cast, mirroring `realtime.cast` semantics. */
  private[filters] def castScalar(value: String, dt: DataType): Any = dt match {
    case IntegerType => value.trim.toInt
    case LongType    => value.trim.toLong
    case ShortType   => value.trim.toShort
    case DoubleType  => value.trim.toDouble
    case FloatType   => value.trim.toFloat
    case _: DecimalType => new java.math.BigDecimal(value.trim)
    case BooleanType => value.trim.toLowerCase match {
      case "true" | "t" | "1"  => true
      case "false" | "f" | "0" => false
      case other => throw new IllegalArgumentException(s"not a boolean: $other")
    }
    case TimestampType => java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.parse(value.trim.replace(" ", "T")))
    case DateType => java.sql.Date.valueOf(value.trim)
    case _ => value
  }

  private def castOne(v: String, dt: DataType): Either[String, Any] =
    try Right(castScalar(v, dt))
    catch { case e: Exception => Left(s"invalid value for ${dt.simpleString}: $v") }

  private def castAll(vs: Seq[String], dt: DataType): Either[String, Seq[Any]] =
    vs.foldLeft[Either[String, Vector[Any]]](Right(Vector.empty)) {
      case (err @ Left(_), _) => err
      case (Right(acc), v)    => castOne(v, dt).map(acc :+ _)
    }

  private def isStringy(dt: DataType): Boolean = dt match {
    case StringType | _: VarcharType | _: CharType => true
    case _ => false
  }
}
