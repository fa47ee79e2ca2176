package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.DataType

/** Optimizer fence around an expensive parse: evaluates exactly as its
  * child, but reports `deterministic = false`, which makes every
  * duplicating optimizer rule treat the projection conservatively —
  * `CollapseProject` will not inline it into use sites, and
  * `PushPredicateThroughNonJoin` will not push filters through the
  * projection that computes it.
  *
  * Why (r12, measured on the wal2json decode path): predicates that
  * consumers apply to DECODED fields (`message != 'DELETE'` and the
  * action cascade in the mirror/SCD2 family) were pushed below the
  * decode projection; each pushed reference was then rewritten by
  * Catalyst's JSON pruning into its own single-field re-parse of the
  * raw JSON string. The executed plans carried the parse 27×
  * (`s1_wal_mirror`), 28× (`s1_wal_scd2`, `j_asof_pit`) and 54×
  * (`s1_mirror_diff`, two legs) per row — 6–7 copies in each Filter
  * and its scan's data-filter list, on the engine's highest-volume
  * path (the S1 CDC ingest). Re-parsing below the projection is never
  * a win: evaluating those predicates REQUIRES the parse, so the
  * pushdown "optimization" multiplies the dominant cost to save a
  * row-handoff. With the fence the filter stays above the decode and
  * references the parsed attribute — one parse per row.
  *
  * Two dead ends, recorded: (1) subexpression elimination cannot fold
  * the copies because `JsonToStructs` is CodegenFallback, which
  * `EquivalentExpressions` skips; (2) a deterministic identity fence
  * (hiding the parse from the JSON pruning rule only) leaves inlining
  * and pushdown free to duplicate the now-FULL-schema parse — measured
  * 14–45% SLOWER than the pruned duplicates it replaced.
  *
  * The child here IS deterministic — the flag is a planning fence, not
  * a semantics claim, and it is only ever conservative: no rule
  * produces wrong results by declining to move or duplicate this
  * expression. Speculative re-execution still yields identical values.
  * Use it only on expressions whose duplication dominates the query
  * (a JSON/binary decode); fencing a cheap expression just blocks
  * legitimate pushdown of predicates that mention it. */
case class EvalOnce(child: Expression) extends UnaryExpression {

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable

  /** The planning fence: see class scaladoc. The computation itself is
    * as deterministic as its child. */
  override lazy val deterministic: Boolean = false

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // declare OWN variables rather than aliasing the child's ExprCode:
    // whole-stage codegen evaluates nondeterministic outputs eagerly and
    // expects `ev.code` to DECLARE `ev.value` at that point — a
    // pass-through alias left the hoisted reference undeclared (Janino:
    // "project_value_0 is not an rvalue", caught by CodegenAudit)
    val c = child.genCode(ctx)
    val jt = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
      .javaType(dataType)
    ev.copy(code = code"""
      |${c.code}
      |boolean ${ev.isNull} = ${c.isNull};
      |$jt ${ev.value} = ${c.value};""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "eval_once"
}

object EvalOnce {
  /** COMPOSITION RESTRICTION (applies to every public helper returning
    * a fenced column — [[graft.cdc.Wal2Json.parsed]],
    * [[graft.cdc.Debezium.parsed]], [[graft.pipeline.TextAnalysis.words]]
    * / `tokenCount`, the dedup digest columns): because the fence
    * reports nondeterministic, Catalyst only accepts the RAW expression
    * in its nondeterministic whitelist (Project / Filter / Window /
    * Generate). Placing it directly inside an aggregate function, a
    * join condition, or a grouping expression throws AnalysisException
    * at analysis time (never a wrong result). The idiom: BIND the
    * fenced column first, then reference the bound attribute —
    * {{{
    *   df.withColumn("w", Wal2Json.parsed(col("raw")))   // bind once
    *     .groupBy(col("w.action")).agg(...)              // compose freely
    * }}}
    * An attribute reference to a bound fenced column is deterministic,
    * so every downstream operator composes normally — and the bind is
    * exactly the one-evaluation point the fence exists to create.
    * Pinned by EvalOnceSpec ("composition restriction"). */
  def of(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(EvalOnce(
      org.apache.spark.sql.graft.ColumnBridge.expression(c)))
}
