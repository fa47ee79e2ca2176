package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd form of the subscription-match battery: evaluates G
  * group predicates against the row and returns the SORTED merged array of
  * the matching groups' (pre-sorted, constant) subscription ids.
  *
  * Why an Expression and not `array_sort(flatten(filter(array(when(p,ids)
  * …)))))`: higher-order functions (ArrayFilter) and the array
  * constructor over G conditional arms do not participate in whole-stage
  * codegen — the whole battery drops to interpreted eval per row, which is
  * the flagship query's hot loop. Here the G predicates are ordinary
  * codegen-able comparisons; `doGenCode` emits one short-circuit block per
  * arm appending a constant id array, with `splitExpressionsWithCurrentInputs`
  * keeping generated methods under the JIT limits for large G. The arm id
  * arrays ride along as a single reference object, not as literals in the
  * generated source.
  *
  * Action dispatch: arms carrying an `actionTags` entry are grouped under
  * ONE change-type comparison per distinct tag (a jump table over the
  * 4 actions), instead of a `type = action` conjunct inside every arm —
  * a row evaluates only its own action's arms plus the `*` arms. `ty`
  * (the evaluated `typeExpr`) NULL skips all tagged arms, matching the
  * SQL `type = action` null semantics.
  *
  * Semantics identical to the HOF form (differential-tested): a NULL
  * predicate is not-matched (SQL three-valued logic folded to false), the
  * result is never null, and ids are globally sorted (binary UTF8 order,
  * same as `array_sort`).
  *
  * Output ordering costs ZERO per-row comparisons: because the arm id
  * arrays are constant, ALL (id, arm) pairs are sorted once at plan
  * construction into one global array, and each row just gathers the ids
  * whose arm matched — a boolean-indexed scan, no string compares.
  * Measured on the 200-sub flagship at sf0.1 warm: per-row
  * `Arrays.sort` of the concatenation was ~35% of query time
  * (UTF8String comparisons dominate); a G-way merge was WORSE (arms
  * here are single-id, so merging degenerates to selection sort); the
  * constant-global-order gather removes the comparison cost entirely.
  */
case class SubscriptionBattery(
    preds: Seq[Expression],
    armIds: Array[Array[UTF8String]],
    actionTags: Array[String] = null,
    typeExpr: Option[Expression] = None)
  extends Expression {

  override def children: Seq[Expression] = preds ++ typeExpr.toSeq
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  @transient private lazy val tagU8: Array[UTF8String] =
    if (actionTags == null) null
    else actionTags.map(t => if (t == null) null else UTF8String.fromString(t))

  /** All (id, arm) pairs in global binary-sorted id order, computed once:
    * `globalIds(i)` is the id, `globalArm(i)` its arm index. Ties (the
    * same id in two arms — a wildcard expansion artifact) stay in stable
    * arm order, matching the old concatenate-and-sort output. */
  @transient private lazy val (globalIds, globalArm) = {
    val pairs = armIds.iterator.zipWithIndex
      .flatMap { case (ids, a) => ids.iterator.map(id => (id, a)) }
      .toArray
    java.util.Arrays.sort(pairs,
      (x: (UTF8String, Int), y: (UTF8String, Int)) => x._1.compareTo(y._1))
    (pairs.map(_._1), pairs.map(_._2))
  }

  @transient private lazy val armLens: Array[Int] = armIds.map(_.length)

  /** Arm indices grouped as (tag, indices): the no-tag group first, then
    * one group per distinct tag in first-appearance order. */
  @transient private lazy val tagGroups: Seq[(Option[String], Seq[Int])] = {
    val idx = preds.indices
    if (actionTags == null) Seq((None, idx))
    else {
      val always = idx.filter(i => actionTags(i) == null)
      val tagged = idx.filter(i => actionTags(i) != null)
        .groupBy(i => actionTags(i)).toSeq.sortBy(_._1)
        .map { case (t, is) => (Some(t), is) }
      (Option.empty[String], always) +: tagged
    }
  }

  override def eval(input: InternalRow): Any = {
    val ty: UTF8String = typeExpr match {
      case Some(e) => e.eval(input).asInstanceOf[UTF8String]
      case None => null
    }
    val matched = new Array[Boolean](preds.size)
    tagGroups.foreach { case (tag, idxs) =>
      val applies = tag match {
        case None => true
        case Some(_) => ty != null && tagU8(idxs.head).equals(ty)
      }
      if (applies) {
        idxs.foreach { i =>
          val v = preds(i).eval(input)
          if (v != null && v.asInstanceOf[Boolean]) matched(i) = true
        }
      }
    }
    new GenericArrayData(
      SubscriptionBattery.gather(globalIds, globalArm, armLens, matched))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gIdsRef = ctx.addReferenceObj("globalIds", globalIds,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val gArmRef = ctx.addReferenceObj("globalArm", globalArm, "int[]")
    val lensRef = ctx.addReferenceObj("armLens", armLens, "int[]")
    val list = ctx.freshName("batteryMatched")
    // Inside whole-stage codegen the inputs are deferred LOCAL variables,
    // so Spark's splitExpressionsWithCurrentInputs refuses to split the
    // arm blocks into helper methods — at 200 arms the fused processNext
    // lands at ~15 KB bytecode, past HotSpot's 8 000-byte JIT ceiling,
    // and the flagship hot loop runs in the bytecode interpreter
    // (measured 1.7× slower warm than the same plan with huge-method JIT
    // forced on). The fix: evaluate every input column the arms
    // reference ONCE into named locals up front, then split the arm
    // blocks ourselves, passing those locals (plus the input row, for
    // any column codegen still routed through it) as explicit helper
    // parameters — after the pre-evaluation the blocks mention only
    // stable names, which is the precondition the generic splitter
    // cannot establish for arbitrary expressions.
    val inputEval = new StringBuilder
    // A value the split helper can reference without receiving it as a
    // parameter: the java literals codegen actually folds to. Anything
    // else that fails isIdent (a compound expression) would leave the
    // helper referencing symbols it doesn't have — in that case we must
    // not split at all (splitSafe=false below), or Janino fails and the
    // WHOLE stage silently drops to interpreted execution.
    def isLiteral(s: String): Boolean =
      s == "false" || s == "true" || s == "null" ||
        s.matches("""-?\d+(\.\d+)?[DdFfLl]?""")
    def isIdent(s: String): Boolean =
      s.nonEmpty && s.head.isUnicodeIdentifierStart &&
        s.forall(c => c.isUnicodeIdentifierPart || c == '_') &&
        !isLiteral(s)
    var splitSafe = true
    val inputArgs: Seq[(String, String)] =
      if (ctx.currentVars == null) Nil
      else {
        val ords = preds.flatMap(_.collect { case b: BoundReference => b })
          .groupBy(_.ordinal).values.map(_.head).toSeq.sortBy(_.ordinal)
        ords.flatMap { b =>
          val c = b.genCode(ctx) // emits any deferred load, exactly once
          inputEval ++= c.code.toString + "\n"
          // mark the deferred load EVALUATED in the context (the same
          // mutation CodegenSupport.evaluateRequiredVariables performs):
          // the arm blocks below genCode the same BoundReferences, and
          // directly above a lazy ColumnarToRow a still-pending
          // currentVars entry would RE-EMIT the declaration inside an
          // arm — a Janino local-redefinition that silently drops the
          // whole stage to interpreted execution (caught by CodegenAudit
          // on j6_list_changes_shape, the first battery applied straight
          // onto a parquet scan with no projection in between)
          if (ctx.currentVars != null && b.ordinal < ctx.currentVars.size &&
              ctx.currentVars(b.ordinal) != null)
            ctx.currentVars(b.ordinal).code =
              org.apache.spark.sql.catalyst.expressions.codegen.EmptyBlock
          val v = c.value.toString
          val n = c.isNull.toString
          if (!isIdent(v) && !isLiteral(v)) splitSafe = false
          if (!isIdent(n) && !isLiteral(n)) splitSafe = false
          val vArg = Some((CodeGenerator.javaType(b.dataType), v))
            .filter(a => isIdent(a._2))
          val nArg = Some(("boolean", n)).filter(a => isIdent(a._2))
          vArg.toSeq ++ nArg.toSeq
        }
      }
    def armCode(i: Int): String = {
      val c = preds(i).genCode(ctx)
      s"""
         |${c.code}
         |if (!${c.isNull} && ${c.value}) {
         |  $list[$i] = true;
         |}""".stripMargin
    }
    val tyCode = typeExpr.map(_.genCode(ctx))
    val tagsRef =
      if (tagU8 == null) null
      else ctx.addReferenceObj("tags", tagU8,
        "org.apache.spark.unsafe.types.UTF8String[]")
    // named locals (not the child's ExprCode temps) so the split
    // functions can receive them as plain arguments
    val tyNullVar = ctx.freshName("tyNull")
    val tyVar = ctx.freshName("ty")
    val tyEval = tyCode.map(tc =>
      s"""
         |${tc.code}
         |boolean $tyNullVar = ${tc.isNull};
         |org.apache.spark.unsafe.types.UTF8String $tyVar =
         |  $tyNullVar ? null : ${tc.value};""".stripMargin).getOrElse("")
    val blocks = tagGroups.map { case (tag, idxs) =>
      val inner = idxs.map(armCode).mkString("\n")
      tag match {
        case Some(_) if tyCode.isDefined =>
          s"""
             |if (!$tyNullVar && $tagsRef[${idxs.head}].equals($tyVar)) {
             |$inner
             |}""".stripMargin
        case _ => inner
      }
    }
    val extraArgs = ("boolean[]", list) :: (if (tyCode.isDefined)
      List(("boolean", tyNullVar),
        ("org.apache.spark.unsafe.types.UTF8String", tyVar))
      else Nil)
    val arms =
      if (ctx.currentVars == null)
        // row-input context: the generic splitter handles this fine
        ctx.splitExpressionsWithCurrentInputs(blocks, "subBattery", extraArgs)
      else if (!splitSafe)
        // an input's ExprCode value is a compound expression the helper
        // parameter list can't carry — inline unsplit rather than emit a
        // helper with undefined symbols (Janino failure ⇒ interpreted)
        blocks.mkString("\n")
      else
        ctx.splitExpressions(blocks, "subBattery",
          extraArgs ++ inputArgs ++
            (if (ctx.INPUT_ROW != null) Seq(("InternalRow", ctx.INPUT_ROW))
             else Nil))
    ev.copy(code = code"""
      |boolean[] $list = new boolean[${preds.size}];
      |${inputEval.toString}
      |$tyEval
      |$arms
      |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
      |  new org.apache.spark.sql.catalyst.util.GenericArrayData(
      |    graft.plans.SubscriptionBattery.gather(
      |      $gIdsRef, $gArmRef, $lensRef, $list));
      |""".stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    if (typeExpr.isDefined)
      copy(preds = newChildren.dropRight(1), typeExpr = Some(newChildren.last))
    else copy(preds = newChildren)

  override def prettyName: String = "subscription_battery"
}

object SubscriptionBattery {

  /** Gather the matched arms' ids from the construction-time global sort
    * order. Called from both interpreted eval and the generated code (via
    * the static forwarder). Output size is summed from `armLens` (G adds),
    * then one boolean-indexed pass over the global id array — zero string
    * comparisons per row; zero work when nothing matched. */
  private val NoIds = new Array[AnyRef](0)

  def gather(globalIds: Array[UTF8String], globalArm: Array[Int],
      armLens: Array[Int], matched: Array[Boolean]): Array[AnyRef] = {
    var total = 0
    var a = 0
    while (a < armLens.length) {
      if (matched(a)) total += armLens(a)
      a += 1
    }
    if (total == 0) return NoIds
    val out = new Array[AnyRef](total)
    var k = 0
    var i = 0
    while (i < globalIds.length) {
      if (matched(globalArm(i))) { out(k) = globalIds(i); k += 1 }
      i += 1
    }
    out
  }
}
