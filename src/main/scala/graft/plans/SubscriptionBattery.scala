package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
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
  * Semantics identical to the HOF form (differential-tested): a NULL
  * predicate is not-matched (SQL three-valued logic folded to false), the
  * result is never null, and ids are globally sorted (binary UTF8 order,
  * same as `array_sort`).
  */
case class SubscriptionBattery(
    preds: Seq[Expression],
    armIds: Array[Array[UTF8String]])
  extends Expression {

  override def children: Seq[Expression] = preds
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val buf = new java.util.ArrayList[Object]()
    var i = 0
    while (i < preds.length) {
      val v = preds(i).eval(input)
      if (v != null && v.asInstanceOf[Boolean]) {
        val ids = armIds(i)
        var j = 0
        while (j < ids.length) { buf.add(ids(j)); j += 1 }
      }
      i += 1
    }
    val arr = buf.toArray
    java.util.Arrays.sort(arr)
    new GenericArrayData(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("armIds", armIds,
      "org.apache.spark.unsafe.types.UTF8String[][]")
    val list = ctx.freshName("batteryIds")
    val armCodes = preds.zipWithIndex.map { case (p, i) =>
      val c = p.genCode(ctx)
      s"""
         |${c.code}
         |if (!${c.isNull} && ${c.value}) {
         |  java.util.Collections.addAll($list, (Object[]) $idsRef[$i]);
         |}""".stripMargin
    }
    val arms = ctx.splitExpressionsWithCurrentInputs(armCodes, "subBattery",
      ("java.util.ArrayList", list) :: Nil)
    val arr = ctx.freshName("batteryArr")
    ev.copy(code = code"""
      |java.util.ArrayList $list = new java.util.ArrayList();
      |$arms
      |Object[] $arr = $list.toArray();
      |java.util.Arrays.sort($arr);
      |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
      |  new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
      |""".stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(preds = newChildren)

  override def prettyName: String = "subscription_battery"
}
