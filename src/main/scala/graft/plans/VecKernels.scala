package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Fixed-dimension dot product of two array<double> columns as a native
  * loop kernel.
  *
  * Why an Expression and not the unrolled
  * `(1 to dim).map(i => element_at(x,i) * element_at(y,i)).reduce(_ + _)`
  * form ([[graft.pipeline.Similarity.dotFixed]]'s original body): each
  * `element_at` emits its own null/bounds block, so a dim=64 dot fused
  * into a scoring projection generates a ~20 KB method — over HotSpot's
  * 8 000-byte JIT ceiling, leaving the O(|Q|·|C|) pair loop running in
  * the bytecode interpreter (CodegenAudit flagged 7 registered queries).
  * Here the sum is a static loop shared by eval and codegen: constant
  * generated-code size in dim, same left-associated float addition order
  * ⇒ bit-identical doubles (differential-tested in VecKernelsSpec).
  *
  * Null semantics mirror the unrolled form on every reachable input: a
  * null array, an array shorter than `dim`, or a null element within the
  * first `dim` positions yields null (upstream casts guarantee dense
  * dim-length vectors in practice). */
case class DotFixed(left: Expression, right: Expression, dim: Int)
  extends BinaryExpression with BinaryLike[Expression] {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() < dim || y.numElements() < dim ||
        DotFixed.hasNull(x, y, dim)) null
    else DotFixed.dot(x, y, dim)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"""if ($x.numElements() < $dim || $y.numElements() < $dim ||
         |    graft.plans.DotFixed.hasNull($x, $y, $dim)) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.plans.DotFixed.dot($x, $y, $dim);
         |}""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_fixed"
}

object DotFixed {

  /** True when either array holds a null within the first dim slots. */
  def hasNull(x: ArrayData, y: ArrayData, dim: Int): Boolean = {
    var i = 0
    while (i < dim) {
      if (x.isNullAt(i) || y.isNullAt(i)) return true
      i += 1
    }
    false
  }

  /** Sequential left-associated sum — bit-identical to the unrolled
    * `reduce(_ + _)` chain (IEEE addition in the same order). */
  def dot(x: ArrayData, y: ArrayData, dim: Int): Double = {
    var s = 0.0
    var i = 0
    while (i < dim) {
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }
}

/** Signed-projection kernel: maps an integerized array<long> vector of
  * length `dIn` to `dOut` components, component j being the exact
  * integer sum Σᵢ v[i]·sign(j,i) with a constant ±1 sign matrix (the
  * Johnson–Lindenstrauss sign projection of
  * [[graft.pipeline.Similarity.randomProject]]).
  *
  * Why an Expression: unrolled, the dOut·dIn (=1024 at 64→16) signed
  * terms generate a 56 KB method — unJITtable and two expressions away
  * from Janino's 64 KB compile cliff. The sign matrix rides along as one
  * flat byte[] reference; the kernel is exact long arithmetic, so
  * summation order cannot change results (no float concerns). Null
  * semantics mirror the unrolled form: null array, short array, or null
  * element ⇒ null result. */
case class SignProject(child: Expression, signs: Array[Byte],
    dIn: Int, dOut: Int)
  extends UnaryExpression with UnaryLike[Expression] {

  require(signs.length == dIn * dOut,
    s"signs length ${signs.length} != dIn*dOut = ${dIn * dOut}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() < dIn || SignProject.hasNull(v, dIn)) null
    else new GenericArrayData(SignProject.project(v, signs, dIn, dOut))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("rpSigns", signs, "byte[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"""if ($v.numElements() < $dIn ||
         |    graft.plans.SignProject.hasNull($v, $dIn)) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    graft.plans.SignProject.project($v, $signsRef, $dIn, $dOut));
         |}""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "sign_project"
}

object SignProject {

  def hasNull(v: ArrayData, dIn: Int): Boolean = {
    var i = 0
    while (i < dIn) {
      if (v.isNullAt(i)) return true
      i += 1
    }
    false
  }

  def project(v: ArrayData, signs: Array[Byte], dIn: Int, dOut: Int)
      : Array[Long] = {
    val out = new Array[Long](dOut)
    var j = 0
    while (j < dOut) {
      val base = j * dIn
      var s = 0L
      var i = 0
      while (i < dIn) {
        s += v.getLong(i) * signs(base + i)
        i += 1
      }
      out(j) = s
      j += 1
    }
    out
  }
}
