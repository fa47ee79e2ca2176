package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Majority-vote bit packing for SimHash signatures: bit b of the result
  * is set iff `counts[b] * 2 > n` — the per-bit majority over `n` word
  * hashes ([[graft.pipeline.Dedup.simhashDF]]'s final projection).
  *
  * Why an Expression: unrolled, the 60 `when(b*2 > n, 1L<<b)` arms emit
  * ~11.5 KB of fused method — over HotSpot's 8 000-byte JIT ceiling
  * (CodegenAudit catch), so the signature projection ran in the bytecode
  * interpreter. Exact integer arithmetic ⇒ identical results by
  * construction. Null semantics mirror the `when/otherwise(0L)` arms: a
  * null count contributes bit 0; the count array itself and `n` are
  * non-null by construction (aggregate outputs over non-empty groups) but
  * a null input yields null via the standard null-safe wrapper. */
case class MajorityPack(left: Expression, right: Expression, bits: Int)
  extends BinaryExpression with BinaryLike[Expression] {

  require(bits >= 1 && bits <= 63, s"bits must be 1..63, got $bits")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override protected def nullSafeEval(countsAny: Any, nAny: Any): Any =
    MajorityPack.pack(countsAny.asInstanceOf[ArrayData],
      nAny.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (counts, n) =>
      s"${ev.value} = graft.plans.MajorityPack.pack($counts, $n, $bits);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "majority_pack"
}

object MajorityPack {
  def pack(counts: ArrayData, n: Long, bits: Int): Long = {
    val lim = math.min(bits, counts.numElements())
    var s = 0L
    var b = 0
    while (b < lim) {
      // null count == un-set bit, matching when(null…).otherwise(0L)
      if (!counts.isNullAt(b) && counts.getLong(b) * 2 > n) s |= 1L << b
      b += 1
    }
    s
  }
}

/** Sign-bit word extraction for binary embedding signatures: bit i of the
  * result is set iff component `off + i` of the array<double> input is
  * positive ([[graft.pipeline.Similarity.binarySignature]]'s `word`).
  *
  * Why an Expression: the unrolled 32-arm
  * `when(element_at(v, off+i+1) > 0, 1L<<i)` chain ×2 words generated a
  * ~17 KB fused method (CodegenAudit catch). The kernel also subsumes the
  * zero-padding of short vectors: a component beyond the array's end —
  * like a null or non-positive component — leaves its bit unset, exactly
  * the padded form's arithmetic. NaN compares greater-than-zero, matching
  * Spark's NaN-is-largest comparison semantics (unreachable from the
  * finite synthesized embeddings, pinned for safety). */
case class SignBits(child: Expression, off: Int, width: Int = 32)
  extends UnaryExpression with UnaryLike[Expression] {

  require(width >= 1 && width <= 63, s"width must be 1..63, got $width")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    SignBits.word(input.asInstanceOf[ArrayData], off, width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.plans.SignBits.word($v, $off, $width);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "sign_bits"
}

object SignBits {
  def word(v: ArrayData, off: Int, width: Int): Long = {
    val n = v.numElements()
    var s = 0L
    var i = 0
    while (i < width) {
      val idx = off + i
      if (idx < n && !v.isNullAt(idx)) {
        val x = v.getDouble(idx)
        // NaN sorts above zero in Spark comparisons
        if (x > 0 || java.lang.Double.isNaN(x)) s |= 1L << i
      }
      i += 1
    }
    s
  }
}
