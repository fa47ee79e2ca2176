package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Asymmetric-distance computation (ADC) for PQ top-k as a native loop
  * kernel: given a query vector (array<double>, length ≥ m·subDim) and a
  * corpus row's PQ codes (array<int>, length ≥ m, each in [0, K)), the
  * squared-L2 distance of the query to the codebook reconstruction —
  * Σ_mm Σ_i (q[mm·subDim+i] − cb[mm][code_mm][i])².
  *
  * Why an Expression and not the unrolled Column form
  * ([[graft.pipeline.Similarity.pqTopK]]'s original ADC body — m·subDim
  * squared-diff terms, each re-deriving its codebook element through a
  * nested `element_at(element_at(literal, code+1), i)` chain): the
  * lookup chain materializes per TERM, so every scored (query, code)
  * row pays m·subDim literal-array traversals plus their null/bounds
  * blocks — SimProbe measured the PQ scan as the slowest ANN query
  * stage at 1M (12–15 s for 2.45×10⁸ scored rows) with the arithmetic
  * worth ~2 s. Here the codebook rides along as one flat double[]
  * reference and both eval and generated code call a single static
  * loop: constant code size in m, K, and subDim (a K=256 production
  * codebook codegens the same as the K=16 oracle-checked default).
  *
  * Float semantics are bit-identical to the unrolled form: the inner
  * subvector sum is the left-associated sequential (d²+d²)+… chain, and
  * the cross-subvector total is the left-associated sum of the m
  * subtotals ((0.0+x) ≡ x bitwise — a sum of squares is never −0.0);
  * differential-tested in PqAdcSpec against the exact Column chain it
  * replaces.
  *
  * Null semantics mirror the unrolled form on every REACHABLE input —
  * [[PqEncode]] emits either a valid length-m code array in [0, K) or
  * null, so the pipeline only ever produces null-query/null-codes rows
  * (null distance in both forms). Degenerate inputs unreachable from
  * that pipeline (short arrays, codes outside [0, K), null elements)
  * yield null here where the ANSI-mode `element_at` chain would throw
  * INVALID_ARRAY_INDEX — defensive, strictly more lenient. */
case class PqAdc(
    left: Expression, right: Expression,
    codebook: Array[Double], // flat (mm·K + kk)·subDim + i layout
    m: Int, k: Int, subDim: Int)
  extends BinaryExpression with BinaryLike[Expression] {

  require(codebook.length == m * k * subDim,
    s"codebook length ${codebook.length} != m*k*subDim = ${m * k * subDim}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(q: Any, c: Any): Any = {
    val qv = q.asInstanceOf[ArrayData]
    val codes = c.asInstanceOf[ArrayData]
    if (PqAdc.invalid(qv, codes, m, k, subDim)) null
    else PqAdc.adist(qv, codes, codebook, m, k, subDim)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("adcCodebook", codebook, "double[]")
    nullSafeCodeGen(ctx, ev, (qv, codes) =>
      s"""if (graft.plans.PqAdc.invalid($qv, $codes, $m, $k, $subDim)) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} =
         |    graft.plans.PqAdc.adist($qv, $codes, $cbRef, $m, $k, $subDim);
         |}""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "pq_adc"
}

object PqAdc {

  /** True when the pair cannot produce a distance: short/null-holding
    * query or codes, or a code index outside the codebook. */
  def invalid(qv: ArrayData, codes: ArrayData,
      m: Int, k: Int, subDim: Int): Boolean = {
    if (qv.numElements() < m * subDim || codes.numElements() < m ||
        PqEncode.hasNull(qv, m * subDim) || PqEncode.hasNull(codes, m))
      return true
    var mm = 0
    while (mm < m) {
      val code = codes.getInt(mm)
      if (code < 0 || code >= k) return true
      mm += 1
    }
    false
  }

  /** The ADC kernel, shared by interpreted eval and generated code —
    * same summation order as the unrolled Column chain. */
  def adist(qv: ArrayData, codes: ArrayData, cb: Array[Double],
      m: Int, k: Int, subDim: Int): Double = {
    var total = 0.0
    var mm = 0
    while (mm < m) {
      val base = (mm * k + codes.getInt(mm)) * subDim
      val off = mm * subDim
      var s = 0.0
      var i = 0
      while (i < subDim) {
        val dlt = qv.getDouble(off + i) - cb(base + i)
        s += dlt * dlt
        i += 1
      }
      total += s
      mm += 1
    }
    total
  }
}
