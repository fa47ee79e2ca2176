package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Product-quantization encoder as a native codegen'd expression: for each
  * of `m` subvectors of the input (array<double>, length m·subDim), the
  * argmin codeword index over a constant codebook by squared-L2 distance,
  * ties to the lowest index. Output: array<int> of m codes.
  *
  * Why an Expression and not the unrolled Column form ([[graft.pipeline
  * .Similarity.pqTopK]]'s original `array_min(array(struct(d, k)…))`
  * battery): unrolling m·K codewords of subDim squared-diff terms emits
  * m·K·subDim (= 1024 at the default 4·16·16) arithmetic subexpressions,
  * and the fused whole-stage-codegen method blows the JVM's 64 KB method
  * limit ("Code grows beyond 64 KB"), dropping the ENCODE stage — the one
  * full corpus pass — to interpreted eval. Here the codebook rides along
  * as one flat double[] reference object and both eval and the generated
  * code call a single static loop kernel: generated code size is constant
  * in m, K, and subDim, so K=256 production codebooks codegen the same as
  * the K=16 oracle-checked default.
  *
  * Float semantics are bit-identical to the unrolled form: per-codeword
  * distance is the left-associated sequential sum of (x[i]-c[i])², and
  * the argmin scan keeps the first (= lowest k) strictly-smaller entry —
  * exactly `array_min` over struct(d, k) lexicographic order. NaN (only
  * reachable from NaN/Inf inputs) compares largest via
  * [[java.lang.Double.compare]], matching Spark's double ordering; -0.0
  * cannot arise from a sum of squares.
  *
  * Null semantics mirror [[DotFixed]]: a null vector, a vector shorter
  * than m·subDim, or a null element within the first m·subDim positions
  * yields a null result — the same degradation the original unrolled
  * `element_at` form had, instead of an out-of-bounds read. */
case class PqEncode(
    child: Expression,
    codebook: Array[Double], // flat (mm·K + kk)·subDim + i layout
    m: Int, k: Int, subDim: Int)
  extends UnaryExpression with UnaryLike[Expression] {

  require(codebook.length == m * k * subDim,
    s"codebook length ${codebook.length} != m*k*subDim = ${m * k * subDim}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    if (vec.numElements() < m * subDim || PqEncode.hasNull(vec, m * subDim)) null
    else new GenericArrayData(PqEncode.encode(vec, codebook, m, k, subDim))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
    val need = m * subDim
    nullSafeCodeGen(ctx, ev, vec =>
      s"""if ($vec.numElements() < $need ||
         |    graft.plans.PqEncode.hasNull($vec, $need)) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    graft.plans.PqEncode.encode($vec, $cbRef, $m, $k, $subDim));
         |}""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "pq_encode"
}

object PqEncode {

  /** True when the vector holds a null within the first `need` slots. */
  def hasNull(vec: ArrayData, need: Int): Boolean = {
    var i = 0
    while (i < need) {
      if (vec.isNullAt(i)) return true
      i += 1
    }
    false
  }

  /** The encode kernel, shared by interpreted eval and generated code.
    * Sequential (left-associated) inner sum; first-strictly-smaller argmin
    * scan via Double.compare ⇒ identical doubles and identical tie-breaks
    * to the unrolled `array_min(array(struct(…)))` Column form
    * (differential-tested in PqEncodeSpec). */
  def encode(vec: ArrayData, cb: Array[Double],
      m: Int, k: Int, subDim: Int): Array[Int] = {
    val codes = new Array[Int](m)
    var mm = 0
    while (mm < m) {
      val off = mm * subDim
      var bestK = 0
      var bestD = Double.NaN
      var kk = 0
      while (kk < k) {
        val base = (mm * k + kk) * subDim
        var s = 0.0
        var i = 0
        while (i < subDim) {
          val dlt = vec.getDouble(off + i) - cb(base + i)
          s += dlt * dlt
          i += 1
        }
        if (kk == 0 || java.lang.Double.compare(s, bestD) < 0) {
          bestD = s; bestK = kk
        }
        kk += 1
      }
      codes(mm) = bestK
      mm += 1
    }
    codes
  }
}
