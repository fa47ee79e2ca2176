package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
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

/** Cast-to-double + L2-normalize of a numeric array as ONE native loop
  * kernel: out[i] = d[i] / sqrt(Σ d[i]²) with d[i] the double cast of
  * element i and the norm sum left-associated.
  *
  * Why an Expression and not the
  * `transform(cast) → sqrt(aggregate(zip_with)) → transform(divide)`
  * Column chain ([[graft.pipeline.Similarity.normalized]]'s original
  * body): higher-order functions are CodegenFallback — the chain runs in
  * the INTERPRETED evaluator with per-lambda-call overhead and three
  * array allocations per row, and it sits under every vector operator's
  * hottest column. Worse, when a downstream join keys on a derived
  * column (the IVF bucket), constraint propagation substitutes the whole
  * defining chain into scan-level filters, silently evaluating it twice
  * per row. As a kernel the work is one compiled pass and one output
  * array; evaluating it twice costs microseconds.
  *
  * Float semantics are bit-identical to the chain: float→double cast is
  * exact, the norm is the same left-associated sum of products, and each
  * element divides by the same double (differential-tested in
  * VecKernelsSpec). Null semantics: a null array ⇒ null; an array with a
  * null element ⇒ null (the chain produced an array of null ELEMENTS
  * there — unreachable for the dense corpus casts; the kernel's whole-
  * array null is the fail-closed reading). The length is taken from the
  * input (no fixed dim), so one kernel serves every dimension. */
case class NormalizeVec(child: Expression)
  extends UnaryExpression with UnaryLike[Expression] {

  // resolved lazily: at construction the child may still be an
  // unresolved attribute whose dataType is not yet known
  @transient private lazy val fromFloat: Boolean = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"normalize_vec expects array<float|double>, got $t")
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"normalize_vec expects array<float|double>, got $t")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    NormalizeVec.normalize(input.asInstanceOf[ArrayData], fromFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  graft.plans.NormalizeVec.normalize($v, $fromFloat);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "normalize_vec"
}

object NormalizeVec {

  /** One-pass cast+norm+divide; null on any null element. Returns null
    * (not an exception) so the generated code can branch on it. */
  def normalize(v: ArrayData, fromFloat: Boolean): GenericArrayData = {
    val n = v.numElements()
    val d = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      d(i) = if (fromFloat) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    var s = 0.0
    i = 0
    while (i < n) { s += d(i) * d(i); i += 1 }
    val norm = math.sqrt(s)
    val out = new Array[Any](n)
    i = 0
    while (i < n) { out(i) = d(i) / norm; i += 1 }
    new GenericArrayData(out)
  }
}

/** Nearest-centroid assignment as a native loop kernel: for an input
  * array<double> vector, the id of the centroid (rows of a constant,
  * pre-normalized `k`×`dim` matrix, sorted by id) with the LARGEST
  * left-associated dot product, ties to the lowest id.
  *
  * Why an Expression and not the crossJoin(broadcast(cents)) +
  * row_number window it replaces ([[graft.pipeline.Similarity
  * .assignBuckets]]'s original body): the join materializes n·k rows and
  * the window hash-partitions and sorts ALL of them just to keep one row
  * per vector — with the IVF scale rule k ~ √n that is an n^1.5-row
  * exchange, 31.6× shuffled rows at every 10× of corpus (the round-9
  * probe's `sim_ann_ivf` 4.9× was exactly this). Here the centroid
  * matrix rides along as one flat double[] reference object and the
  * assignment is a single narrow codegen'd projection: zero extra rows,
  * zero exchange, work k·dim flops per vector.
  *
  * Float semantics match the window form bit-for-bit: per-centroid score
  * is [[DotFixed.dot]] (the same left-associated sum `pairDot` produced
  * for the window's `cos`), and the scan keeps the first
  * strictly-greater entry via [[java.lang.Double.compare]] — exactly
  * `ORDER BY cos DESC, centroid_id ASC` row_number()=1 under Spark's
  * NaN-greatest double ordering (differential-tested in VecKernelsSpec).
  *
  * The output is declared NON-nullable with a −1 sentinel for a
  * null/short/null-element vector (no real centroid id is negative:
  * ids come from non-negative row ids or bucket ordinals). Returning
  * null here is not an option for plan reasons, not semantic ones:
  * joining on the bucket makes Catalyst infer `isnotnull(bucket)` and
  * push a Filter evaluating THIS WHOLE EXPRESSION — including the
  * interpreted normalize-HOF chain under it — below the projection on
  * BOTH join sides, doubling per-row work and running it in the
  * interpreted evaluator (measured: the sf1 in-bucket pair scan went
  * 6.5 s → 33 s on exactly that inferred filter). A non-nullable
  * output makes the inferred filter never exist. */
case class ArgmaxDot(child: Expression, matrix: Array[Double],
    ids: Array[Long], k: Int, dim: Int)
  extends UnaryExpression with UnaryLike[Expression] {

  require(matrix.length == k * dim,
    s"matrix length ${matrix.length} != k*dim = ${k * dim}")
  require(ids.length == k, s"ids length ${ids.length} != k = $k")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val c = child.eval(input)
    if (c == null) ArgmaxDot.Invalid
    else {
      val v = c.asInstanceOf[ArrayData]
      if (v.numElements() < dim || SignProject.hasNull(v, dim))
        ArgmaxDot.Invalid
      else ArgmaxDot.assign(v, matrix, ids, k, dim)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("centMatrix", matrix, "double[]")
    val idsRef = ctx.addReferenceObj("centIds", ids, "long[]")
    val c = child.genCode(ctx)
    // -1L inlined: a Scala object val has no Java static-field form the
    // generated code could name (only a forwarder METHOD on the class)
    ev.copy(code = code"""
      |${c.code}
      |long ${ev.value} = -1L; /* ArgmaxDot.Invalid */
      |if (!${c.isNull} && ${c.value}.numElements() >= $dim &&
      |    !graft.plans.SignProject.hasNull(${c.value}, $dim)) {
      |  ${ev.value} = graft.plans.ArgmaxDot.assign(
      |    ${c.value}, $mRef, $idsRef, $k, $dim);
      |}""".stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "argmax_dot"
}

object ArgmaxDot {

  /** Sentinel bucket for an invalid (null-element / too-short) vector. */
  val Invalid: Long = -1L

  /** First-strictly-greater argmax scan over left-associated dots —
    * identical doubles and tie-breaks to `row_number() OVER (ORDER BY
    * cos DESC, centroid_id ASC) = 1` with ids pre-sorted ascending. */
  def assign(v: ArrayData, m: Array[Double], ids: Array[Long],
      k: Int, dim: Int): Long = {
    var bestId = 0L
    var bestS = Double.NaN
    var kk = 0
    while (kk < k) {
      val base = kk * dim
      var s = 0.0
      var i = 0
      while (i < dim) {
        s += v.getDouble(i) * m(base + i)
        i += 1
      }
      if (kk == 0 || java.lang.Double.compare(s, bestS) > 0) {
        bestS = s; bestId = ids(kk)
      }
      kk += 1
    }
    bestId
  }
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
