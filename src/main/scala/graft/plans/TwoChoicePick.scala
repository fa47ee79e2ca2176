package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Rendezvous top-2 node draw + less-loaded pick as a native kernel:
  * for a tenant key, find the two nodes with the smallest
  * `md5(tenant:node)` rank and assign the less loaded of the pair
  * (tie → the rank-1 draw), in one running-top-2 sweep over the node
  * list carried into codegen as reference objects.
  *
  * Why an Expression and not the crossJoin+window it replaces
  * (`Muster.twoChoicePlacement`'s original shape, measured r12):
  * `tenants ⨯ broadcast(nodes) → row_number() over (partition by
  * tenant order by md5(...))` materializes |tenants|·|nodes| rows
  * through a per-tenant SORT and a re-aggregation — 1M tenants × 300
  * nodes ran 111.8 s on 32 cores and grows superlinearly with the node
  * count. The node dimension (names + loads) is cluster-membership
  * metadata — the same bounded-collect class as the consistent-hash
  * ring in [[RingOwner]] — so each tenant pays |nodes| digests in one
  * narrow projection with zero extra rows, no sort, no shuffle beyond
  * the tenant `distinct` the caller already does.
  *
  * Oracle parity: the SQL formula orders by the lowercase-hex md5
  * STRING; this kernel compares raw 16-byte digests in unsigned byte
  * order, which is the same total order (fixed-width lowercase hex is
  * monotone in the digest bytes). The pick rule mirrors the relational
  * `when(load1 <= coalesce(load2, load1), node1).otherwise(node2)`
  * exactly, including its null-load branches (null load1 → node2;
  * null/absent load2 → node1). A null tenant yields a null struct (the
  * replaced window form gave an arbitrary ranking under a null sort
  * key — this is the one deliberate tightening, spec'd in MusterSpec).
  *
  * Reference: /root/reference/lib/realtime/nodes.ex:117-185 — the
  * two-candidate draw contract this implements; see
  * `Muster.twoChoicePlacement` for the semantics discussion. */
case class TwoChoicePick(child: Expression, nodes: Array[UTF8String],
    suffixes: Array[Array[Byte]], loads: Array[Double],
    loadNull: Array[Boolean]) extends UnaryExpression {

  require(nodes.nonEmpty, "empty node list")
  require(nodes.length == suffixes.length && nodes.length == loads.length &&
    nodes.length == loadNull.length, "node metadata length mismatch")

  override def dataType: DataType = TwoChoicePick.resultType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"two_choice_pick expects a string tenant, got ${child.dataType.catalogString}")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    TwoChoicePick.pick(v.asInstanceOf[UTF8String], nodes, suffixes,
      loads, loadNull)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val nRef = ctx.addReferenceObj("tcNodes", nodes,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val sRef = ctx.addReferenceObj("tcSuffixes", suffixes, "byte[][]")
    val lRef = ctx.addReferenceObj("tcLoads", loads, "double[]")
    val mRef = ctx.addReferenceObj("tcLoadNull", loadNull, "boolean[]")
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      |${c.code}
      |InternalRow ${ev.value} = graft.plans.TwoChoicePick.pick(
      |  ${c.isNull} ? null : ${c.value}, $nRef, $sRef, $lRef, $mRef);
      |boolean ${ev.isNull} = ${ev.value} == null;""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "two_choice_pick"
}

object TwoChoicePick {

  val resultType: StructType = StructType(Seq(
    StructField("node1", StringType), StructField("node2", StringType),
    StructField("assigned", StringType)))

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  // three 16-byte digest buffers per thread (current, best1, best2) —
  // the sweep swaps references instead of allocating per node
  private val scratch = new ThreadLocal[Array[Array[Byte]]] {
    override def initialValue(): Array[Array[Byte]] =
      Array.fill(3)(new Array[Byte](16))
  }

  /** Unsigned lexicographic compare of two 16-byte digests — the same
    * total order as comparing their lowercase-hex renderings. */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** One running-top-2 sweep. Returns `(node1, node2, assigned)` or
    * null for a null tenant. Node list order does not affect the result
    * except on exact digest ties (duplicate node names), where the
    * earlier entry wins rank 1 — callers pass a name-sorted list. */
  def pick(tenant: UTF8String, nodes: Array[UTF8String],
      suffixes: Array[Array[Byte]], loads: Array[Double],
      loadNull: Array[Boolean]): InternalRow = {
    if (tenant == null) return null
    val md = mdLocal.get()
    val bufs = scratch.get()
    var cur = bufs(0)
    var b1 = bufs(1)
    var b2 = bufs(2)
    val tb = tenant.getBytes
    var i1 = -1
    var i2 = -1
    var i = 0
    while (i < nodes.length) {
      md.reset()
      md.update(tb)
      md.update(suffixes(i))
      md.digest(cur, 0, 16)
      if (i1 < 0 || less(cur, b1)) {
        val t = b2; b2 = b1; i2 = i1; b1 = cur; i1 = i; cur = t
      } else if (i2 < 0 || less(cur, b2)) {
        val t = b2; b2 = cur; i2 = i; cur = t
      }
      i += 1
    }
    bufs(0) = cur; bufs(1) = b1; bufs(2) = b2
    val node1 = nodes(i1)
    val node2 = if (i2 < 0) null else nodes(i2)
    // when(load1 <= coalesce(load2, load1), node1).otherwise(node2):
    // null load1 -> the `when` is null -> node2 (null if single-node);
    // absent or null load2 -> coalesce falls back to load1 -> node1
    val assigned =
      if (loadNull(i1)) node2
      else if (i2 < 0 || loadNull(i2)) node1
      else if (loads(i1) <= loads(i2)) node1
      else node2
    new GenericInternalRow(Array[Any](node1, node2, assigned))
  }

  /** Column-API entry: `tenant` is the tenant key column; `nodeMeta` is
    * (name, load) metadata, load None for SQL NULL. Sorted by name here
    * for a deterministic duplicate-name tie-break. */
  def of(tenant: org.apache.spark.sql.Column,
      nodeMeta: Seq[(String, Option[Double])]): org.apache.spark.sql.Column = {
    val sorted = nodeMeta.sortBy(_._1)
    org.apache.spark.sql.graft.ColumnBridge.column(TwoChoicePick(
      org.apache.spark.sql.graft.ColumnBridge.expression(tenant),
      sorted.map(p => UTF8String.fromString(p._1)).toArray,
      sorted.map(p => (":" + p._1)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray,
      sorted.map(_._2.getOrElse(0.0)).toArray,
      sorted.map(_._2.isEmpty).toArray))
  }
}
