package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Consistent-hash ring lookup as a native kernel: given a position key
  * (an md5 hex string), return the owner of the first vnode clockwise —
  * the smallest ring hash `>= key`, wrapping to the ring's global
  * minimum — by BINARY SEARCH over the sorted ring.
  *
  * Why an Expression and not a join (round-12 verdict task 6, measured):
  * the relational shape — `groups ⨯ broadcast(ring) → min(h >= gh) →
  * join back` — evaluates |ring| md5 comparisons per group; at 1M
  * groups × 896 vnodes that is 896M pair evaluations, measured at
  * 156 s on 32 cores, superlinear in groups and hopeless at census
  * scale (millions of topics). The ring is metadata (nodes × 128,
  * thousands of entries — the same bounded-collect class as IVF
  * centroids or the PQ codebook), so it rides into codegen as a
  * reference object and each group pays O(log |ring|) UTF8String
  * comparisons in one narrow projection: no crossJoin, no
  * re-aggregation, no join back.
  *
  * Comparison order parity: ring hashes and keys are lowercase-hex
  * md5 strings; `UTF8String.compareTo` is unsigned byte order, which
  * on them is identical to Spark SQL's string `>=` and to the DuckDB
  * oracle's varchar comparison — so the kernel picks byte-for-byte the
  * same owner as the relational formula it replaces (differential spec
  * in `MusterSpec`). A NULL key (a null group) resolves to the ring's
  * global minimum owner, matching the old formula's `coalesce(above,
  * wrapmin)` behavior under null comparisons. */
case class RingOwner(child: Expression, hashes: Array[UTF8String],
    nodes: Array[UTF8String]) extends UnaryExpression {

  require(hashes.nonEmpty, "empty ring")
  require(hashes.length == nodes.length, "ring hash/node length mismatch")

  override def dataType: DataType = StringType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ring_owner expects a string key, got ${child.dataType.catalogString}")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    RingOwner.owner(v.asInstanceOf[UTF8String], hashes, nodes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val hRef = ctx.addReferenceObj("ringHashes", hashes,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val nRef = ctx.addReferenceObj("ringNodes", nodes,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      |${c.code}
      |UTF8String ${ev.value} = graft.plans.RingOwner.owner(
      |  ${c.isNull} ? null : ${c.value}, $hRef, $nRef);""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "ring_owner"
}

object RingOwner {

  /** First ring entry clockwise from `key` (smallest hash >= key; wrap
    * to index 0 of the sorted ring). Null key → global minimum owner. */
  def owner(key: UTF8String, hashes: Array[UTF8String],
      nodes: Array[UTF8String]): UTF8String = {
    if (key == null) return nodes(0)
    var lo = 0
    var hi = hashes.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (hashes(mid).compareTo(key) < 0) lo = mid + 1 else hi = mid
    }
    nodes(if (lo == hashes.length) 0 else lo)
  }

  /** Column-API entry: `key` is the md5-hex position column; the ring is
    * (hash, node) pairs, NOT required pre-sorted. */
  def of(key: org.apache.spark.sql.Column,
      ring: Seq[(String, String)]): org.apache.spark.sql.Column = {
    val sorted = ring.sortBy(_._1)
    org.apache.spark.sql.graft.ColumnBridge.column(RingOwner(
      org.apache.spark.sql.graft.ColumnBridge.expression(key),
      sorted.map(p => UTF8String.fromString(p._1)).toArray,
      sorted.map(p => UTF8String.fromString(p._2)).toArray))
  }
}
