package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitter sketch as a native Catalyst aggregate: at most
  * `capacity` (key, residual-count) entries of bounded memory, regardless
  * of how many distinct keys the input holds.
  *
  * Why this exists: the exact alternative ([[graft.pipeline.Profile.keySkew]])
  * shuffles EVERY distinct key through a groupBy — at 100 TB with a
  * high-cardinality key that shuffle is the job. This sketch keeps O(k)
  * state per partition (partial aggregation), merges buffers with the
  * Agarwal et al. "Mergeable Summaries" rule (SIGMOD'12: sum counters,
  * then subtract the (k+1)-th largest and drop ≤0), and ships only
  * k-entry buffers to the final aggregation — no per-key shuffle at all.
  *
  * Guarantee (standard MG bound, preserved by the merge rule): every key
  * with true count > n/(capacity+1) is present in the final sketch, and
  * each surviving residual undercounts its true count by at most
  * n/(capacity+1). The candidate SET can depend on partition/merge order
  * for keys below the bound — which is why
  * [[graft.pipeline.Profile.heavyHitters]] re-counts candidates exactly
  * in a second pass and thresholds on the exact counts, making the final
  * answer deterministic and oracle-checkable.
  *
  * Input must be a string column (cast upstream); null keys are ignored
  * (SQL aggregate convention). Output is `array<struct<key,cnt>>` sorted
  * by residual desc, key asc — deterministic for a given buffer state.
  */
case class MisraGries(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  require(capacity >= 1, s"capacity must be >= 1, got $capacity")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"misra_gries requires a string key, got ${child.dataType.catalogString}")
  override def nullable: Boolean = false
  override def dataType: DataType = MisraGries.resultType

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val k = child.eval(input).asInstanceOf[UTF8String]
    if (k != null) {
      buf.get(k) match {
        case Some(v) => buf.update(k, v + 1)
        case None =>
          if (buf.size < capacity) {
            // clone: the UTF8String points into a reused unsafe-row buffer
            buf.update(k.clone(), 1L)
          } else {
            // full and unseen: the classic decrement-all step — the new
            // key is absorbed into the k simultaneous decrements
            buf.mapValuesInPlace((_, v) => v - 1)
            buf.filterInPlace((_, v) => v > 0)
          }
      }
    }
    buf
  }

  override def merge(
      a: mutable.HashMap[UTF8String, Long],
      b: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    b.foreach { case (k, v) => a.update(k, a.getOrElse(k, 0L) + v) }
    if (a.size > capacity) {
      // mergeable-summaries reduction: subtract the (capacity+1)-th
      // largest residual from everything; strictly-greater entries (at
      // most `capacity` of them) survive
      val cut = a.values.toArray.sortInPlaceWith(_ > _).apply(capacity)
      a.mapValuesInPlace((_, v) => v - cut)
      a.filterInPlace((_, v) => v > 0)
    }
    a
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val entries = buf.toArray
    java.util.Arrays.sort(entries, MisraGries.entryOrder)
    new GenericArrayData(entries.map { case (k, v) =>
      new GenericInternalRow(Array[Any](k, v))
    })
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, v) =>
      val bytes = k.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(v)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val kb = new Array[Byte](len)
      in.readFully(kb)
      buf.update(UTF8String.fromBytes(kb), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)

  override def prettyName: String = "misra_gries"
}

object MisraGries {
  val resultType: DataType = ArrayType(
    StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  private val entryOrder: java.util.Comparator[(UTF8String, Long)] =
    new java.util.Comparator[(UTF8String, Long)] {
      override def compare(a: (UTF8String, Long), b: (UTF8String, Long)): Int = {
        val c = java.lang.Long.compare(b._2, a._2)
        if (c != 0) c else a._1.compareTo(b._1)
      }
    }
}
