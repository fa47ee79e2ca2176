package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** PqAdc (the loop-kernel ADC distance) vs the unrolled
  * element_at(element_at(literal, code+1), i) Column chain it replaced:
  * the two must agree bit-for-bit — the unrolled form IS the
  * oracle-checked semantics (`sim_ann_pq`'s DuckDB SQL replays its
  * doubles), and the kernel exists because the chain re-derives the
  * codebook lookup per squared-diff TERM (m·subDim literal traversals
  * per scored row — SimProbe's slowest ANN query stage at 1M). */
class PqAdcSpec extends SparkSpec {
  import spark.implicits._

  private val m = 4
  private val k = 8
  private val subDim = 8
  private val dim = m * subDim

  private def vec(id: Long): Seq[Double] =
    (0 until dim).map { i =>
      val s = (id % 7) * 17 + i * 11
      ((s * 2654435761L) % 2001 - 1000) / 1000.0
    }

  private val cb: Array[Array[Array[Double]]] =
    Array.tabulate(m, k)((mm, kk) =>
      vec(100L + kk).slice(mm * subDim, (mm + 1) * subDim).toArray)

  private val cbFlat: Array[Double] =
    Array.tabulate(m * k * subDim) { j =>
      cb(j / (k * subDim))((j / subDim) % k)(j % subDim)
    }

  /** The original unrolled ADC, verbatim from pqTopK pre-refactor. */
  private def unrolledAdist: Column = {
    def d2Entry(x: Column, off: Int, entry: Column): Column =
      (1 to subDim).map { i =>
        val dlt = element_at(x, off + i) - element_at(entry, i)
        dlt * dlt
      }.reduce(_ + _)
    val cbLit = (0 until m).map(mm => typedLit(cb(mm).map(_.toSeq).toSeq))
    (0 until m).map { mm =>
      d2Entry(col("qv"), mm * subDim,
        element_at(cbLit(mm), element_at(col("codes"), mm + 1) + 1))
    }.reduce(_ + _)
  }

  private def kernelAdist: Column =
    ColumnBridge.column(PqAdc(
      ColumnBridge.expression(col("qv")),
      ColumnBridge.expression(col("codes")),
      cbFlat, m, k, subDim))

  test("kernel ≡ unrolled chain bit-for-bit on dense pairs") {
    val rows = for (q <- 0L until 12L; c <- 0 until 6) yield
      (q, vec(q), (0 until m).map(mm => (c + mm) % k))
    val df = rows.toDF("id", "qv", "codes")
    val got = df.select(col("id"), kernelAdist.as("a"),
        unrolledAdist.as("b"), col("codes"))
      .as[(Long, Option[Double], Option[Double], Seq[Int])].collect()
    got.foreach { case (id, a, b, codes) =>
      assert(a.isDefined && a == b,
        s"id=$id codes=$codes kernel=$a unrolled=$b")
      assert(java.lang.Double.doubleToLongBits(a.get) ==
        java.lang.Double.doubleToLongBits(b.get), "bit-identical")
    }
  }

  test("reachable null semantics mirror the chain (null query / null " +
      "codes); unreachable degenerates null instead of ANSI-throwing") {
    val good = vec(3L)
    // rows the chain CAN evaluate (what pqTopK's pipeline actually
    // produces: PqEncode emits either a valid length-m code array in
    // [0, K) or null) — kernel must agree exactly
    val reachable = Seq(
      (0L, null: Seq[Double], Seq(0, 1, 2, 3)),      // null query
      (1L, good, null: Seq[Int]),                    // null codes
      (2L, good, Seq(0, 1, 2, 3))                    // control: valid
    )
    val got = reachable.toDF("id", "qv", "codes")
      .select(col("id"), kernelAdist.as("a"), unrolledAdist.as("b"))
      .as[(Long, Option[Double], Option[Double])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(0L) == ((None, None)) && got(1L) == ((None, None)))
    assert(got(2L)._1.isDefined && got(2L)._1 == got(2L)._2)
    // rows unreachable from PqEncode (short/garbage codes, short
    // query): under ANSI the element_at chain would THROW
    // INVALID_ARRAY_INDEX — the kernel degrades to null instead
    // (defensive, strictly more lenient; kernel-only assertion)
    val degenerate = Seq(
      (10L, good.take(dim - 1), Seq(0, 1, 2, 3)),    // short query
      (11L, good, Seq(0, 1)),                        // short codes
      (12L, good, Seq(0, 1, 2, k)),                  // code ≥ K
      (13L, good, Seq(-1, 1, 2, 3))                  // negative code
    )
    val gotD = degenerate.toDF("id", "qv", "codes")
      .select(col("id"), kernelAdist.as("a"))
      .as[(Long, Option[Double])].collect().toMap
    degenerate.foreach { case (id, _, _) =>
      assert(gotD(id).isEmpty, s"id=$id kernel must be null")
    }
  }
}
