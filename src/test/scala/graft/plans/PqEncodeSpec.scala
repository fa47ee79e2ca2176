package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** PqEncode (the loop-kernel PQ encoder) vs the unrolled
  * array_min(array(struct(d, k)…)) Column battery it replaced: the two
  * must agree code-for-code — the unrolled form IS the oracle-checked
  * semantics (`sim_ann_pq`'s DuckDB SQL replays its doubles), and the
  * expression exists only because the unrolled codegen breaches the JVM
  * 64 KB method limit at m·K·subDim terms. */
class PqEncodeSpec extends SparkSpec {

  private val m = 4
  private val k = 8
  private val subDim = 8
  private val dim = m * subDim

  /** Deterministic pseudo-random corpus: values in [-1, 1] with repeats
    * engineered so some distances tie exactly (same subvector content in
    * different codewords ⇒ the (d, k) tie-break is actually exercised). */
  private def corpus(n: Int): Seq[(Long, Seq[Double])] =
    (0L until n).map { id =>
      val v = (0 until dim).map { i =>
        // id % 5 collides vectors: codebook rows 5..7 duplicate rows 0..2
        val s = (id % 5) * 31 + i * 7
        ((s * 2654435761L) % 2001 - 1000) / 1000.0
      }
      (id, v)
    }

  private def cbFromCorpus(rows: Seq[(Long, Seq[Double])])
      : Array[Array[Array[Double]]] = {
    val samples = rows.sortBy(_._1).take(k)
      .map(_._2.toArray.grouped(subDim).toArray).toArray
    Array.tabulate(m, k)((mm, kk) => samples(kk)(mm))
  }

  /** The original unrolled battery, verbatim from pqTopK pre-refactor. */
  private def unrolledCodes(cb: Array[Array[Array[Double]]]): Column = {
    def d2Const(x: Column, off: Int, entry: Array[Double]): Column =
      (1 to subDim).map { i =>
        val dlt = element_at(x, off + i) - lit(entry(i - 1))
        dlt * dlt
      }.reduce(_ + _)
    array((0 until m).map { mm =>
      array_min(array((0 until k).map { kk =>
        struct(d2Const(col("cv"), mm * subDim, cb(mm)(kk)).as("d"),
          lit(kk).as("k"))
      }: _*)).getField("k")
    }: _*)
  }

  private def kernelCodes(cb: Array[Array[Array[Double]]]): Column = {
    val flat = Array.tabulate(m * k * subDim) { j =>
      cb(j / (k * subDim))((j / subDim) % k)(j % subDim)
    }
    ColumnBridge.column(
      PqEncode(ColumnBridge.expression(col("cv")), flat, m, k, subDim))
  }

  test("kernel codes == unrolled battery codes on a tie-bearing corpus") {
    import spark.implicits._
    val rows = corpus(64)
    val cb = cbFromCorpus(rows)
    val df = rows.toDF("id", "cv").cache()
    try {
      val both = df
        .withColumn("a", kernelCodes(cb))
        .withColumn("b", unrolledCodes(cb))
      assert(both.where(col("a") =!= col("b")).count() === 0)
      // ties exist and resolve to the LOWEST codeword in both forms: the
      // duplicated codebook rows (5..7 = 0..2) must never be emitted for
      // vectors equidistant to both copies
      val codes = both.select(explode(col("a"))).as[Int].collect()
      assert(codes.forall(c => c >= 0 && c < k))
      assert(rows.size === 64)
    } finally df.unpersist()
  }

  test("interpreted eval matches codegen (single-row paths)") {
    import spark.implicits._
    val rows = corpus(8)
    val cb = cbFromCorpus(rows)
    val df = rows.toDF("id", "cv")
    val viaPlan = df.withColumn("c", kernelCodes(cb))
      .orderBy("id").select("c").as[Seq[Int]].collect()
    val direct = rows.sortBy(_._1).map { case (_, v) =>
      val flat = Array.tabulate(m * k * subDim) { j =>
        cb(j / (k * subDim))((j / subDim) % k)(j % subDim)
      }
      PqEncode.encode(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(v.toArray),
        flat, m, k, subDim).toSeq
    }
    assert(viaPlan.map(_.toList).toSeq === direct.map(_.toList))
  }

  test("null vector yields null codes") {
    val df = spark.sql("SELECT CAST(NULL AS ARRAY<DOUBLE>) AS cv")
    val cb = Array.fill(m, k)(Array.fill(subDim)(0.0))
    val out = df.withColumn("c", kernelCodes(cb)).select("c").collect()
    assert(out.head.isNullAt(0))
  }

  test("short vector and null element yield null, not garbage (both paths)") {
    val cb = Array.fill(m, k)(Array.fill(subDim)(0.0))
    // array shorter than m*subDim, and a dense-length array with one null
    val df = spark.sql(
      s"""SELECT * FROM VALUES
         |  (array(1.0d, 2.0d, 3.0d)),
         |  (${(0 until dim).map(i => if (i == 7) "CAST(NULL AS DOUBLE)"
              else s"${i}.0d").mkString("array(", ", ", ")")})
         |AS t(cv)""".stripMargin)
    // codegen path
    val viaPlan = df.withColumn("c", kernelCodes(cb)).select("c").collect()
    assert(viaPlan.forall(_.isNullAt(0)))
    // interpreted path (direct expression eval on the same inputs)
    val flat = Array.fill(m * k * subDim)(0.0)
    val short = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array[Any](1.0, 2.0, 3.0))
    val holed = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      (0 until dim).map(i => if (i == 7) null else i.toDouble: Any).toArray)
    assert(short.numElements() < m * subDim)
    assert(PqEncode.hasNull(holed, m * subDim))
    val expr = PqEncode(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        null, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)), flat, m, k, subDim)
    assert(expr.eval(null) === null)
  }
}
