package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** The native vector kernels vs the unrolled Column chains they replaced:
  * bit-identical doubles (DotFixed) and exact longs (SignProject) are the
  * whole contract — the oracle SQL replays the originals' arithmetic. */
class VecKernelsSpec extends SparkSpec {

  private val dim = 64

  private def vecs(n: Int): Seq[(Long, Seq[Double])] =
    (0L until n).map { id =>
      (id, (0 until dim).map { i =>
        ((id * 31 + i * 7) * 2654435761L % 2001 - 1000) / 1000.0
      })
    }

  private def unrolledDot(x: Column, y: Column): Column =
    (1 to dim).map(i => element_at(x, i) * element_at(y, i)).reduce(_ + _)

  private def kernelDot(x: Column, y: Column): Column =
    ColumnBridge.column(DotFixed(
      ColumnBridge.expression(x), ColumnBridge.expression(y), dim))

  test("DotFixed == unrolled element_at chain, bit-for-bit") {
    import spark.implicits._
    val df = vecs(40).toDF("id", "v")
    val pairs = df.as("a").crossJoin(df.as("b"))
      .select(
        kernelDot(col("a.v"), col("b.v")).as("k"),
        unrolledDot(col("a.v"), col("b.v")).as("u"))
    // exact double equality — compare raw bits, not a tolerance
    assert(pairs.where(col("k") =!= col("u")).count() === 0)
    assert(pairs.where(col("k").isNull).count() === 0)
  }

  test("DotFixed null contract: null array, short array, null element") {
    val df = spark.sql(
      s"""SELECT * FROM VALUES
         |  (CAST(NULL AS ARRAY<DOUBLE>)),
         |  (array(1.0d, 2.0d)),
         |  (${(0 until dim).map(i => if (i == 3) "CAST(NULL AS DOUBLE)" else s"$i.0d")
               .mkString("array(", ",", ")")})
         |AS t(v)""".stripMargin)
    val out = df.select(kernelDot(col("v"), col("v")).as("d")).collect()
    assert(out.forall(_.isNullAt(0)), "all three degenerate shapes are null")
  }

  test("SignProject == unrolled signed-term chain, exact") {
    import spark.implicits._
    val dOut = 16
    val signs = Array.tabulate(dOut * dim) { idx =>
      graft.pipeline.Similarity.rpSign(idx / dim, idx % dim).toByte
    }
    val df = vecs(32).toDF("id", "v")
      .select(col("id"),
        transform(col("v"), x => round(x * lit(1e6)).cast("long")).as("vi"))
    val kernel = ColumnBridge.column(SignProject(
      ColumnBridge.expression(col("vi")), signs, dim, dOut))
    val unrolled = array((0 until dOut).map { j =>
      (0 until dim).map { i =>
        element_at(col("vi"), i + 1) *
          lit(graft.pipeline.Similarity.rpSign(j, i).toLong)
      }.reduce(_ + _)
    }: _*)
    val out = df.select(kernel.as("k"), unrolled.as("u"))
    assert(out.where(col("k") =!= col("u")).count() === 0)
  }

  test("interpreted eval matches codegen") {
    import spark.implicits._
    val rows = vecs(6)
    val df = rows.toDF("id", "v")
    val viaPlan = df.select(kernelDot(col("v"), col("v")).as("d"))
      .orderBy("id").as[Double].collect()
    val direct = rows.map { case (_, v) =>
      val a = new org.apache.spark.sql.catalyst.util.GenericArrayData(v.toArray)
      DotFixed.dot(a, a, dim)
    }
    assert(viaPlan.toSeq === direct)
  }
}
