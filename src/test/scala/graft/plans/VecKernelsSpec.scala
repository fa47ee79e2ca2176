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

  test("NormalizeVec == staged cast/dot/divide HOF chain, bit-for-bit, " +
      "from both float and double inputs") {
    import spark.implicits._
    val df = vecs(50).toDF("id", "v")
      .withColumn("vf", transform(col("v"), x => x.cast("float")))
    def chain(c: Column): Column = {
      val nv = transform(c, x => x.cast("double"))
      // the original normalized() body, inlined (norm via aggregate fold)
      val norm = sqrt(aggregate(zip_with(nv, nv, (a, b) => a * b),
        lit(0.0), (acc, x) => acc + x))
      transform(nv, x => x / norm)
    }
    def kernel(c: Column): Column =
      ColumnBridge.column(NormalizeVec(ColumnBridge.expression(c)))
    Seq("v", "vf").foreach { src =>
      val out = df.select(kernel(col(src)).as("k"), chain(col(src)).as("u"))
      assert(out.where(col("k") =!= col("u")).count() === 0, s"src=$src")
      assert(out.where(col("k").isNull).count() === 0)
    }
    // null array -> null
    val nv = spark.sql("SELECT CAST(NULL AS ARRAY<DOUBLE>) AS v")
    assert(nv.select(kernel(col("v"))).collect().head.isNullAt(0))
  }

  test("ArgmaxDot == crossJoin+window assignment on a tie-bearing " +
      "centroid set, bit-for-bit decisions") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val all = vecs(60)
    // centroid rows 0..7, with 8..9 EXACT duplicates of 0..1 so ties are
    // real: the duplicate (higher-id) copy must never win in either form
    val base = all.take(8)
    val cents = (base ++ Seq((8L, base(0)._2), (9L, base(1)._2)))
      .map { case (id, v) =>
        val n = math.sqrt(v.map(x => x * x).sum)
        (id, v.map(_ / n))
      }
    val corpus = all.map { case (id, v) =>
      val n = math.sqrt(v.map(x => x * x).sum)
      (id, v.map(_ / n))
    }.toDF("id", "v")
    val centsDf = cents.toDF("centroid_id", "centv")
    // the window form ArgmaxDot replaced (verbatim from assignBuckets)
    val w = Window.partitionBy(col("id"))
      .orderBy(col("cos").desc, col("centroid_id").asc)
    val viaWindow = corpus.crossJoin(broadcast(centsDf))
      .select(col("id"), col("centroid_id"),
        kernelDot(col("v"), col("centv")).as("cos"))
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("id"), col("centroid_id").as("bucket"))
    val sorted = cents.sortBy(_._1)
    val flat = sorted.flatMap(_._2).toArray
    val ids = sorted.map(_._1).toArray
    val viaKernel = corpus.select(col("id"),
      ColumnBridge.column(ArgmaxDot(
        ColumnBridge.expression(col("v")), flat, ids, ids.length, dim))
        .as("bucket"))
    val joined = viaWindow.as("w").join(viaKernel.as("k"), "id")
      .select(col("w.bucket").as("wb"), col("k.bucket").as("kb"))
    assert(joined.where(col("wb") =!= col("kb")).count() === 0)
    assert(joined.count() === 60)
    // ties resolved: duplicated centroids 8/9 never assigned
    assert(viaKernel.where(col("bucket") >= 8).count() === 0)
    // invalid-input semantics: short vector -> the -1 sentinel (the
    // expression is non-nullable BY DESIGN — a nullable bucket makes the
    // join infer isnotnull and push the whole interpreted chain into a
    // per-row filter on both sides; see the scaladoc)
    val shortV = Seq((1L, Seq(1.0, 2.0))).toDF("id", "v")
    assert(shortV.select(ColumnBridge.column(ArgmaxDot(
        ColumnBridge.expression(col("v")), flat, ids, ids.length, dim)))
      .collect().head.getLong(0) == ArgmaxDot.Invalid)
    val nullV = spark.sql("SELECT CAST(NULL AS ARRAY<DOUBLE>) AS v")
    assert(nullV.select(ColumnBridge.column(ArgmaxDot(
        ColumnBridge.expression(col("v")), flat, ids, ids.length, dim)))
      .collect().head.getLong(0) == ArgmaxDot.Invalid)
  }
}
