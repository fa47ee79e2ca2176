package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DistributionSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without shuffling either side") {
    spark.sql("DROP TABLE IF EXISTS dist_a")
    spark.sql("DROP TABLE IF EXISTS dist_b")
    for (t <- Seq("dist_a", "dist_b")) {
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles.foreach(rm); f.delete()
        }
        rm(loc)
      }
    }
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong, s"b$i")).toDF("k", "vb")
    Distribution.writeBucketed(a, "dist_a", "k", 8)
    Distribution.writeBucketed(b, "dist_b", "k", 8)
    val joined = spark.table("dist_a").join(spark.table("dist_b"), "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected co-located bucket join, got:\n$plan")
    assert(joined.count() == 1000)
  }

  test("salted join returns exactly the plain join's rows") {
    val big = (1 to 5000).map(i => (if (i % 2 == 0) 1L else i.toLong, i))
      .toDF("k", "payload") // heavy skew on k=1
    val small = Seq((1L, "hot"), (3L, "cold"), (9999L, "miss")).toDF("k", "name")
    val plain = big.join(small, "k").select("k", "payload", "name")
      .as[(Long, Int, String)].collect().toSet
    val salted = Distribution.saltedJoin(big, small, "k", salt = 8)
      .select("k", "payload", "name").as[(Long, Int, String)].collect().toSet
    assert(salted == plain && plain.size == 2502) // 2500 even + i=1 + i=3
  }

  test("salted two-phase count equals direct groupBy") {
    val df = (1 to 10000).map(i => if (i % 10 < 9) "hot" else s"k${i % 7}")
      .toDF("k")
    val direct = df.groupBy("k").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val salted = Distribution.saltedCount(df, "k", 8)
      .as[(String, Long)].collect().toMap
    assert(salted == direct)
  }

  // ---- plan-shape locks for the narrow curation operators: these must
  // stay pure projections/filters over the scan — a shuffle sneaking in
  // is a 100 TB regression even when results stay correct. (Sources are
  // spark.range, not LocalRelation, so ConvertToLocalRelation can't
  // constant-fold the plan away before the assertion.)

  private def physical(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("stratifiedSample is shuffle-free") {
    val df = spark.range(1000).select(col("id"),
      concat(lit("l"), pmod(col("id"), lit(3))).as("lang"))
    val plan = physical(graft.pipeline.Curation.stratifiedSample(
      df, "lang", "id", Map("l0" -> 0.5), defaultRate = 0.1))
    assert(!plan.contains("Exchange"), s"sample must stay narrow:\n$plan")
  }

  test("chunkByTokens is shuffle-free") {
    val df = spark.range(100).select(col("id"),
      concat_ws(" ", lit("a b c d e f g"), col("id").cast("string")).as("text"))
    val plan = physical(graft.pipeline.TextAnalysis.chunkByTokens(
      df, "text", "id", chunkTokens = 3, overlap = 1))
    assert(!plan.contains("Exchange"), s"chunking must stay narrow:\n$plan")
  }

  test("zOrderKey column matches the reference interleave on the full grid") {
    // known corners of the 8-bit curve
    assert(Distribution.zValue(1, 0, 8) == 2L)
    assert(Distribution.zValue(0, 1, 8) == 1L)
    assert(Distribution.zValue(255, 0, 8) == 0xAAAAL)
    assert(Distribution.zValue(0, 255, 8) == 0x5555L)
    assert(Distribution.zValue(255, 255, 8) == 0xFFFFL)
    // the whole 256×256 grid: column expression ≡ driver reference
    val grid = spark.range(256L * 256L).select(
      (col("id") / 256L).cast("long").as("x"), pmod(col("id"), lit(256L)).as("y"))
    val mismatches = grid
      .withColumn("z", Distribution.zOrderKey(col("x"), col("y"), 8))
      .as[(Long, Long, Long)].collect()
      .count { case (x, y, z) => Distribution.zValue(x, y, 8) != z }
    assert(mismatches == 0)
    // bijective: 65536 distinct z values over the grid
    val distinct = grid
      .select(Distribution.zOrderKey(col("x"), col("y"), 8).as("z"))
      .distinct().count()
    assert(distinct == 256L * 256L)
  }

  test("N-dimensional interleave: 3-D column ≡ reference, bijective") {
    // 3 dims × 4 bits: the full 16^3 grid
    val grid = spark.range(16L * 16L * 16L).select(
      (col("id") / 256L).cast("long").as("x"),
      pmod((col("id") / 16L).cast("long"), lit(16L)).as("y"),
      pmod(col("id"), lit(16L)).as("w"))
    val rows = grid.withColumn("z",
        Distribution.zOrderKey(Seq(col("x"), col("y"), col("w")), 4))
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.forall { case (x, y, w, z) =>
      Distribution.zValue(Seq(x, y, w), 4) == z })
    assert(rows.map(_._4).distinct.length == 16 * 16 * 16)
    // first-dim MSB convention: (1,0,0) > (0,1,0) > (0,0,1)
    assert(Distribution.zValue(Seq(1L, 0L, 0L), 4) == 4L)
    assert(Distribution.zValue(Seq(0L, 1L, 0L), 4) == 2L)
    assert(Distribution.zValue(Seq(0L, 0L, 1L), 4) == 1L)
    // N-D cover enumerates the full box grid through the same curve
    val cover3 = Distribution.zBucketsForBox(
      Seq((0L, 1L), (2L, 3L), (4L, 5L)), bits = 4, shift = 0)
    assert(cover3.size == 8 && cover3 == cover3.distinct.sorted)
    assert(cover3.contains(Distribution.zValue(Seq(1L, 2L, 5L), 4)))
  }

  test("z-bucket cover prunes a partitioned layout and preserves the box answer") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toFile
    try {
      val data = spark.range(20000).select(
        col("id"),
        pmod(col("id") * 37L, lit(256L)).as("x"),
        pmod(col("id") * 91L, lit(256L)).as("y"))
      Distribution.writeZOrdered(data, "x", "y", bits = 8, shift = 8,
        dir.toString)

      val (x0, x1, y0, y1) = (10L, 25L, 40L, 55L)
      val cover = Distribution.zBucketsForBox(x0, x1, y0, y1, bits = 8, shift = 8)
      val back = spark.read.parquet(dir.toString)
      val total = back.select("zb").distinct().count()
      assert(cover.size < total / 4,
        s"cover ${cover.size} buckets of $total — not a prune")

      val pruned = Distribution.readBox(spark, dir.toString, "x", "y",
        x0, x1, y0, y1, bits = 8, shift = 8)
      val boxPred = col("x").between(x0, x1) && col("y").between(y0, y1)
      val expected = data.where(boxPred).select("id").as[Long].collect().sorted
      assert(pruned.select("id").as[Long].collect().sorted.toSeq ==
        expected.toSeq, "bucket cover must not lose box rows")
      // the pruned scan touches only the covered partitions' files
      val filesRead = pruned.select(input_file_name()).distinct().count()
      val filesTotal = back.select(input_file_name()).distinct().count()
      assert(filesRead < filesTotal / 4,
        s"read $filesRead of $filesTotal files — partition pruning missing")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(rm); f.delete()
      }
      rm(dir)
    }
  }

  test("zBucketRangesForBox == full-grid enumeration on exhaustive " +
      "random boxes; large box covers via few ranges") {
    // differential: every 2-D box over a small grid, three shifts
    val bits = 4
    for {
      shift <- Seq(0, 2, 4)
      x0 <- 0L to 15L; x1 <- x0 to 15L
      y0 <- 0L until 16L by 5; y1 <- y0 to 15L by 3
    } {
      val ranges = Seq((x0, x1), (y0, y1))
      // the original |box|-cost grid enumeration, kept as the oracle
      val grid = (for { x <- x0 to x1; y <- y0 to y1 }
        yield Distribution.zValue(Seq(x, y), bits) >>> shift)
        .distinct.sorted
      val viaRanges = Distribution.zBucketsForBox(ranges, bits, shift)
      assert(viaRanges == grid, s"box=$ranges shift=$shift")
      // ranges sorted, merged, non-adjacent
      val rs = Distribution.zBucketRangesForBox(ranges, bits, shift)
      assert(rs.forall { case (lo, hi) => lo <= hi })
      assert(rs.sliding(2).forall {
        case Seq((_, h1), (l2, _)) => l2 > h1 + 1
        case _ => true
      }, s"unmerged cover: $rs")
    }
    // 3-D differential sample
    for (shift <- Seq(0, 3, 6)) {
      val ranges = Seq((1L, 6L), (0L, 7L), (3L, 5L))
      val grid = (for { x <- 1L to 6L; y <- 0L to 7L; w <- 3L to 5L }
        yield Distribution.zValue(Seq(x, y, w), 3) >>> shift)
        .distinct.sorted
      assert(Distribution.zBucketsForBox(ranges, 3, shift) == grid)
    }
    // the scale claim: a 104-bucket-side box (10,816 bucket cells at
    // shift 0 over 10 bits) covers via tens of RANGES, not 10^4 probes
    val big = Seq((100L, 203L), (400L, 503L))
    val rs = Distribution.zBucketRangesForBox(big, bits = 10, shift = 0)
    val cells = rs.map { case (lo, hi) => hi - lo + 1 }.sum
    assert(cells >= 104L * 104L, "cover must include every box cell")
    assert(rs.size <= 200, s"prefix cover must stay range-sized: ${rs.size}")
    // aligned big box: the degenerate-best case collapses to ONE range
    val aligned = Distribution.zBucketRangesForBox(
      Seq((0L, 255L), (0L, 255L)), bits = 8, shift = 0)
    assert(aligned == Seq((0L, 65535L)))
  }

  test("repetitionFeatures pre-aggregates before every exchange") {
    val df = spark.range(100).select(col("id"),
      lit("a b a c a b d").as("text"))
    val plan = physical(
      graft.pipeline.TextAnalysis.repetitionFeatures(df, "text", "id"))
    // both token aggregates must show partial_ forms upstream of their
    // exchange (map-side combine), and nothing may cross-join
    assert(plan.contains("partial_"), s"expected partial aggregation:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
