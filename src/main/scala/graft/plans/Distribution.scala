package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-distribution utilities for 100 TB operation: bucketed
  * co-located joins and skew salting. These are the techniques the rest of
  * the engine assumes at scale (SURVEY §7.4: per-topic ordering, N×M
  * fan-out, hot-key joins); here they're concrete and plan-asserted.
  */
object Distribution {

  /** Write a table bucketed by `key` so future equi-joins/aggregations on
    * the key are co-located (no shuffle of the big side — at 100 TB the
    * bucket layout replaces the exchange). Requires a catalog table
    * (bucket metadata lives in the metastore). */
  def writeBucketed(df: DataFrame, tableName: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(tableName)

  /** Salted equi-join for skewed keys: the big side's hot keys are spread
    * over `salt` sub-partitions; the small side is replicated ×salt (one
    * row per salt value) so every sub-partition finds its match. Results
    * are identical to a plain equi-join; the shuffle skew on the hot key
    * drops by ~salt×.
    *
    * (Spark's AQE skew-join handles sort-merge skew automatically; explicit
    * salting remains necessary for skewed *aggregations* and for joins
    * where AQE can't split — this is the general tool.) */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salt: Int): DataFrame = {
    // salt from a hash of the full row: deterministic under re-execution
    // (monotonically_increasing_id would re-salt on retry)
    val saltedBig = big.withColumn("_salt",
      pmod(hash(big.columns.map(col): _*), lit(salt)).cast("int"))
    val saltedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedBig.join(saltedSmall, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase (partial → final) skew-tolerant aggregation: count per key
    * with a salt pre-aggregation so one hot key spreads over `salt`
    * reducers before the final combine. Same result as a direct groupBy. */
  def saltedCount(df: DataFrame, key: String, salt: Int): DataFrame =
    df.withColumn("_salt",
        pmod(hash(df.columns.map(col): _*), lit(salt)).cast("int"))
      .groupBy(col(key), col("_salt")).agg(count(lit(1)).as("_partial"))
      .groupBy(col(key)).agg(sum("_partial").as("n"))

  /** Z-order (Morton) interleave of two bucketed dimensions — the
    * multi-dimensional data-layout key. Sorting/partitioning a 100 TB
    * table by `zOrderKey(x, y, bits)` keeps parquet row-group min/max
    * statistics tight on BOTH dimensions simultaneously, so a predicate
    * on either (or both) prunes row groups — a single-column sort can
    * only ever serve one of them.
    *
    * Inputs must already be non-negative bucket ordinals < 2^bits (the
    * caller buckets raw values; buckets are what the curve orders). `x`
    * lands in the odd (higher) bit of each pair, `y` in the even. Pure
    * column arithmetic — shift/mask/or per bit — so the whole key stays
    * inside whole-stage codegen and is reproducible in any engine. */
  def zOrderKey(x: Column, y: Column, bits: Int): Column =
    zOrderKey(Seq(x, y), bits)

  /** N-dimensional generalization: round-robin bit interleave across
    * `dims` (earlier dimensions take the more significant bit of each
    * round, so `Seq(x, y)` reproduces the classic 2-D Morton layout).
    * Requires `dims.size * bits <= 63`. */
  def zOrderKey(dims: Seq[Column], bits: Int): Column = {
    val n = dims.size
    require(n >= 2, s"need at least 2 dimensions, got $n")
    require(bits >= 1 && n * bits <= 63,
      s"dims*bits must fit a positive long, got $n*$bits")
    (for { b <- 0 until bits; (d, i) <- dims.zipWithIndex } yield
      shiftleft(shiftright(d.cast("long"), b).bitwiseAND(lit(1L)),
        b * n + (n - 1 - i))
    ).reduce(_ bitwiseOR _)
  }

  /** Reference (driver-side) z-value — the same interleave as
    * [[zOrderKey]], used by [[zBucketsForBox]] and the specs. */
  def zValue(x: Long, y: Long, bits: Int): Long = zValue(Seq(x, y), bits)

  def zValue(dims: Seq[Long], bits: Int): Long = {
    val n = dims.size
    require(n >= 2 && bits >= 1 && n * bits <= 63)
    dims.foreach(d => require(d >= 0 && d < (1L << bits), s"dim $d out of range"))
    (for { b <- 0 until bits; (d, i) <- dims.zipWithIndex } yield
      ((d >> b) & 1L) << (b * n + (n - 1 - i))
    ).foldLeft(0L)(_ | _)
  }

  /** Sorted, merged, inclusive ranges of coarse z-buckets (z >> shift)
    * covering a rectangular query box — the query-time half of a
    * z-ordered layout, computed as a prefix-tree (BIGMIN-style) cover:
    * recurse the 2^n-ary Morton prefix tree from the root, pruning
    * subtrees disjoint from the box, emitting whole z-ranges for
    * subtrees fully inside it, and stopping at bucket granularity on
    * the boundary (a prefix cell's z-values are contiguous and aligned,
    * so every emitted node is one exact bucket range). Children are
    * visited in z order, so ranges come out sorted and merge in one
    * pass.
    *
    * Driver cost is the cover size — O(boundary nodes), ~O(2^n·n·bits +
    * box surface in bucket cells) — NOT the |box| cell count the old
    * full-grid enumeration paid: a 10⁴-cell box that is bucket-aligned
    * covers via a handful of ranges. The bucket SET is identical to the
    * grid enumeration's (differential-tested in DistributionSpec): a
    * node is emitted iff it intersects the box, and an intersecting
    * bucket-granularity node's single bucket contains a box cell. */
  def zBucketRangesForBox(ranges: Seq[(Long, Long)], bits: Int,
      shift: Int): Seq[(Long, Long)] = {
    val n = ranges.size
    require(n >= 2 && bits >= 1 && n * bits <= 63)
    require(shift >= 0 && shift < n * bits)
    ranges.foreach { case (lo, hi) =>
      require(lo >= 0 && lo <= hi && hi < (1L << bits),
        s"bad dimension range ($lo, $hi) for $bits bits")
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    def rec(d: Int, origin: Seq[Long]): Unit = {
      val size = 1L << (bits - d)
      val disjoint = ranges.zip(origin).exists { case ((lo, hi), o) =>
        o + size - 1 < lo || o > hi
      }
      if (!disjoint) {
        val spanBits = n * (bits - d)
        val inside = ranges.zip(origin).forall { case ((lo, hi), o) =>
          o >= lo && o + size - 1 <= hi
        }
        if (inside || spanBits <= shift) {
          val zLo = zValue(origin, bits)
          // spanBits = 63 only at the root with zLo = 0: the wrap of
          // (1L << 63) - 1 to Long.MaxValue is then exactly right
          val zHi = zLo + ((1L << spanBits) - 1L)
          out += ((zLo >>> shift, zHi >>> shift))
        } else {
          val step = size >> 1
          var c = 0
          while (c < (1 << n)) {
            // child bit of dim i is bit (n-1-i) of c — the same
            // significance order as zValue, so children walk in z order
            val childOrigin = origin.zipWithIndex.map { case (o, i) =>
              o + (if (((c >> (n - 1 - i)) & 1) == 1) step else 0L)
            }
            rec(d + 1, childOrigin)
            c += 1
          }
        }
      }
    }
    rec(0, Seq.fill(n)(0L))
    val merged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    out.foreach { r =>
      if (merged.nonEmpty && r._1 <= merged.last._2 + 1)
        merged(merged.size - 1) =
          (merged.last._1, math.max(merged.last._2, r._2))
      else merged += r
    }
    merged.toSeq
  }

  /** The coarse z-buckets (z >> shift) that cover a rectangular query
    * box, as an explicit id list (for `isin` pruning) — expands
    * [[zBucketRangesForBox]]; use the ranges form when the cover may be
    * large. */
  def zBucketsForBox(xMin: Long, xMax: Long, yMin: Long, yMax: Long,
      bits: Int, shift: Int): Seq[Long] =
    zBucketsForBox(Seq((xMin, xMax), (yMin, yMax)), bits, shift)

  /** N-dimensional box cover: `ranges` gives the inclusive [min, max]
    * per dimension, in [[zOrderKey]]'s dimension order. */
  def zBucketsForBox(ranges: Seq[(Long, Long)], bits: Int,
      shift: Int): Seq[Long] =
    zBucketRangesForBox(ranges, bits, shift)
      .flatMap { case (lo, hi) => lo to hi }

  /** Write `df` z-order-clustered on two bucketed dimension columns:
    * partitioned by the coarse bucket `zb = z >> shift` (directory-level
    * pruning via [[readBox]]) and sorted by the full z within each
    * partition (row-group min/max stays tight on both dims). The raw
    * dimension columns are retained for the residual filter. */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String, bits: Int,
      shift: Int, path: String): Unit =
    writeZOrdered(df, Seq(xCol, yCol), bits, shift, path)

  /** N-dimensional variant: dimension columns in [[zOrderKey]] order. */
  def writeZOrdered(df: DataFrame, dims: Seq[String], bits: Int,
      shift: Int, path: String): Unit =
    df.withColumn("_z", zOrderKey(dims.map(col), bits))
      .withColumn("zb", shiftright(col("_z"), shift))
      .sortWithinPartitions("zb", "_z")
      .drop("_z")
      .write.mode("overwrite").partitionBy("zb").parquet(path)

  /** Read a rectangular box (inclusive bucket coordinates) from a
    * [[writeZOrdered]] layout: partition-prunes to the z-bucket cover of
    * the box, then applies the exact box predicate as the residual
    * filter — the scan touches only the covered partitions' files
    * regardless of table size. */
  def readBox(spark: SparkSession, path: String, xCol: String, yCol: String,
      xMin: Long, xMax: Long, yMin: Long, yMax: Long,
      bits: Int, shift: Int): DataFrame =
    readBox(spark, path, Seq((xCol, xMin, xMax), (yCol, yMin, yMax)),
      bits, shift)

  /** N-dimensional box read: `box` gives (column, min, max) per
    * dimension in [[zOrderKey]]'s dimension order. Pruning uses the
    * RANGE cover (an OR of `zb BETWEEN` clauses — still
    * partition-prunable), so a large box costs its handful of ranges,
    * never an |cover|-long IN list. */
  def readBox(spark: SparkSession, path: String,
      box: Seq[(String, Long, Long)], bits: Int, shift: Int): DataFrame = {
    val cover = zBucketRangesForBox(box.map(b => (b._2, b._3)), bits, shift)
    val prune = cover.map { case (lo, hi) => col("zb").between(lo, hi) }
      .reduce(_ || _)
    box.foldLeft(spark.read.parquet(path).where(prune)) {
      case (df, (c, lo, hi)) => df.where(col(c).between(lo, hi))
    }
  }

  /** The DuckDB-SQL rendering of [[zOrderKey]] over integer expressions
    * — the oracle twin, generated from the same bit walk so the two
    * engines compute identical keys by construction. */
  def zOrderSql(x: String, y: String, bits: Int): String =
    zOrderSql(Seq(x, y), bits)

  def zOrderSql(dims: Seq[String], bits: Int): String = {
    val n = dims.size
    (for { b <- 0 until bits; (d, i) <- dims.zipWithIndex } yield
      s"(((($d) >> $b) & 1) << ${b * n + (n - 1 - i)})"
    ).mkString("(", " | ", ")")
  }
}
