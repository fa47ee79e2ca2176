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
}
