package graft.rates

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Windowed rate aggregation — the Spark analog of the reference's
  * GenCounter (ETS monotonic counters,
  * /root/reference/lib/realtime/gen_counter/gen_counter.ex:17,51-60) +
  * RateCounter (60 × 1 s sliding buckets, avg = sum/len/tick, limit triggers,
  * /root/reference/lib/realtime/rate_counter/rate_counter.ex:25-35,197-224).
  *
  * Spark's hash aggregation gives the partial/final split the reference
  * builds by hand (decentralized ETS counters → windowed roll-up) for free:
  * map-side partial counts, one shuffle on (key, window). At 100 TB the
  * cardinality is (keys × windows) — bounded, and AQE coalesces the
  * post-shuffle partitions.
  */
object Rates {

  /** Plain monotonic counter per key (A1). */
  def counter(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))

  /** Tumbling-window event counts per key (A2 simplified tick). Emits
    * `bucket_s` = epoch seconds of the window start (engine-portable). */
  def tumbling(df: DataFrame, tsCol: String, keys: Seq[String],
      windowSec: Int): DataFrame =
    df.groupBy((window(col(tsCol), s"$windowSec seconds") +: keys.map(col)): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("bucket_s", unix_timestamp(col("window.start")))
      .drop("window")

  /** Sliding-window counts (A2's 60 s window / finer slide). Each event lands
    * in windowSec/slideSec buckets. */
  def sliding(df: DataFrame, tsCol: String, keys: Seq[String],
      windowSec: Int, slideSec: Int): DataFrame =
    df.groupBy((window(col(tsCol), s"$windowSec seconds", s"$slideSec seconds")
        +: keys.map(col)): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("bucket_s", unix_timestamp(col("window.start")))
      .drop("window")

  /** Average events/sec over the window (RateCounter's avg = sum/len/tick). */
  def withAvg(rates: DataFrame, windowSec: Int): DataFrame =
    rates.withColumn("avg_per_sec",
      round(col("n") / lit(windowSec.toDouble), 6))

  /** Limit trigger (A2): buckets whose count crosses the tenant cap —
    * the load-shedding gate input (O10). */
  def overLimit(rates: DataFrame, limit: Long): DataFrame =
    rates.where(col("n") > limit)
}
