package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the first thing a pipeline runs against an unknown
  * 100 TB table: one row per profiled column with row/null/distinct
  * counts and native min/max (rendered as strings so heterogeneous
  * columns stack into one result).
  *
  * Shape: one full-column aggregate per profiled column, unioned — each
  * aggregate is a partial-then-final hash aggregate over the scan, and
  * Catalyst prunes the scan to exactly the profiled column per branch.
  * Distinct counts are EXACT (countDistinct): approximate HLL sketches
  * are cheaper at scale but engine-specific, which would break the
  * cross-engine determinism this repo treats as a feature — swap in
  * `approx_count_distinct` per call site when 2% error is acceptable. */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.map { c =>
      df.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_s"),
        max(col(c)).cast("string").as("max_s"))
        .select(lit(c).as("column_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_s"), col("max_s"))
    }.reduce(_ unionByName _)
}
