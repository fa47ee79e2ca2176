package graft
import org.apache.spark.sql.SparkSession

/** Plan audit: count `JsonToStructs` (from_json) occurrences per
  * registered query's executed plan and flag any query that parses
  * more than once. Catalyst pushes predicates on decoded fields below
  * the decode projection and then rewrites each pushed reference into
  * its own single-field re-parse — before the [[graft.plans.EvalOnce]]
  * fence, the wal2json consumers re-parsed each raw JSON string 27–54×
  * per row (`s1_wal_mirror` 27, `s1_wal_scd2`/`j_asof_pit` 28,
  * `s1_mirror_diff` 54; warm cost halved when fenced). Run after
  * touching any from_json-based decoder or a consumer that filters on
  * its output.
  *
  * Assessed residue (counts are DISTINCT parses, not re-parses of one
  * input): `s1_wal_mirror`/`s1_wal_scd2` 2 and `s1_mirror_diff` 4 (two
  * fenced legs), `j_asof_pit` 2 (two format dialects), and
  * `p_join_config_parse` 6 — the join-payload changeset parses SIX
  * NESTING LEVELS (payload → config → broadcast/presence → replay /
  * postgres_changes), each level's raw text parsed exactly once and
  * EvalOnce-fenced; the levels are different inputs, so the per-row
  * bytes parsed ≈ payload + config subtree once each, not 6× the
  * payload. */
object JsonParseScan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        var n = 0
        fn(spark, "/root/testdata/sf0.001").queryExecution.executedPlan
          .foreach { p => p.expressions.foreach(_.foreach {
            case _: org.apache.spark.sql.catalyst.expressions.JsonToStructs => n += 1
            case _ => }) }
        if (n > 1) println(s"@@@ $name: $n JsonToStructs")
      } catch { case scala.util.control.NonFatal(e) =>
        println(s"@@@ $name ERR") }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
