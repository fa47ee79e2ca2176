package graft
import org.apache.spark.sql.SparkSession

/** Plan governance sweep: builds every registered query at sf0.001 and
  * flags unpartitioned window operators. A global window is a
  * single-task sort — allowed ONLY where the frame is bounded by
  * construction: after a `.limit(k)` (the distributed TakeOrdered
  * already happened; the window re-sorts ≤ k rows) or over a
  * dimension-capped grid (χ² cells, per-source shares). Any query
  * outside the whitelist fails the audit — run it whenever an operator
  * changes shape (it is part of the verify recipe). */
object PlanAudit {
  /** Queries whose global windows are k-capped (rank after limit) or
    * dimension-capped (category grids); each is bounded at ANY corpus
    * size, so the single task holds ≤ k / |dims| rows. */
  val boundedGlobalWindows: Set[String] = Set(
    "a_chisq",              // R×C category grid marginals
    "a_skew_keys",          // rank over limit(topK)
    "curation_source_mix",  // per-source shares, |sources| rows
    "obs_janitor_sweep",    // chunk assignment over |tenants| (config-sized)
    "text_bm25",            // rank over limit(k)
    "text_keyphrases",      // rank over limit(k)
    "text_ndcg",            // ideal/actual ranks over limit(k)
    "text_rrf",             // per-list + fused ranks over limit(k)
    "text_textrank",        // rank over limit(k)
    "text_zipf")            // rank over limit(topK)

  /** Queries whose global SortExec is bounded by construction — a
    * re-sort of ≤k rows AFTER a limit (chronological delivery order of
    * a replay page). Any OTHER global sort is a range-partitioned sort
    * of unbounded input — the mid-plan orderBy+limit trap that
    * Similarity.centroids fell into (Spark rewrites sort+limit to the
    * distributed TakeOrdered heap only at the plan ROOT) — and fails
    * the audit. */
  val boundedGlobalSorts: Set[String] = Set(
    "w1_replay_topk")       // ≤25-row page re-sorted to delivery order

  /** Queries with an ASSESSED shrinking window frame (lower bound moves,
    * upper bound UNBOUNDED FOLLOWING). Spark's
    * UnboundedFollowingWindowFunctionFrame recomputes the aggregate from
    * scratch for every row — O(rows²) PER KEY, invisible at test scale
    * and lethal on a hot key (r14: claim debounce's min-over-following
    * burned 100+ CPU-minutes single-threaded on a 1M-delta key in the
    * 10M RegisterProbe; rewritten to an incremental lead(), 2.2 s).
    * Entire-partition frames (unbounded BOTH ways) are fine — computed
    * once per group. Empty until someone earns an entry with a measured
    * per-key row bound. */
  val assessedShrinkingFrames: Set[String] = Set()

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var bad = List.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan
        var n = 0
        var sorts = 0
        var shrink = 0
        plan.foreach {
          case w: org.apache.spark.sql.execution.window.WindowExec =>
            if (w.partitionSpec.isEmpty) n += 1
            // shrinking frame: moving lower bound + UNBOUNDED FOLLOWING
            // upper — Spark recomputes it from scratch per row (O(rows²)
            // per key); entire-partition frames evaluate once per group
            import org.apache.spark.sql.catalyst.expressions.{
              SpecifiedWindowFrame, UnboundedFollowing, UnboundedPreceding,
              WindowExpression, WindowSpecDefinition}
            w.windowExpression.foreach(_.foreach {
              case WindowExpression(_, WindowSpecDefinition(_, _,
                  SpecifiedWindowFrame(_, lower, upper)))
                if upper == UnboundedFollowing &&
                  lower != UnboundedPreceding => shrink += 1
              case _ => ()
            })
          case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec
            if w.partitionSpec.isEmpty => n += 1
          case s: org.apache.spark.sql.execution.SortExec if s.global =>
            sorts += 1
          case _ =>
        }
        if (n > 0 && !boundedGlobalWindows.contains(name)) bad ::= name
        else if (n > 0) println(s"[audit] $name: $n bounded global window(s) (whitelisted)")
        if (sorts > 0 && !boundedGlobalSorts.contains(name)) bad ::= name
        else if (sorts > 0) println(s"[audit] $name: $sorts bounded global sort(s) (whitelisted)")
        if (shrink > 0 && !assessedShrinkingFrames.contains(name)) {
          bad ::= name
          println(s"[audit] $name: $shrink SHRINKING window frame(s) — O(rows²) per key")
        } else if (shrink > 0)
          println(s"[audit] $name: $shrink shrinking frame(s) (assessed)")
      } catch { case scala.util.control.NonFatal(e) =>
        // a plan that fails to build must fail the audit, not skip it
        bad ::= name
        println(s"[audit] ERR $name ${String.valueOf(e.getMessage).take(100)}")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
    if (bad.nonEmpty) {
      System.err.println(s"[audit] UNBOUNDED global windows/sorts (or plan-build ERR) in: ${bad.sorted.mkString(", ")}")
      sys.exit(1)
    }
    println("[audit] PASS: no unbounded global windows or sorts")
  }
}
