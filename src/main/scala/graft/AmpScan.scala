package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution._

/** Plan audit for SPLIT-BOUND row amplification (round-13, the
  * `text_lm_score` lesson): a Generate (explode) multiplies each input
  * row, and everything from it to the next exchange runs at the
  * parallelism of whatever feeds it — so a Generate whose subtree
  * reaches a leaf without crossing a shuffle is bounded by INPUT
  * SPLITS, not by the cluster. At corpus scale inputs have plenty of
  * splits; at bench/test scale a small table is ONE split and the
  * whole amplified pipeline serializes onto one core (measured:
  * `text_lm_score` ran its 1.5M-gram pipeline single-task, 5.3 s warm;
  * an explicit-count pre-explode spread made it 1.55 s). The fix's own
  * trap is also detected: a column-only `repartition(col)` below a
  * Generate is AQE-COALESCIBLE and gets sized on PRE-explode bytes —
  * AQE folded the 1.5 MB doc exchange back to one partition, blind to
  * the 300× amplification above it; only an explicit partition count
  * holds.
  *
  * Report-only (exit 0): split-bound is a scale-dependent judgment —
  * a ×5 explode of a struct array is harmless anywhere, and at 100 TB
  * the scan itself has thousands of splits. The audit makes the shape
  * VISIBLE so a slow bench number is attributed in one look instead
  * of re-discovered with a profiler. Assessed residue (23 queries
  * after the r13 sweep): tokenize-explode queries measuring < 1 s
  * warm at sf0.1 (fan-out ~100× but downstream work per row is a
  * hash-agg probe — an exchange buys nothing measured), the walrus
  * subscriber fan-outs (the battery IS the work and it is row-narrow),
  * and `text_nb_classifier` — deliberately unspread: the blanket
  * docs()-source spread was A/B-measured REGRESSING it 1.73 → 2.93 s
  * warm (one exchange per docs() reference, +5 shuffles through its
  * BNL grid), which is why Spread is applied per-operator, not at the
  * source. `j_muster_claim_debounce` (r14) is the same class: its ×2
  * session explode is a cheap projection and the claim-debounce
  * window's own (grp, node) exchange sits directly above it, so a
  * pre-explode Spread was A/B-measured regressing 1.6 → 2.1 s warm at
  * sf0.1 — deliberately unspread. Anything NEW appearing here deserves
  * a WarmBench probe before shipping.
  */
object AmpScan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // does this subtree reach a leaf without crossing a real
    // (row-stream) exchange? broadcast sides don't drive parallelism
    def splitBound(p: SparkPlan): Boolean = p match {
      case _: exchange.ShuffleExchangeLike => false
      case _: exchange.BroadcastExchangeLike => false
      // a reused exchange is a LEAF node referencing the original —
      // it still provides that exchange's parallelism
      case r: exchange.ReusedExchangeExec => splitBound(r.child)
      // a cache scan is a leaf, but the cached data carries the
      // partitioning of the plan that BUILT it — recurse into it, so a
      // persisted post-spread base is not a false positive while a
      // persisted raw scan still flags
      case m: columnar.InMemoryTableScanExec =>
        splitBound(m.relation.cachedPlan)
      case leaf if leaf.children.isEmpty => true
      case other => other.children.exists(splitBound)
    }
    // a coalescible (column-only) repartition below the generate: AQE
    // sizes it on pre-explode bytes, so it does not actually spread
    def coalescibleSpread(p: SparkPlan): Boolean = p match {
      case s: exchange.ShuffleExchangeExec =>
        s.shuffleOrigin == exchange.REPARTITION_BY_COL
      case _: exchange.ShuffleExchangeLike => false
      case _: exchange.BroadcastExchangeLike => false
      case leaf if leaf.children.isEmpty => false
      case other => other.children.exists(coalescibleSpread)
    }

    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val flags = scala.collection.mutable.ArrayBuffer.empty[String]
        fn(spark, "/root/testdata/sf0.001").queryExecution.executedPlan
          .foreach {
            case g: GenerateExec =>
              if (splitBound(g.child))
                flags += s"split-bound ${g.boundGenerator.prettyName}"
              else if (coalescibleSpread(g.child))
                flags += s"coalescible-spread ${g.boundGenerator.prettyName}"
            case _ => ()
          }
        if (flags.nonEmpty)
          println(s"@@@ $name: " + flags.distinct.mkString("; ").take(300))
      } catch { case scala.util.control.NonFatal(_) => }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
