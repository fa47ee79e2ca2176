package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._

/** Plan audit, the general form of [[JsonParseScan]]: flag any
  * registered query whose executed plan evaluates ≥4 semantically-equal
  * copies of an expensive expression inside one operator. Caught (r12):
  * `dedup_incremental` re-hashing the full document text 10× in the
  * bloom routing filter on BOTH join sides (fixed with the EvalOnce
  * fence — including the InferFiltersFromConstraints copy of the bloom
  * test onto the history side, which the fence keeps as a cheap
  * attribute test), and `dedup_simhash` carrying 15 inlined copies of
  * the word digest (fixed by binding the hex once as its own column).
  * Remaining hits, assessed and left: `text_langid` (6 splits feeding 6
  * interpreted stopword HOF filters — identical codegen'd splits fold
  * under WSCG subexpression elimination where eligible; 0.5 s warm at
  * sf0.1) and `text_quality` (4 splits, same shape, 0.6 s).
  *
  * Reading the operator column matters: duplicates located in a
  * PROJECT or AGGREGATE of identical, codegen-capable expressions are
  * folded at runtime by whole-stage-codegen subexpression elimination
  * (`p6_column_projection`'s JsonStructProject ×3 via the shared
  * `tooLarge` guard, `s1_wal_pipeline`'s JsonMapProject ×2 — benign);
  * duplicates in a FILTER, join condition, or scan data-filter are
  * REAL — FilterExec does not subexpression-eliminate, and
  * CodegenFallback children (from_json, HOF lambdas) are never
  * eligible anywhere. A Filter+Scan pair WITHOUT a Project copy is a
  * display mirror of one runtime evaluation (the curation sampling
  * predicates). The r12 fixes were all Filter-located: wal2json
  * 27–54×, bloom md5 10×, every `explode(words(...))` re-tokenizing
  * in InferFiltersFromGenerate's synthesized pre-filter, and
  * `sim_ann_ivf`'s ArgmaxDot×2 + NormalizeVec×2 (the IVF build's
  * dominant flops, also inside every trainCentroids Lloyd iteration).
  * Known-and-accepted residue: SubscriptionBattery Filter + Project
  * on `p6_column_projection` / `p_error_rows_*` / `s1_wal_pipeline`
  * (the p6/p_error rows read ×3 because the pushed filter ALSO shows
  * in the scan node — the display-mirror class above, one runtime
  * evaluation; verified unchanged against the r13 baseline) — fencing
  * it breaks the battery's split-method codegen (Janino
  * forward-reference, CodegenAudit catch; the fix would be reworking
  * SubscriptionBattery.doGenCode's parameter collection, not worth it
  * for three sub-second compositions). r15 adds `s7_send_binary`
  * (EvalOnce ×5 in Project): the three-leg digest mix UNIONs a
  * send_binary branch and a send branch that each scan documents and
  * compute the fenced md5 for their digit filter — Spark has no CSE
  * across union branches, so the digest runs twice per document row
  * plus once per payload fence. The leg split is the TEST HARNESS
  * construct (a real pipeline routes by payload type, not by digest
  * digit); 0.49 s warm at sf0.1, assessed and left. */
object DupExprScan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // expression classes whose per-row cost is large enough that
    // duplicate evaluation in one operator is a plan smell
    def expensive(e: Expression): Boolean = e match {
      case _: JsonToStructs | _: StructsToJson | _: RegExpExtractAll |
           _: RegExpReplace | _: RegExpExtract | _: Md5 | _: Sha2 |
           _: StringSplit | _: ArraySort | _: SortArray |
           _: org.apache.spark.sql.catalyst.expressions.aggregate.Percentile |
           _: AesEncrypt | _: AesDecrypt => true
      case _: ArrayTransform | _: ArrayFilter | _: ZipWith => true
      case _ => false
    }
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val hits = scala.collection.mutable.Map.empty[(String, String), Int]
        // canonical expensive expr -> operator node names it appears in;
        // one copy in a Filter AND one in the Project above is a REAL
        // double evaluation (cross-node, so CSE can never fold it) that
        // a per-node threshold misses
        val nodesOf = scala.collection.mutable.Map
          .empty[Expression, scala.collection.mutable.Set[String]]
        var nodeIdx = 0
        fn(spark, "/root/testdata/sf0.001").queryExecution.executedPlan
          .foreach { p =>
            nodeIdx += 1
            val tag = s"${p.nodeName}#$nodeIdx"
            val local = scala.collection.mutable.Map.empty[Expression, Int]
            p.expressions.foreach(_.foreach { e =>
              if (expensive(e) || e.getClass.getName.startsWith("graft.plans.")) {
                val k = local.keys.find(_.semanticEquals(e)).getOrElse(e)
                local.update(k, local.getOrElse(k, 0) + 1)
              }
            })
            local.foreach { case (e, n) =>
              if (n >= 4)
                hits.update((p.nodeName, e.getClass.getSimpleName),
                  math.max(hits.getOrElse((p.nodeName, e.getClass.getSimpleName), 0), n))
              val k = nodesOf.keys.find(_.semanticEquals(e)).getOrElse(e)
              nodesOf.getOrElseUpdate(k, scala.collection.mutable.Set.empty)
                .add(tag)
            }
          }
        nodesOf.foreach { case (e, nodes) =>
          // EvalOnce-fenced copies and benign Project+Project pairs
          // (downstream re-projection of an attribute) still share the
          // canonical form; only flag when a Filter/Join/Scan node holds
          // a copy alongside another node
          val hot = nodes.exists(t => t.startsWith("Filter") ||
            t.contains("Join") || t.startsWith("Scan"))
          if (nodes.size >= 2 && hot)
            hits.update(("cross:" + nodes.toSeq.sorted.mkString("+"),
              e.getClass.getSimpleName), nodes.size)
        }
        if (hits.nonEmpty)
          println(s"@@@ $name: " + hits.toSeq.sortBy(-_._2)
            .map { case ((op, cls), n) => s"$cls x$n in $op" }.mkString("; ").take(300))
      } catch { case scala.util.control.NonFatal(_) => }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
