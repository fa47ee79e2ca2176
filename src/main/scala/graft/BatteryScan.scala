package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution._

/** Plan audit for SPLIT-BOUND per-row batteries (round-16 — the
  * projection/partial-agg generalization of [[AmpScan]]'s explode rule):
  * a heavy per-row battery (JSON parse/render, crypto, regex, codec
  * map/flatMap, HOF folds, decimal moment sums in a PARTIAL aggregate)
  * that sits below its plan's first row-stream exchange runs at the
  * parallelism of the leaf scan — one task for a one-split table, the
  * bench/test shape, or any badly-compacted production input. r16 found
  * 20 registered queries in this shape (the whole wal2json/debezium/
  * pgoutput decode family, the crypto round-trip, the V2 frame codec,
  * the walrus batteries, regex feature extraction, the exact-decimal
  * correlation) and fixed them with the conditional
  * [[graft.pipeline.Spread]]; measured 2.09 → 0.58 s warm on
  * `s1_wal2json_decode` at sf0.1/32.
  *
  * Report-only (exit 0), same contract as AmpScan: the weight gate is a
  * heuristic and split-bound is a scale-dependent judgment — anything
  * NEW appearing here deserves a WarmBench A/B (a spread costs one
  * narrow exchange and has been measured REGRESSING cheap batteries;
  * see AmpScan's text_nb_classifier note) before shipping a fix.
  * Assessed residue after the r16 sweep: object-codec one-row-in/
  * one-row-out maps measuring < 0.5 s warm at sf0.1 (`s4_message_scan`,
  * `f_scalar_funcs`, `src_replay_log`-style shapes), and batteries
  * whose first exchange is the work's own aggregate at < 1 s warm.
  */
object BatteryScan {
  /** Expression classes whose per-row cost dominates a battery. */
  private def heavy(e: Expression): Boolean = {
    val n = e.getClass.getSimpleName
    n match {
      case "JsonToStructs" | "StructsToJson" | "JsonTuple" |
           "GetJsonObject" => true
      case "Md5" | "Sha1" | "Sha2" | "Crc32" | "AesEncrypt" |
           "AesDecrypt" => true
      case "RegExpReplace" | "RegExpExtract" | "RegExpExtractAll" |
           "RLike" | "StringSplit" | "SplitPart" => true
      case "FormatString" | "Conv" | "Hex" | "Unhex" | "Base64" |
           "UnBase64" => true
      case "ArrayTransform" | "ArrayFilter" | "ArrayAggregate" |
           "ZipWith" | "MapFromEntries" | "ArraySort" => true
      case "ScalaUDF" | "Invoke" | "StaticInvoke" => true
      case _ => false
    }
  }

  def main(args: Array[String]): Unit = {
    val minWeight = args.headOption.map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // AmpScan's split-bound test: does this subtree reach a leaf
    // without crossing a row-stream exchange?
    def splitBound(p: SparkPlan): Boolean = p match {
      case _: exchange.ShuffleExchangeLike => false
      case _: exchange.BroadcastExchangeLike => false
      case r: exchange.ReusedExchangeExec => splitBound(r.child)
      case m: columnar.InMemoryTableScanExec =>
        splitBound(m.relation.cachedPlan)
      case leaf if leaf.children.isEmpty => true
      case other => other.children.exists(splitBound)
    }

    def weightOf(p: SparkPlan): Int = {
      var w = 0
      p.expressions.foreach(_.foreach(e => if (heavy(e)) w += 1))
      // object-codec pipelines: the per-row work is opaque Scala, count
      // the boundary itself as heavy
      p match {
        case _: MapPartitionsExec | _: SerializeFromObjectExec => w += 2
        case _ => ()
      }
      w
    }

    // same env contract as PlanDump: the audit must scan the dataset the
    // host actually has, not a hard-coded path
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.001")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        var weight = 0
        val kinds = scala.collection.mutable.SortedSet.empty[String]
        fn(spark, sfDir).queryExecution.executedPlan
          .foreach { p =>
            val local = weightOf(p)
            // only batteries BELOW the first exchange are split-bound;
            // Generate amplification is AmpScan's beat — skip it here
            if (local > 0 && splitBound(p) && !p.isInstanceOf[GenerateExec]) {
              weight += local
              p.expressions.foreach(_.foreach(e =>
                if (heavy(e)) kinds += e.getClass.getSimpleName))
              p match {
                case _: MapPartitionsExec | _: SerializeFromObjectExec =>
                  kinds += "ObjectCodec"
                case _ => ()
              }
            }
          }
        if (weight >= minWeight)
          println(s"@@@ $name: split-bound battery weight=$weight " +
            kinds.mkString("[", ",", "]").take(220))
      } catch { case scala.util.control.NonFatal(e) =>
        // a query that fails to plan must read as MISSING COVERAGE, not
        // as clean (PlanDump's error-path discipline)
        println(s"[batteryscan] $name FAILED: $e")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
