package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-17 interleaved A/B probe (the bench-measurement-discipline
  * rules: both variants in ONE JVM, alternating, compare MINS — separate
  * WarmBench invocations are not comparable below ~0.5 s effect size).
  *
  * Modes:
  *  - `slice <reps>`: the mm slice-floor adjudication (r16 VERDICT item
  *    5). `mm_frame_match`'s video synthesis+decode+phash battery runs at
  *    `ceil(1666 videos / MinRowsPerSlice=1000) = 2` tasks at sf0.1 —
  *    the floor that protected `mm_media_clusters` from 32-way
  *    oversplit fragmentation may be UNDER-splitting the frame-match
  *    battery. Arms: parallelism 0 (auto → the shipped floor), 7
  *    (floor 250), 17 (floor 100).
  *  - `robust <reps>`: the `a_robust_stats` spread adjudication (r16
  *    VERDICT item 6): the closing r16 bench read the pre-agg spread
  *    REGRESSED (0.54→0.73 warm) while the quiet-host WarmBench claimed
  *    0.79→0.63; host-control scaling said neutral. Arms: spread (the
  *    shipped shape) vs plain.
  *
  * Artifact: `ABJSON {...}` one line per mode — committed to plans/r17/
  * by the round notes. */
object AbProbeR17 {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("slice")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    spark.range(1000000).selectExpr("sum(id)").collect()
    Seq("documents", "lineitem")
      .foreach(t => graft.cdc.ChangeFeed.table(spark, sfDir, t).count())

    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    def timeOne(build: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      noop(build())
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      dt
    }

    val arms: Seq[(String, () => DataFrame)] = mode match {
      case "slice" =>
        def docsV = graft.cdc.ChangeFeed.table(spark, sfDir, "documents")
          .where(pmod(col("doc_id"), lit(3)) === 2)
        def fm(par: Int): DataFrame = {
          val media = graft.pipeline.Multimodal
            .mediaFromDocuments(docsV, parallelism = par)
            .as[graft.pipeline.Multimodal.MediaRecord]
          graft.pipeline.Multimodal.frameMatches(media, maxHamming = 0)(spark)
        }
        Seq(("auto_floor1000", () => fm(0)),
          ("par7_floor250", () => fm(7)),
          ("par17_floor100", () => fm(17)))
      case "slice2" =>
        // the OTHER side of the floor trade: mm_media_clusters' decode
        // (all 5000 docs, all three modality hash paths via
        // mediaNearDupPairs). Floor 250 puts this at 20 slices — toward
        // the r9 oversplit pathology — so the floor may be a tension
        // between the two query families.
        def docsAll = graft.cdc.ChangeFeed.table(spark, sfDir, "documents")
        def pairs(par: Int): DataFrame = {
          val media = graft.pipeline.Multimodal
            .mediaFromDocuments(docsAll, parallelism = par)
            .as[graft.pipeline.Multimodal.MediaRecord]
          graft.pipeline.Multimodal.mediaNearDupPairs(media, maxHamming = 7)(spark)
        }
        Seq(("auto_floor1000", () => pairs(0)),
          ("par20_floor250", () => pairs(20)))
      case "robust" =>
        def base = graft.cdc.ChangeFeed.table(spark, sfDir, "lineitem")
          .select("l_orderkey", "l_returnflag", "l_quantity")
        Seq(
          ("spread", () => graft.pipeline.Profile.robustStats(
            graft.pipeline.Spread(base, col("l_orderkey")),
            "l_returnflag", "l_quantity")),
          ("plain", () => graft.pipeline.Profile.robustStats(
            base, "l_returnflag", "l_quantity")))
      case other => sys.error(s"unknown mode $other")
    }

    // warm every arm once (codegen/JIT), then interleave the timed reps
    arms.foreach { case (_, b) => noop(b()); spark.catalog.clearCache() }
    val readings = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    (1 to reps).foreach { _ =>
      arms.foreach { case (name, b) =>
        readings(name) = readings(name) :+ timeOne(b)
      }
    }
    def f3(d: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    val body = arms.map { case (name, _) =>
      val xs = readings(name)
      s""""$name":{"min":${f3(xs.min)},"median":${f3(xs.sorted.apply(xs.size / 2))},""" +
        s""""all":[${xs.map(f3).mkString(",")}]}"""
    }.mkString(",")
    println(s"""ABJSON {"mode":"$mode","reps":$reps,"cpus":$cpus,$body}""")
    spark.stop()
  }
}
