package graft
import org.apache.spark.sql.SparkSession

/** Warm count-vs-full-result A/B for named queries: times `count()`
  * (the harness Bench used through r12, under which Catalyst prunes
  * expressions the count does not need — see [[PruneScan]]) against a
  * full-result noop-sink write (the harness from r13 on). The measured
  * gap at sf0.1/32 reached 11× (`s1_wal2json_decode` 0.19 s vs
  * 2.03 s); queries whose final step is cheap relative to upstream
  * joins/aggs read ~1×. */
object TimingAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("events", "documents", "embeddings", "lineitem")
      .foreach(t => graft.cdc.ChangeFeed.table(spark, sfDir, t).count())
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      def t(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      // warm both plan shapes once, then take the min of two timed runs
      fn(spark, sfDir).count()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      val c = Seq.fill(2)(t(fn(spark, sfDir).count())).min
      val n = Seq.fill(2)(t(fn(spark, sfDir).write
        .mode("overwrite").format("noop").save())).min
      println(f"@@@ $name count=$c%.2f noop=$n%.2f ratio=${n / c}%.1f")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
