package graft
import org.apache.spark.sql.SparkSession
object WarmBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    Seq("events", "documents").foreach(t => graft.cdc.ChangeFeed.table(spark, sfDir, t).count())
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("j1_walrus_200subs", "j1_walrus_generic", "dedup_simhash_pairs")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (0 until 4).map { _ =>
        val t0 = System.nanoTime()
        // full-result semantics, matching Bench.force — a bare count()
        // lets Catalyst prune projection-final work (see Bench scaladoc)
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      println(f"WARM $name cold=${times.head}%.2f warm=${times.tail.map(t => f"$t%.2f").mkString(",")} warm_min=${times.tail.min}%.2f")
    }
    spark.stop()
  }
}
