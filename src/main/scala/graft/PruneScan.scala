package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement-validity audit: for every registered query, compare the
  * executed plan's expression inventory against the plan of the same
  * query under `count()` — any non-bookkeeping expression class that
  * loses occurrences is work a count-based timing harness never
  * executes (Catalyst prunes everything the count does not need).
  *
  * Finding (r12): 133/191 queries lost work under count — for
  * projection-final queries nearly all of it (`f_crypto_roundtrip`
  * lost its 5 AES StaticInvokes, `s1_wal2json_decode` its whole
  * format/json battery, `dedup_simhash` its 120-op bit battery, the
  * Muster kernels their single kernel call). This is why `Bench.force`
  * and `WarmBench` produce FULL results through the noop sink, and why
  * probe mains aggregate OVER their computed columns instead of
  * counting. Run it after adding a measurement harness; correctness
  * gates cannot catch this class (results stay right — only the
  * timing is of a different, lighter query). */
object PruneScan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def exprClasses(p: org.apache.spark.sql.execution.SparkPlan): Map[String, Int] = {
      val m = scala.collection.mutable.Map.empty[String, Int]
      p.foreach { n => n.expressions.foreach(_.foreach { e =>
        val k = e.getClass.getSimpleName
        m.update(k, m.getOrElse(k, 0) + 1) }) }
      m.toMap
    }
    // expression classes that are cheap bookkeeping — differences in
    // these don't indicate pruned WORK
    val boring = Set("AttributeReference", "Alias", "Literal", "Count",
      "AggregateExpression", "SortOrder", "Ascending", "Descending",
      "Cast", "GetStructField", "IsNotNull", "IsNull", "Not", "And",
      "Or", "EqualTo", "PromotePrecision", "KnownFloatingPointNormalized",
      "NormalizeNaNAndZero")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val full = exprClasses(df.queryExecution.executedPlan)
        val cnt = exprClasses(
          df.groupBy().agg(count(lit(1))).queryExecution.executedPlan)
        val lost = full.collect { case (k, v)
          if !boring(k) && cnt.getOrElse(k, 0) < v => (k, v - cnt.getOrElse(k, 0)) }
        if (lost.nonEmpty)
          println(s"@@@ $name PRUNED: " + lost.toSeq.sortBy(-_._2)
            .map { case (k, d) => s"$k x$d" }.mkString(", ").take(300))
      } catch { case scala.util.control.NonFatal(e) =>
        println(s"@@@ $name ERR ${String.valueOf(e.getMessage).take(80)}") }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
