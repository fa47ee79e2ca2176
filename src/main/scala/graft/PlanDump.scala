package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** Dump `explain("formatted")` for the named queries to
  * `plans/r16/<name>_<tag>.txt` — the optimization round's before/after
  * plan evidence (`runMain graft.PlanDump <tag> [name...]`; names default
  * to every registered query). Session shape matches Bench (AQE on,
  * shuffle partitions = cpus) so the dumped plans are the benched plans. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args.headOption.getOrElse("before")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR", "plans/r17"))
    Files.createDirectories(outDir)
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(outDir.resolve(s"${n}_$tag.txt"),
          txt.getBytes(StandardCharsets.UTF_8))
        spark.catalog.clearCache()
        println(s"[plandump] wrote ${n}_$tag.txt")
      } catch { case scala.util.control.NonFatal(e) =>
        println(s"[plandump] $n FAILED: $e")
      }
    }
    spark.stop()
  }
}
