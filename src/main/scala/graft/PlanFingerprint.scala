package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan

/** Plan-shape regression lock over the whole query registry: a
  * fingerprint (counts of the EXPENSIVE operators — exchanges, join
  * strategies, windows) per registered query, checked against a
  * committed baseline. `PlanAudit` guards one invariant (no unbounded
  * global windows); this guards the rest of the physical shape — a
  * refactor that silently turns a broadcast join into a sort-merge
  * join, or adds a shuffle to a narrow pipeline, fails the gate even
  * though every row still comes out right.
  *
  * Usage:
  *   runMain graft.PlanFingerprint check  [sfDir] [file]   — verify (exit 1 on drift)
  *   runMain graft.PlanFingerprint write  [sfDir] [file]   — regenerate baseline
  *
  * The baseline (`PLAN_FINGERPRINTS.json`) is committed; adding or
  * reshaping a query is a CONSCIOUS act: regenerate, eyeball the diff
  * in review, commit. Fingerprints are computed with AQE off at
  * sf0.001 (plan shape, not runtime re-planning — AQE still runs in
  * production; the lock pins what Catalyst hands it). Counts, not
  * positions: resilient to harmless rewrites, sensitive to any change
  * in how often the cluster pays for a shuffle/broadcast/sort/window.
  */
object PlanFingerprint {

  import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
  import org.apache.spark.sql.execution.joins._
  import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
  import org.apache.spark.sql.execution.SortExec

  def fingerprint(plan: SparkPlan): Map[String, Int] = {
    val counts = scala.collection.mutable.Map.empty[String, Int]
    def inc(k: String): Unit = counts.update(k, counts.getOrElse(k, 0) + 1)
    plan.foreach {
      case _: ShuffleExchangeExec        => inc("shuffle")
      case _: BroadcastExchangeExec      => inc("broadcast")
      case _: SortMergeJoinExec          => inc("sort_merge_join")
      case _: ShuffledHashJoinExec       => inc("shuffled_hash_join")
      case _: BroadcastHashJoinExec      => inc("broadcast_hash_join")
      case _: BroadcastNestedLoopJoinExec => inc("bnl_join")
      case _: CartesianProductExec       => inc("cartesian")
      case w: WindowExec =>
        inc(if (w.partitionSpec.isEmpty) "global_window" else "window")
      case w: WindowGroupLimitExec =>
        inc(if (w.partitionSpec.isEmpty) "global_window_limit" else "window_limit")
      case s: SortExec if s.global      => inc("global_sort")
      case _ =>
    }
    counts.toMap
  }

  def render(fp: Map[String, Int]): String =
    fp.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(",")

  private def computeAll(spark: SparkSession, sfDir: String): Map[String, String] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val fp =
        try render(fingerprint(fn(spark, sfDir).queryExecution.executedPlan))
        catch { case scala.util.control.NonFatal(e) =>
          s"ERR:${String.valueOf(e.getMessage).take(60)}" }
      spark.catalog.clearCache()
      name -> fp
    }.toMap

  private def writeBaseline(file: String, fps: Map[String, String]): Unit = {
    val body = fps.toSeq.sorted
      .map { case (n, f) => s"""  "$n": "$f"""" }.mkString("{\n", ",\n", "\n}\n")
    Files.writeString(Paths.get(file), body)
  }

  private def readBaseline(file: String): Map[String, String] = {
    val entry = """"([^"]+)":\s*"([^"]*)"""".r
    entry.findAllMatchIn(Files.readString(Paths.get(file)))
      .map(m => m.group(1) -> m.group(2)).toMap
  }

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("check")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val file = if (args.length > 2) args(2) else "PLAN_FINGERPRINTS.json"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val now = computeAll(spark, sfDir)
    spark.stop()
    mode match {
      case "write" =>
        writeBaseline(file, now)
        println(s"[fp] wrote ${now.size} fingerprints to $file")
      case "check" =>
        val base = readBaseline(file)
        val drifted = now.filter { case (n, f) => base.get(n).exists(_ != f) }
        val missing = now.keySet.diff(base.keySet)
        val removed = base.keySet.diff(now.keySet)
        drifted.toSeq.sorted.foreach { case (n, f) =>
          println(s"[fp] DRIFT $n\n[fp]   baseline: ${base(n)}\n[fp]   now:      $f") }
        missing.toSeq.sorted.foreach(n => println(s"[fp] NEW (not in baseline): $n"))
        removed.toSeq.sorted.foreach(n => println(s"[fp] REMOVED from registry: $n"))
        if (drifted.nonEmpty || missing.nonEmpty || removed.nonEmpty) {
          System.err.println(s"[fp] FAIL: ${drifted.size} drifted, " +
            s"${missing.size} new, ${removed.size} removed — if intentional, " +
            "regenerate: runMain graft.PlanFingerprint write")
          sys.exit(1)
        }
        println(s"[fp] PASS: ${now.size} query plans match the baseline")
      case other =>
        System.err.println(s"[fp] unknown mode $other"); sys.exit(2)
    }
  }
}
