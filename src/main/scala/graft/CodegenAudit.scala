package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.debug

/** Codegen governance sweep: compiles every registered query's
  * whole-stage-codegen subtrees (AQE off, sf0.001 — same determinism
  * choices as [[PlanFingerprint]]) and fails on
  *
  *  - a subtree whose generated class does not COMPILE (Janino error —
  *    e.g. a fused method past the JVM's 64 KB bytecode limit): Spark
  *    silently re-runs the stage interpreted, so every row of what is
  *    usually the widest scan pays ~10× — invisible to correctness,
  *    exactly how `sim_ann_pq`'s unrolled 1024-term PQ encode battery
  *    shipped (caught by a log line, fixed with [[plans.PqEncode]]);
  *  - a generated method larger than HotSpot's 8000-byte JIT ceiling
  *    (`-XX:-DontCompileHugeMethods` default): it compiles, but the JIT
  *    refuses it and the hot loop runs in the bytecode interpreter.
  *
  * Reads the per-subtree [[org.apache.spark.sql.execution.debug]]
  * `ByteCodeStats` (compile failure surfaces as maxMethodCodeSize = -1).
  * Run it whenever an expression battery or wide projection changes
  * shape — it is part of the verify recipe. */
object CodegenAudit {

  /** HotSpot refuses to JIT methods over this many bytecode bytes. */
  val JitLimit = 8000

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var failed = List.empty[String]
    var huge = List.empty[String]
    var errored = List.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan
        debug.codegenStringSeq(plan).foreach { case (_, _, stats) =>
          if (stats.maxMethodCodeSize < 0) failed ::= name
          else if (stats.maxMethodCodeSize > JitLimit) {
            huge ::= name
            println(s"[cg] $name: max method ${stats.maxMethodCodeSize} B > $JitLimit (JIT-hostile)")
          }
        }
      } catch { case scala.util.control.NonFatal(e) =>
        // a query whose plan won't even build must FAIL the gate — a
        // silently-skipped query would pass the audit unexamined
        errored ::= name
        println(s"[cg] ERR $name ${String.valueOf(e.getMessage).take(100)}")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
    if (failed.nonEmpty || huge.nonEmpty || errored.nonEmpty) {
      System.err.println(
        s"[cg] FAIL: compile-failed=${failed.distinct.sorted.mkString(",")} " +
          s"jit-hostile=${huge.distinct.sorted.mkString(",")} " +
          s"errored=${errored.distinct.sorted.mkString(",")}")
      sys.exit(1)
    }
    println("[cg] PASS: every codegen stage compiles and fits the JIT method ceiling")
  }
}
