package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.debug

/** Codegen drill-down for ONE registered query: prints each whole-stage
  * subtree's ByteCodeStats and, for JIT-hostile subtrees (see
  * [[CodegenAudit]]), the subtree header plus the largest generated
  * methods by source size — enough to attribute an oversized method to
  * the operator that emitted it. Usage: `runMain graft.CgDiag <query>`. */
object CgDiag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = args(0)
    val plan = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan
    debug.codegenStringSeq(plan).zipWithIndex.foreach { case ((sub, code, st), i) =>
      println(s"=== subtree $i maxMethod=${st.maxMethodCodeSize} constPool=${st.maxConstPoolSize}")
      if (st.maxMethodCodeSize > CodegenAudit.JitLimit) {
        println(sub.linesIterator.take(12).mkString("\n"))
        val m = raw"(private|public|protected)\s+\S+\s+(\w+)\(".r
        val starts = m.findAllMatchIn(code).map(x => (x.group(2), x.start)).toList
        val sizes = starts.zip(starts.drop(1))
          .map { case ((n1, s1), (_, s2)) => (n1, s2 - s1) }
        println("largest methods (chars): " +
          sizes.sortBy(-_._2).take(8).mkString(", "))
      }
    }
    spark.stop()
  }
}
