package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.debug
object CgDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("FATAL")
    val name = args(0)
    val idx = args(1).toInt
    val plan = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan
    val (sub, code, _) = debug.codegenStringSeq(plan)(idx)
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/cg_sub.txt"), sub)
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/cg_code.java"), code)
    println("dumped")
    spark.stop()
  }
}
