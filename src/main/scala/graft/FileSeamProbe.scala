package graft

import graft.sources.{FileReplayLog, FileReplayLogSink}
import org.apache.spark.sql.SparkSession

/** The DURABLE outbound seam at knee-order rates: the full pipeline's
  * fan-out produced through [[FileReplayLogSink]] — every frame
  * length-framed onto disk, published per partition per micro-batch —
  * with commit→produce-return latency clocked by the standard harness.
  * The in-JVM `via_log_sink` artifact point proves the KEYED-produce
  * seam shape; this probe adds the question that seam can't answer:
  * does writing the bytes durably (file + index append + per-batch
  * flush) move the sustained-rate story? One line per (rate,
  * partitions) for COVERAGE. */
object FileSeamProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.cdc.StreamLatency.run(spark, 1000, 4, 100L, 2) // warm
    val root = java.nio.file.Files.createTempDirectory("fileseam")
      .toFile.getAbsolutePath
    for (rate <- Seq(320000, 640000); parts <- Seq(8, cpus.toInt)) {
      System.gc(); Thread.sleep(200L)
      val topic = s"seam-$rate-$parts"
      val sink = new FileReplayLogSink(root, topic, parts)
      val r = graft.cdc.StreamLatency.run(spark, rate, 6, 100L, 2,
        viaSink = Some(sink))
      val end = FileReplayLog.endOffsets(root, topic).values.sum
      val bytes = FileReplayLog.partitions(root, topic).map(p =>
        new java.io.File(new java.io.File(root, topic), s"p$p.log").length).sum
      println(s"[fileseam] rate=$rate parts=$parts sent=${r.nSent} " +
        s"delivered=${r.nDelivered} durable=$end " +
        s"mb_on_disk=${bytes / 1048576} " +
        s"p50=${r.steady.p50} p95=${r.steady.p95} p99=${r.steady.p99} " +
        s"sustained=${r.nDelivered == r.nSent && r.steady.p99 <= 1000}")
      FileReplayLog.delete(root, topic)
    }
    spark.stop()
  }
}
