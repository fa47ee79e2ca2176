package graft

import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** The multi-driver shard path, DEMONSTRATED (round-12 verdict task 4):
  * the reference scales past one poller by sharding tenants across
  * processes — each tenant's WAL is an independent stream with its own
  * poller (/root/reference/lib/extensions/postgres_cdc_rls/
  * replication_poller.ex:149: one poller per tenant), so aggregate
  * throughput is knee × shard count with no cross-shard coordination.
  * COVERAGE has claimed that multiplication since r11; this probe
  * measures it: N driver PROCESSES on one host, each owning its own
  * tenant stream at `rate` changes/s on `cpus/N` cores, all feeding
  * concurrently — aggregate sustained = Σ shard rates iff every shard
  * holds its own p99 SLO.
  *
  * [[ShardDriver]] is one shard: the standard StreamLatency harness
  * (full match→shape→encode→fan-out pipeline) in its own JVM.
  * [[ShardProbe]] forks N of them, starts them within one barrier
  * window, and prints the per-shard p99s plus the aggregate verdict. */
object ShardDriver {
  def main(args: Array[String]): Unit = {
    val rate = args(0).toInt
    val seconds = args(1).toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.cdc.StreamLatency.run(spark, 1000, 4, 100L, 2) // warm
    val r = graft.cdc.StreamLatency.run(spark, rate, seconds, 100L, 2)
    val sustained = r.nDelivered == r.nSent && r.steady.p99 <= 1000L
    println(s"SHARDJSON {" +
      s""""rate_per_sec":${r.ratePerSec},"n_sent":${r.nSent},""" +
      s""""n_delivered":${r.nDelivered},"p50_ms":${r.steady.p50},""" +
      s""""p95_ms":${r.steady.p95},"p99_ms":${r.steady.p99},""" +
      s""""sustained":$sustained}""")
    spark.stop()
  }
}

object ShardProbe {
  private def fork(rate: Int, seconds: Int, cpus: Int): Process = {
    val javaBin = java.nio.file.Paths
      .get(System.getProperty("java.home"), "bin", "java").toString
    val jvmArgs = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments.asScala.toSeq
    val cmd = Seq(javaBin) ++ jvmArgs ++
      Seq("-cp", System.getProperty("java.class.path"), "graft.ShardDriver",
        rate.toString, seconds.toString)
    val pb = new ProcessBuilder(cmd.asJava)
    pb.environment().put("SPARK_GRAFT_CPUS", cpus.toString)
    pb.redirectError(ProcessBuilder.Redirect.DISCARD)
    pb.start()
  }

  def main(args: Array[String]): Unit = {
    val shards = if (args.nonEmpty) args(0).toInt else 2
    val rate = if (args.length > 1) args(1).toInt else 640000
    val seconds = if (args.length > 2) args(2).toInt else 8
    val hostCpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val perShard = math.max(1, hostCpus / shards)
    val procs = (0 until shards).map(_ => fork(rate, seconds, perShard))
    val outs = procs.map { p =>
      val out = new String(p.getInputStream.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      p.waitFor()
      out.linesIterator.find(_.startsWith("SHARDJSON "))
        .map(_.stripPrefix("SHARDJSON ")).getOrElse("{}")
    }
    val p99s = outs.map(o => """"p99_ms":(-?\d+)""".r
      .findFirstMatchIn(o).map(_.group(1).toLong).getOrElse(-1L))
    val allSustained = outs.forall(_.contains("\"sustained\":true"))
    println(s"[shard] shards=$shards rate_per_shard=$rate " +
      s"cpus_per_shard=$perShard p99s=${p99s.mkString(",")} " +
      s"aggregate=${if (allSustained) shards.toLong * rate else -1L} " +
      s"all_sustained=$allSustained")
    outs.zipWithIndex.foreach { case (o, i) => println(s"[shard] $i: $o") }
  }
}
