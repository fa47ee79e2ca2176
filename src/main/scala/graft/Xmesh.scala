package graft

import graft.sources.Mesh
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** One mesh node as its own JVM (the gen_rpc peer process): binds an
  * ephemeral port, publishes it, waits for the parent's wire file (the
  * full id → port map — cluster discovery), then serves. Deliveries are
  * appended to a per-node file as `msgId sender hop` lines; exits on the
  * stop marker. */
object XmeshNode {
  def main(args: Array[String]): Unit = {
    val Array(idStr, topoSpec, dir) = args.take(3)
    val id = idStr.toInt
    // topoSpec: "id:region,id:region,…" — ports come later via the wire
    val topo = topoSpec.split(',').map { t =>
      val Array(n, r) = t.split(':'); n.toInt -> (0, r.toInt)
    }.toMap
    val out = Files.newBufferedWriter(Paths.get(s"$dir/deliveries.$id"))
    val node = new Mesh.Node(id, topo, (m, s, hop) =>
      out.synchronized { out.write(s"$m $s $hop\n"); out.flush() })
    val tmp = Paths.get(s"$dir/port.$id.tmp")
    Files.writeString(tmp, node.localPort.toString)
    Files.move(tmp, Paths.get(s"$dir/port.$id"),
      StandardCopyOption.ATOMIC_MOVE)
    // wait for cluster discovery, then serve
    val wire = Paths.get(s"$dir/wire")
    while (!Files.exists(wire)) Thread.sleep(20L)
    node.rewire(Files.readString(wire).trim.split(',').map { t =>
      val Array(n, p) = t.split(':'); n.toInt -> p.toInt
    }.toMap)
    node.start()
    val tmpR = Paths.get(s"$dir/ready.$id.tmp")
    Files.writeString(tmpR, "ready")
    Files.move(tmpR, Paths.get(s"$dir/ready.$id"),
      StandardCopyOption.ATOMIC_MOVE)
    while (!Files.exists(Paths.get(s"$dir/stop"))) Thread.sleep(50L)
    node.stop()
    out.synchronized { out.flush(); out.close() }
  }
}

/** Cross-PROCESS fan-out probe: ten mesh-node JVMs on loopback TCP run
  * the two-tier gen_rpc forward graph for 5 000 published messages, and
  * the union of their delivery logs must equal
  * [[graft.presence.Fanout.hopPlan]]'s relational answer EXACTLY —
  * exactly-once per (msg, node), hop attribution identical, FIFO per
  * (sender, node). The process boundary is the point: every seam the
  * sandbox can exercise (discovery, dialing, forwarding, relaying,
  * interleaved delivery under real scheduling) is crossed for real;
  * only the machine boundary is left to deployment. Prints one
  * `[xmesh] … verdict=…` line for COVERAGE. */
object XmeshProbe {
  private def fork(main: String, args: Seq[String]): Process = {
    val javaBin = Paths.get(System.getProperty("java.home"), "bin", "java")
      .toString
    // drop the orchestrator's heap flags: ten 96 GB-sized children is
    // silly for a socket loop — 128 MB each is generous
    val jvmArgs = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments.asScala.toSeq
      .filterNot(a => a.startsWith("-Xmx") || a.startsWith("-Xms"))
    val cmd = Seq(javaBin) ++ jvmArgs ++ Seq("-Xmx128m",
      "-cp", System.getProperty("java.class.path"), main) ++ args
    val pb = new ProcessBuilder(cmd.asJava)
    pb.redirectError(ProcessBuilder.Redirect.DISCARD)
    pb.redirectOutput(ProcessBuilder.Redirect.INHERIT)
    pb.start()
  }

  def main(args: Array[String]): Unit = {
    val nMsgs = if (args.nonEmpty) args(0).toInt else 5000
    val topo = (0 until 10).map(n => (n, n % 3))
    val dir = Files.createTempDirectory("xmesh").toFile.getAbsolutePath
    val topoSpec = topo.map { case (n, r) => s"$n:$r" }.mkString(",")
    val procs = topo.map { case (n, _) =>
      fork("graft.XmeshNode", Seq(n.toString, topoSpec, dir))
    }
    sys.addShutdownHook {
      try Files.writeString(Paths.get(s"$dir/stop"), "stop")
      catch { case _: Exception => () }
      procs.foreach(_.destroyForcibly())
    }
    def await(path: String): String = {
      var s = Option.empty[String]
      while (s.isEmpty) {
        if (Files.exists(Paths.get(path)))
          s = scala.util.Try(Files.readString(Paths.get(path))).toOption
        if (s.isEmpty) Thread.sleep(20L)
      }
      s.get
    }
    val ports = topo.map { case (n, _) => n -> await(s"$dir/port.$n").trim.toInt }
    val tmp = Paths.get(s"$dir/wire.tmp")
    Files.writeString(tmp,
      ports.map { case (n, p) => s"$n:$p" }.mkString(","))
    Files.move(tmp, Paths.get(s"$dir/wire"), StandardCopyOption.ATOMIC_MOVE)
    topo.foreach { case (n, _) => await(s"$dir/ready.$n") }

    // publish: senders 0..499 round-robin, each pinned to its node
    // (a channel process lives on one node) — origin = sender % 10
    val msgs = (0 until nMsgs).map { i =>
      val sender = (i % 500).toLong
      (i.toLong, sender, (sender % 10).toInt)
    }
    val portMap = ports.toMap
    val pubs = topo.map { case (n, _) =>
      n -> new Mesh.Publisher(portMap(n))
    }.toMap
    val t0 = System.nanoTime()
    msgs.foreach { case (m, s, o) => pubs(o).publish(m, s) }

    val want = nMsgs.toLong * topo.length
    def lines(): Seq[(Int, Seq[String])] = topo.map { case (n, _) =>
      val p = Paths.get(s"$dir/deliveries.$n")
      n -> (if (Files.exists(p))
        Files.readAllLines(p).asScala.toSeq.filter(_.nonEmpty)
      else Seq.empty)
    }
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    while (lines().map(_._2.size.toLong).sum < want &&
        System.nanoTime() < deadline)
      Thread.sleep(50L)
    val t1 = System.nanoTime()
    val live = lines().flatMap { case (n, ls) =>
      ls.map { l =>
        val Array(m, s, hop) = l.split(' '); (n, m.toLong, s.toLong, hop)
      }
    }
    pubs.values.foreach(_.close())
    Files.writeString(Paths.get(s"$dir/stop"), "stop")
    procs.foreach(_.waitFor())

    val exactOnce = live.size == want &&
      live.groupBy(d => (d._2, d._1)).forall(_._2.size == 1)
    val fifo = live.groupBy(d => (d._3, d._1)).forall { case (_, ds) =>
      val arrived = ds.map(_._2); arrived == arrived.sorted
    }

    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val expected = graft.presence.Fanout.hopPlan(
        msgs.toDF("msg_id", "sender", "origin"), "sender", "origin",
        topo, 1)
      .select("node", "msg_id", "sender", "hop").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    val modelMatch = live.toSet == expected
    spark.stop()

    val perSec = (want * 1e9 / (t1 - t0)).toLong
    val verdict =
      if (exactOnce && fifo && modelMatch) "PASS" else "FAIL"
    println(s"[xmesh] nodes=${topo.length} regions=3 msgs=$nMsgs " +
      s"deliveries=${live.size} exact_once=$exactOnce fifo=$fifo " +
      s"model_match=$modelMatch fanout_per_sec=$perSec verdict=$verdict")
    if (verdict != "PASS") sys.exit(1)
  }
}
