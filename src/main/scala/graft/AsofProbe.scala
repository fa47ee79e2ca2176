package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the temporal-join family
  * ([[graft.operators.TemporalJoin]] asOfBackward / asOfForward /
  * rangeJoinBinned): the GraphProbe sibling for the operators whose
  * 100 TB claim is "ONE hash exchange + an incremental window frame,
  * never an inequality join" — quadratic-in-the-hot-key if that claim
  * is wrong, so the corpus here carries a deliberate HOT KEY (every
  * 10th left row lands on key 0 → ~11% of the corpus in one key at
  * either volume). If the as-of frame were re-scanned per row
  * (the shrinking-frame hazard PlanAudit guards), the hot key alone
  * would be ~(0.11·n)² micro-ops and the 10M stage would not finish;
  * the measured 1M→10M ratio is the evidence it stays linear.
  *
  * Volumes 1M and 10M LEFT rows in one session (right = n/10 reference
  * rows, intervals = n/100 windows spanning 1–3 one-hour bins). Stage
  * sinks aggregate OVER the matched payload and timestamps (PruneScan
  * rule); backward/forward answers are cross-checked structurally
  * (matched counts recorded in the artifact for the band assert).
  *
  * ARTIFACT: `PROBEJSON {…}` with the [[KneeFresh]] raw-floor host
  * stamp — same self-adjudication contract as the siblings. */
object AsofProbe {
  def main(args: Array[String]): Unit = {
    val volumes: Seq[Long] =
      if (args.nonEmpty) args.map(_.toLong).toSeq
      else Seq(1000000L, 10000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val bandApplies = KneeFresh.bandAppliesFor(cpus)
    def readHealth(): (Long, Double) = {
      val c = graft.cdc.StreamLatency.rawFloor(spark,
        KneeFresh.ControlRate, KneeFresh.ControlSeconds)
      (c.rowsPerSec,
        if (bandApplies) c.rowsPerSec.toDouble / KneeFresh.QuietBandRowsPerSec
        else -1.0)
    }
    val (ctlRows, health) = readHealth()
    val stages = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Double)]
    val extras = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]

    def time(name: String)(df: => org.apache.spark.sql.DataFrame,
        checksum: org.apache.spark.sql.Column): Long = {
      val t0 = System.nanoTime()
      val r = df.agg(count(lit(1)), sum(checksum)).collect()(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[asofprobe] $name rows=${r.getLong(0)} sec=$sec%.2f")
      stages += ((name, r.getLong(0), sec))
      spark.catalog.clearCache()
      System.gc(); Thread.sleep(1500L)
      r.getLong(0)
    }

    volumes.foreach { v =>
      val nKeys = v / 100 // 10k keys at 1M, 100k at 10M
      val hourUs = 3600L * 1000000L
      // left: every 10th row on key 0 — the hot key holds ~11% of n
      def left = spark.range(v).select(
        when(pmod(col("id"), lit(10)) === 0L, lit(0L))
          .otherwise(pmod(hash(col("id"), lit(1)), lit(nKeys))
            .cast("long")).as("k"),
        timestamp_micros(pmod(col("id") * 1337L, lit(hourUs * 24 * 365)))
          .as("ts"),
        (col("id") % 1000L).as("v"))
      def right = spark.range(v / 10).select(
        when(pmod(col("id"), lit(10)) === 0L, lit(0L))
          .otherwise(pmod(hash(col("id"), lit(2)), lit(nKeys))
            .cast("long")).as("k"),
        timestamp_micros(pmod(col("id") * 13370L, lit(hourUs * 24 * 365)))
          .as("rts"),
        (col("id") % 777L).as("price"))
      def intervals = spark.range(v / 100).select(
        pmod(hash(col("id"), lit(3)), lit(nKeys)).cast("long").as("k"),
        timestamp_micros(pmod(col("id") * 97L, lit(hourUs * 24 * 364)))
          .as("s"),
        timestamp_micros(pmod(col("id") * 97L, lit(hourUs * 24 * 364))
          + (pmod(col("id"), lit(3)) + 1) * hourUs).as("e"),
        col("id").as("window_id"))

      val back = time(s"asof_backward_$v")(
        graft.operators.TemporalJoin.asOfBackward(left, right,
          Seq("k"), "ts", "rts", Seq("price")),
        coalesce(col("asof_ts_us"), lit(0L)) % 1000000L + col("price"))
      val fwd = time(s"asof_forward_$v")(
        graft.operators.TemporalJoin.asOfForward(left, right,
          Seq("k"), "ts", "rts", Seq("price")),
        coalesce(col("asof_ts_us"), lit(0L)) % 1000000L + col("price"))
      // both directions must return exactly one row per left row
      require(back == v && fwd == v,
        s"as-of must be row-preserving: back=$back fwd=$fwd at $v")
      time(s"range_$v")(
        graft.operators.TemporalJoin.rangeJoinBinned(left, intervals,
          Seq("k"), "ts", "s", "e", binUs = hourUs),
        col("v") + col("window_id"))
    }

    val (ctlEndRows, healthEnd) = readHealth()
    val verdict =
      if (!bandApplies) "unbanded"
      else if (math.min(health, healthEnd) < KneeFresh.HealthSuspect)
        "suspect"
      else "clean"
    def f3(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    val stageJson = stages.map { case (n, rows, sec) =>
      s"""{"name":"$n","rows":$rows,"sec":${f3(sec)}}"""
    }.mkString("[", ",", "]")
    println("PROBEJSON {" +
      s""""probe":"asof","cpus":"$cpus","control":{""" +
      s""""raw_rows_per_sec":$ctlRows,""" +
      s""""raw_rows_per_sec_end":$ctlEndRows,""" +
      s""""quiet_band_rows_per_sec":${KneeFresh.QuietBandRowsPerSec},""" +
      s""""host_health":${f3(health)},""" +
      s""""host_health_end":${f3(healthEnd)},""" +
      s""""verdict":"$verdict"},""" +
      s""""stages":$stageJson}""")
    spark.stop()
  }
}
