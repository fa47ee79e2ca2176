package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the occupancy-register family (round-13): runs
  * [[graft.presence.Muster.occupancyMerge]] / `tombstoneSweep` /
  * `staleRouterRows` over a SYNTHETIC claim stream far past the shipped
  * SFs — default 10M claims over 1M (group, node) keys with a 10%
  * hot-key skew — and prints one line per stage for COVERAGE.
  *
  * Measurement rules (see PruneScan / the r12 lesson): every stage
  * aggregates OVER its computed columns (seq/present/created_at reach
  * the sink), never a bare count that lets Catalyst prune the merge
  * itself out of the timed plan.
  *
  * ARTIFACT (r14 verdict task 6): besides the per-stage stdout lines,
  * the probe emits ONE `PROBEJSON {…}` line carrying every stage's
  * (rows, sec) plus the same start/end host-health control stamp the
  * knee artifact carries ([[KneeFresh]]'s raw-floor band, calibrated at
  * 32 cpus) — so a committed probe run is self-adjudicating: a reader
  * sees whether the host was in-band while the numbers were taken
  * instead of trusting COVERAGE prose. Committed runs live next to the
  * bench artifacts (`PROBE_register_*.json`). */
object RegisterProbe {
  def main(args: Array[String]): Unit = {
    val nClaims = if (args.nonEmpty) args(0).toLong else 10000000L
    val nGroups = if (args.length > 1) args(1).toLong else 142857L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stages = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Double)]
    val bandApplies = KneeFresh.bandAppliesFor(cpus)
    def readHealth(): (Long, Double) = {
      val c = graft.cdc.StreamLatency.rawFloor(spark,
        KneeFresh.ControlRate, KneeFresh.ControlSeconds)
      (c.rowsPerSec,
        if (bandApplies) c.rowsPerSec.toDouble / KneeFresh.QuietBandRowsPerSec
        else -1.0)
    }
    val (ctlRows, health) = readHealth()
    // ~7 nodes per group -> ~1M keys at the default; 10% of claims
    // hammer one hot group (the skew a popular channel produces)
    def claims = spark.range(nClaims).select(
      when(col("id") % 10 === 0, lit("g-hot"))
        .otherwise(concat(lit("g"), (col("id") % nGroups).cast("string")))
        .as("grp"),
      concat(lit("n"), (col("id") % 7).cast("string")).as("node"),
      (col("id") / 3).cast("long").as("seq"),
      (col("id") % 3 =!= 0).as("present"),
      when(col("id") % 3 === 0, col("id") * 2).otherwise(lit(null))
        .cast("long").as("created_at"))
    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        // consume the computed columns: checksum aggregate, not count
        val r = df.agg(count(lit(1)), sum(col("seq")),
          sum(when(col("present"), 1L).otherwise(0L)),
          sum(coalesce(col("created_at"), lit(0L)))).collect()(0)
        val sec = (System.nanoTime() - t0) / 1e9
        if (i == 2) {
          println(f"[registerprobe] $name rows=${r.getLong(0)} " +
            f"present=${r.getLong(2)} sec=$sec%.2f")
          stages += ((name, r.getLong(0), sec))
        }
      }
    }
    import graft.presence.Muster
    def merged = Muster.occupancyMerge(claims,
      "grp", "node", "seq", "present", "created_at")
    time("merge")(merged)
    time("sweep")(Muster.tombstoneSweep(merged,
      nowMs = nClaims * 2, windowMs = nClaims / 2))
    time("stale_drop")(Muster.staleRouterRows(merged,
        oldNodes = (0 until 7).map(i => s"n$i"),
        newNodes = ((0 until 7).filterNot(_ == 1) ++ Seq(7, 8))
          .map(i => s"n$i"))
      .select(col("grp"), col("node"), col("seq"),
        lit(true).as("present"),
        lit(null).cast("long").as("created_at")))
    // claim-debounce leg (round-14): the flap suppressor over the same
    // volume — nClaims membership deltas (nClaims/2 well-formed sessions,
    // join+leave) across the same keyspace with the same 10% hot-key
    // skew. The hot key concentrates ~nClaims/10 deltas in ONE window
    // partition — windows cannot partial-aggregate, so this measures the
    // honest per-key sort bound a popular channel's churn produces.
    val nSessions = nClaims / 2
    def sessions = spark.range(nSessions).select(
      when(col("id") % 10 === 0, lit("g-hot"))
        .otherwise(concat(lit("g"), (col("id") % nGroups).cast("string")))
        .as("grp"),
      concat(lit("n"), (col("id") % 7).cast("string")).as("node"),
      col("id").as("tie"),
      ((col("id") * 2971L) % 100000000L).as("join_ms"),
      ((col("id") * 2971L) % 100000000L + (col("id") % 997L) * 200L + 1L)
        .as("leave_ms"))
    def claimEvents = sessions.select(col("grp"), col("node"), col("tie"),
        explode(array(
          struct(col("join_ms").as("ts_ms"), lit(1).as("delta")),
          struct(col("leave_ms").as("ts_ms"), lit(-1).as("delta"))))
          .as("e"))
      .select(col("grp"), col("node"), col("e.ts_ms").as("ts_ms"),
        col("e.delta").as("delta"), col("tie"))
    def timeDeb(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        // consume the computed columns (emit_ms + claim), never a bare count
        val r = df.agg(count(lit(1)), sum(col("emit_ms")),
          sum(when(col("claim") === "vacant", 1L).otherwise(0L))).collect()(0)
        val sec = (System.nanoTime() - t0) / 1e9
        if (i == 2) {
          println(f"[registerprobe] $name rows=${r.getLong(0)} " +
            f"vacant=${r.getLong(2)} sec=$sec%.2f")
          stages += ((name, r.getLong(0), sec))
        }
      }
    }
    timeDeb("claim_debounce")(Muster.claimDebounce(claimEvents,
      "grp", "node", "ts_ms", "delta", "tie", cooldownMs = 60000L))
    // single-broadcast admission leg (round-14): the ring fold over the
    // same volume — nClaims requests across ~nGroups/10 tenants with the
    // 10% hot-tenant skew. The hot tenant serializes ~nClaims/10
    // requests through ONE sorted group iterator (the reference's hot
    // tenant hits one RateCounter the same way); the fold's state is
    // O(windowTicks), so the bound here is the per-tenant sort, not
    // memory. Rates chosen so the hot tenant crosses the avg >= max
    // line mid-stream (both arms live at probe volume).
    val nTenants = math.max(nGroups / 10, 1L)
    def requests = spark.range(nClaims).select(
      when(col("id") % 10 === 0, lit("t-hot"))
        .otherwise(concat(lit("t"), (col("id") % nTenants).cast("string")))
        .as("tenant"),
      timestamp_micros(col("id") * 37L).as("ts"),
      col("id").as("req_id"),
      (col("id") % 1000 === 1).as("suspend"),
      (col("id") % 17 =!= 0).as("valid"),
      (col("id") % 13 =!= 0).as("write_allowed"))
    def timeAdm(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        // consume the computed columns (status + req_id), never a count
        val r = df.agg(count(lit(1)), sum(col("req_id")),
          sum(when(col("status") === "ok", 1L).otherwise(0L)),
          sum(when(col("status") === "rate_limited", 1L).otherwise(0L)))
          .collect()(0)
        val sec = (System.nanoTime() - t0) / 1e9
        if (i == 2) {
          println(f"[registerprobe] $name rows=${r.getLong(0)} " +
            f"ok=${r.getLong(2)} rate_limited=${r.getLong(3)} sec=$sec%.2f")
          stages += ((name, r.getLong(0), sec))
        }
      }
    }
    timeAdm("single_admission")(graft.rates.Rates.singleAdmission(
      requests, "tenant", "ts", "req_id", "suspend", "valid",
      "write_allowed", limitNum = 2000L, limitDen = 1L,
      tickSec = 60L, windowTicks = 12))
    // join-time replay leg (round-14): nClaims messages / ~nGroups
    // topics with the 10% hot-topic skew, nClaims/100 joining sockets
    // (10% of them on the hot topic). Without the newest-25-per-topic
    // pre-prune this pairs every hot join against every hot message
    // pre-rank — quadratic in the hot topic's ~nClaims/10 rows; with it
    // the join side is ≤ 25·|topics| and the leg stays flat.
    val nTopics = nGroups
    def logMsgs = spark.range(nClaims).select(
      when(col("id") % 10 === 0, lit("m-hot"))
        .otherwise(concat(lit("m"), (col("id") % nTopics).cast("string")))
        .as("topic"),
      col("id"),
      timestamp_micros(col("id") * 37L).as("inserted_at"),
      lit(true).as("private"), lit("broadcast").as("extension"))
    def joinReqs = spark.range(nClaims / 100).select(
      col("id").as("join_id"),
      when(col("id") % 10 === 0, lit("m-hot"))
        .otherwise(concat(lit("m"), (col("id") % nTopics).cast("string")))
        .as("topic"),
      lit(true).as("private"), lit(true).as("read_policy"),
      lit(true).as("replay_requested"), lit(true).as("replay_is_map"),
      ((col("id") % 300L)).cast("string").as("since_raw"),
      lit(null).cast("string").as("limit_raw"))
    def timeReplay(name: String)(df: => org.apache.spark.sql.DataFrame)
        : Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val r = df.agg(count(lit(1)), sum(col("message_id")),
          sum(when(col("status") === "ok", 1L).otherwise(0L))).collect()(0)
        val sec = (System.nanoTime() - t0) / 1e9
        if (i == 2) {
          println(f"[registerprobe] $name rows=${r.getLong(0)} " +
            f"ok=${r.getLong(2)} sec=$sec%.2f")
          stages += ((name, r.getLong(0), sec))
        }
      }
    }
    timeReplay("replay_on_join")(graft.messages.Messages.replayOnJoin(
      joinReqs, logMsgs,
      new java.sql.Timestamp(nClaims * 37L / 1000L)))
    // end-of-run control + the one-line artifact (see scaladoc): same
    // verdict semantics as the knee's suspect check — both control
    // samples must be in-band for "clean", no committed-throughput
    // comparison (the probe's stages have no single committed number;
    // the stage table IS the claim, the stamp says whether to trust it)
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
      s""""probe":"register","n_claims":$nClaims,"n_groups":$nGroups,""" +
      s""""cpus":"$cpus","control":{""" +
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
