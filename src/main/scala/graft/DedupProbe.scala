package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the text near-dup family (round-15): runs the four
  * dedup tiers ([[graft.pipeline.Dedup]].exactSurvivors /
  * minhashNearDups / simhashNearDups / ngramJaccardPairs) plus the
  * connected-components keep-set over a SYNTHETIC near-dup corpus far
  * past the shipped SFs — default 1M documents (arg-scalable). The
  * committed stamped artifact is the 1M run `PROBE_dedup_1m.json`
  * (minhash 97 s / simhash 29 / jaccard 49 / clusters 53 / cc_path 61
  * — the path case converging in the O(log² n) round budget).
  * The channel family has had this since r13 ([[RegisterProbe]]); the
  * dedup family's 100 TB claims were argued from plan shape (banding,
  * posting caps, block-grids) — this probe measures them.
  *
  * Corpus shape (all deterministic arithmetic, no RNG):
  *  - near-dup CLUSTERS: docs group into clusters of 4 (cluster = id/4)
  *    sharing a 40-token base sequence; each member carries one unique
  *    mutation token at a member-specific position, so intra-cluster
  *    true 3-shingle Jaccard ≈ 0.72–0.85 (above every stage's
  *    threshold) and inter-cluster overlap is noise;
  *  - a HOT BOILERPLATE: the first 2 000 docs are byte-identical (the
  *    web-corpus template page) — ONE LSH bucket / signature / shingle
  *    posting holding 2 000 docs, the skew the maxBucket /
  *    maxShinglePostings guards exist for. Its pair set (~2M) is part
  *    of the measured output, not an excluded special case.
  *
  * Guard settings are the scale path, not the oracle path: minhash
  * maxBucket=64 (block-grid the hot bucket), simhash prefixBits=20 +
  * maxBucket=64 (√n-ish blocking at probe volume), jaccard
  * maxShinglePostings=256 (drops the boilerplate's stop-shingles — the
  * documented under-estimate approximation; the cluster structure is
  * unaffected).
  *
  * Measurement rules (PruneScan / the r12 lesson): every stage
  * aggregates OVER its computed columns (jaccard / hamming /
  * n_cluster reach the sink), never a bare count. Each stage runs
  * twice (JIT/shuffle warm) and records the second; operator-internal
  * persists are dropped via clearCache between stages, like the
  * Verify/Bench session loop does per query.
  *
  * ARTIFACT: one `PROBEJSON {…}` line with the [[KneeFresh]] raw-floor
  * host stamp (start/end health + verdict) and every stage's
  * (rows, sec) — same self-adjudication contract as [[RegisterProbe]].
  */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 1000000L
    val hotDocs = 2000L
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

    // the boilerplate template: 40 fixed tokens
    val template = (0 until 40).map(i => s"t$i").mkString(" ")
    // cluster base vocabulary is DISJOINT per cluster (token index =
    // cluster*40 + position): intra-cluster Jaccard ≈ 0.72+, zero
    // cross-cluster shingle overlap. (The first corpus draft used a
    // stride-7 arithmetic progression modulo a fixed vocab — cluster
    // token runs ALIGNED across clusters and chained 100k docs into 119
    // huge high-diameter components. That accident is what exposed the
    // O(diameter) connected-components hazard and drove the large-star/
    // small-star rewrite; the diameter case is now exercised
    // deliberately by the `cc_path` stage below instead of by a corpus
    // bug.)
    def docs = spark.range(nDocs).select(
      col("id").as("doc_id"),
      when(col("id") < hotDocs, lit(template)).otherwise(
        concat_ws(" ", transform(sequence(lit(0), lit(39)), i =>
          when(i === pmod(col("id"), lit(4)) * 7,
            concat(lit("m"), col("id").cast("string")))
          .otherwise(concat(lit("w"),
            ((col("id").cast("long") / 4).cast("long") * 40L + i)
              .cast("string"))))))
        .as("text"))

    def time(name: String)(df: => org.apache.spark.sql.DataFrame,
        checksum: org.apache.spark.sql.Column): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val r = df.agg(count(lit(1)), sum(checksum)).collect()(0)
        val sec = (System.nanoTime() - t0) / 1e9
        if (i == 2) {
          println(f"[dedupprobe] $name rows=${r.getLong(0)} sec=$sec%.2f")
          stages += ((name, r.getLong(0), sec))
        }
        spark.catalog.clearCache() // operator-internal persists
        // release the finished run's SHUFFLE files before the next one:
        // the ContextCleaner only deletes a shuffle once the driver GC
        // proves its dependency unreachable — without the nudge, run 1's
        // and run 2's files coexist on disk, and at 10M the minhash
        // verification join's exchanges alone are ~40 GB per run (the
        // first 10M attempt died ENOSPC at 76 GB of coexisting spill)
        System.gc(); Thread.sleep(2000L)
      }
    }

    import graft.pipeline.Dedup
    // tier 1: exact (hash-groupBy) — survivors = nDocs - hotDocs + 1
    time("exact")(Dedup.exactSurvivors(docs, "text", "doc_id"),
      col("doc_id"))
    // tier 2: MinHash+LSH with the hot-bucket block-grid
    def minhashPairs = Dedup.minhashNearDups(docs, "text", "doc_id",
      shingleN = 3, k = 12, bands = 4, threshold = 0.5, maxBucket = 64)
    time("minhash_lsh")(minhashPairs, col("jaccard"))
    // tier 3: SimHash prefix blocking + block-grid
    time("simhash")(Dedup.simhashNearDups(docs, "text", "doc_id",
      maxHamming = 12, prefixBits = 20, maxBucket = 64), col("hamming"))
    // tier 4: blocked n-gram Jaccard with the stop-shingle posting cap
    time("jaccard_blocked")(Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      shingleN = 3, threshold = 0.3, lenBucket = 50,
      maxShinglePostings = 256), col("jaccard"))
    // end step: pairwise matches -> keep-set (connected components over
    // the minhash pairs; the hot cluster is one 2000-doc component)
    time("clusters")(Dedup.nearDupClusters(docs, "doc_id", minhashPairs),
      col("n_cluster"))
    // the DIAMETER case, deliberately: connected components over one
    // nDocs-long PATH (the chained-dup-family shape — templated pages
    // drifting A~B~C~… with A≁C). Plain min-label propagation needs
    // nDocs rounds here; large-star/small-star must stay logarithmic.
    // cap=0 forces the iterative scale path (the edge list would
    // otherwise take the single-task union-find kernel).
    time("cc_path")({
      val verts = spark.range(nDocs).toDF("id")
      val edges = spark.range(nDocs - 1)
        .select(col("id").as("a"), (col("id") + 1L).as("b"))
      Dedup.connectedComponents(verts, "id", edges, "a", "b",
          maxIters = 60, smallGraphEdgeCap = 0L)
        .withColumn("n_cluster", col("cluster_id"))
    }, col("n_cluster"))
    // rounds of the last cc_path run — the measured O(log² n) bound
    val ccRounds = Dedup.lastIterRounds

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
      s""""probe":"dedup","n_docs":$nDocs,"hot_docs":$hotDocs,""" +
      s""""cc_path_rounds":$ccRounds,""" +
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
