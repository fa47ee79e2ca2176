package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the embedding/ANN family (round-15, the
  * [[DedupProbe]] sibling): runs the similarity tiers
  * ([[graft.pipeline.Similarity]] quantizeInt8 / randomProject /
  * hammingTopK / IVF build+query / trainCentroidsExact / knnGraphIvf /
  * pqTopK) over a SYNTHETIC embedding corpus far past the shipped
  * SFs — default 1M vectors × dim 32 (arg-scalable). The dedup family
  * got its probe earlier this round; the ANN family's 100 TB claims
  * were argued from plan shape (broadcast queries, √n buckets, native
  * kernels) — this probe measures them.
  *
  * Corpus shape (deterministic hash arithmetic, no RNG):
  *  - TRUE CLUSTERS with CONTENT-CORRELATED IDS: cluster = id/1000, a
  *    per-cluster base direction plus small per-id jitter — the crawl
  *    order shape (a site's pages are contiguous ids). This is the
  *    corpus that exposed the lowest-id centroid pick as an
  *    index-collapse hazard: "the √n smallest ids" are all cluster 0,
  *    every other vector is near-orthogonal to every centroid, and
  *    bucket assignment degenerates to jitter (measured by the
  *    `idpick_skew` stage below; fixed by the md5-spread pick in
  *    [[graft.pipeline.Similarity.centroids]]).
  *  - a HOT SLAB: 20k byte-IDENTICAL vectors mid-range (the boilerplate
  *    template page's embedding). Identical inputs produce identical
  *    argmax rows, so the whole slab tie-breaks into ONE IVF cell no
  *    matter how many centroids sit inside the dense region — a merely
  *    near-identical slab gets SPREAD by the density-proportional md5
  *    pick (measured in this probe's first draft: 20 in-slab centroids
  *    split it ~1k each), which is exactly why real boilerplate (exact
  *    duplicates) is the hazard shape. This is the skew
  *    [[graft.pipeline.Similarity.knnGraphIvf]]'s auto hot-bucket
  *    guard exists for; its bucket² work is measured guarded AND
  *    unguarded (`knn_graph` vs `knn_graph_unguarded` — the delta is
  *    the serialized single-task cost the guard removes).
  *
  * Measurement rules (PruneScan / the r12 lesson): every stage
  * aggregates OVER its computed columns (q_csv / p_csv / hamming / cos
  * / adist reach the sink), never a bare count. Each stage runs twice
  * (JIT/shuffle warm) and records the second; caches are dropped
  * between stages except the IVF index build, which is deliberately
  * persisted across its query stage's two runs — that is how a
  * deployment runs (build once at ingest, query many).
  *
  * ARTIFACT: one `PROBEJSON {…}` line with the [[KneeFresh]] raw-floor
  * host stamp (start/end health + verdict) and every stage's
  * (rows, sec) — same self-adjudication contract as [[RegisterProbe]]
  * and [[DedupProbe]].
  */
object SimProbe {
  def main(args: Array[String]): Unit = {
    val nVecs = if (args.nonEmpty) args(0).toLong else 1000000L
    val dim = 32
    // 5% hot, floored (small runs still see a real slab) and capped
    // (the slab's bucket² work is quadratic by construction; 100k keeps
    // the GUARDED pass bounded at headroom volumes — in a real pipeline
    // exact dedup runs before ANN precisely so this slab cannot exist)
    val hotN = math.min(100000L, math.max(20000L, nVecs / 20))
    val hotStart = nVecs / 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stages = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Double)]
    val extras = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val bandApplies = KneeFresh.bandAppliesFor(cpus)
    def readHealth(): (Long, Double) = {
      val c = graft.cdc.StreamLatency.rawFloor(spark,
        KneeFresh.ControlRate, KneeFresh.ControlSeconds)
      (c.rowsPerSec,
        if (bandApplies) c.rowsPerSec.toDouble / KneeFresh.QuietBandRowsPerSec
        else -1.0)
    }
    val (ctlRows, health) = readHealth()

    // vector = 3·common + cluster_base + jitter. The dominant COMMON
    // direction is the anisotropy real text embeddings carry (the
    // "narrow cone": pairwise cosine ≈ 0.9 here) — and it is what makes
    // the pre-r15 lowest-id centroid pick catastrophic rather than
    // merely odd: with every centroid inside cluster 0, the argmax
    // over near-identical centroids is decided by the cluster-
    // INDEPENDENT common·jitter_i term, so ~the whole corpus
    // tie-breaks into ONE bucket (`idpick_max_bucket` ≈ n — every
    // downstream bucket² pass becomes n²). Cluster base: component j
    // of cluster c = hash-spread in [-1, 1]; per-id jitter at 1e-2
    // keeps intra-cluster cosine high while clusters separate inside
    // the cone. The hot slab shares ONE direction with ZERO jitter
    // (byte-identical — exact duplicates tie-break into one bucket no
    // matter how the centroids are picked).
    def vecs = {
      val id = col("id")
      val cluster = (id / 1000L).cast("long")
      val isHot = id >= hotStart && id < (hotStart + hotN)
      val c = when(isHot, lit(-7L)).otherwise(cluster)
      val jitterScale = when(isHot, lit(0.0)).otherwise(lit(1e-2))
      spark.range(nVecs).select(
        id.as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)), j =>
          (pmod(hash(lit(-99L), j), lit(2001)) - lit(1000))
              .cast("double") / 1000.0 * 3.0
            + (pmod(hash(c, j), lit(2001)) - lit(1000)).cast("double") / 1000.0
            + (pmod(hash(id, j, lit(99)), lit(201)) - lit(100))
                .cast("double") / 100.0 * jitterScale)
          .as("embedding"))
    }
    // ~250 queries at ANY volume: the brute/hamming baselines are
    // |Q|·n scans, so a query set proportional to n would make the
    // probe itself quadratic
    val qStride = math.max(4096L, nVecs / 250)
    def queries = vecs.where(pmod(col("vec_id"), lit(qStride)) === 0L)

    def time(name: String, clear: Boolean = true)(
        df: => org.apache.spark.sql.DataFrame,
        checksum: org.apache.spark.sql.Column): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val r = df.agg(count(lit(1)), sum(checksum)).collect()(0)
        val sec = (System.nanoTime() - t0) / 1e9
        if (i == 2) {
          println(f"[simprobe] $name rows=${r.getLong(0)} sec=$sec%.2f")
          stages += ((name, r.getLong(0), sec))
        }
        if (clear) {
          spark.catalog.clearCache()
          // let the ContextCleaner reclaim the finished run's shuffle
          // files before the next one starts (see DedupProbe.time —
          // coexisting per-run spill is what ENOSPC'd the first 10M run)
          System.gc(); Thread.sleep(2000L)
        }
      }
    }

    import graft.pipeline.Similarity
    val k = Similarity.sqrtCentroids(vecs) // ⌈√n⌉, the scale rule

    // tier 1: narrow storage passes
    time("quantize_int8")(
      Similarity.quantizeInt8(vecs, "embedding", "vec_id"),
      crc32(col("q_csv")))
    time("random_project")(
      Similarity.randomProject(vecs, "embedding", "vec_id", dIn = dim,
        dOut = 8),
      crc32(col("p_csv")))

    // tier 2: binary-signature scan (the 32-byte-per-row path)
    time("hamming_topk")(
      Similarity.hammingTopK(queries, vecs, "embedding", "vec_id", k = 10),
      col("hamming"))

    // tier 3: IVF build with the md5-spread pick; bucket skew AND
    // recall@10 recorded per build. The idpick stage measures the
    // PRE-r15 lowest-id pick on the same corpus — the index-collapse
    // evidence: all its centroids land inside cluster 0 (contiguous
    // crawl-ordered ids), so bucket membership decorrelates from
    // similarity and recall@10 falls to ~0 while the md5 build stays
    // high. Assignment cost only (no quadratic follows it here; at
    // corpus scale the collapse would also re-skew every downstream
    // bucket² pass).
    def norm = Similarity.normalized(vecs, "embedding", "v")
      .select(col("vec_id"), col("v"))
    // brute-force truth for the recall probes: |Q|×10 pairs, computed
    // once (250 queries × corpus is one broadcast scan)
    val truth = Similarity.bruteForceTopK(queries, vecs, "embedding",
        "vec_id", k = 10, dim = dim)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(bucketed: org.apache.spark.sql.DataFrame,
        cents: org.apache.spark.sql.DataFrame): Double = {
      val got = Similarity.ivfTopKFromIndex(bucketed, cents, queries,
          "embedding", "vec_id", k = 10, probe = 2, dim = dim)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(truth).size.toDouble / truth.size
    }
    def skewOf(cents: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val asg = Similarity.assignBuckets(norm, cents, "vec_id", dim)
      time(name)(asg.groupBy("bucket").count(), col("count"))
      val mx = asg.groupBy("bucket").count()
        .agg(max("count")).collect()(0).getLong(0)
      extras += ((s"${name}_max_bucket", mx))
      extras += ((s"${name}_recall10_pct",
        math.round(recallOf(asg, cents) * 100)))
      spark.catalog.clearCache()
    }
    skewOf(Similarity.centroids(vecs, "embedding", "vec_id", k),
      "ivf_build")
    skewOf({
      // the pre-r15 pick, inlined: k lowest ids — all inside cluster 0
      val ids = vecs.select(col("vec_id")).orderBy(col("vec_id"))
        .limit(k).collect().map(_.get(0))
      Similarity.normalized(
          vecs.where(col("vec_id").isin(ids: _*)), "embedding", "centv")
        .select(col("vec_id").as("centroid_id"), col("centv"))
    }, "idpick")

    // tier 4: trained build (the production path) + queries off the
    // persisted index — build once, query many. Training is eager
    // (per-iteration collects), so it gets its own wall-clock stage.
    val tTrain = System.nanoTime()
    val cents = Similarity.trainCentroidsExact(vecs, "embedding",
      "vec_id", k = k, dim = dim, iters = 1)
    val trainSec = (System.nanoTime() - tTrain) / 1e9
    stages += (("ivf_train", k.toLong, trainSec))
    println(f"[simprobe] ivf_train rows=$k sec=$trainSec%.2f")
    val bucketed = Similarity.assignBuckets(norm, cents, "vec_id", dim)
      .persist()
    val t0 = System.nanoTime()
    val nAssigned = bucketed.count()
    val buildSec = (System.nanoTime() - t0) / 1e9
    stages += (("ivf_train_build", nAssigned, buildSec))
    println(f"[simprobe] ivf_train_build rows=$nAssigned sec=$buildSec%.2f")
    extras += (("ivf_trained_recall10_pct",
      math.round(recallOf(bucketed, cents) * 100)))
    time("ivf_query", clear = false)(
      Similarity.ivfTopKFromIndex(bucketed, cents, queries,
        "embedding", "vec_id", k = 10, probe = 2, dim = dim),
      col("cos"))
    bucketed.unpersist()
    spark.catalog.clearCache()

    // tier 5: the corpus² graph — guarded (auto hot-bucket split) vs
    // unguarded (the hot slab's 20k² dots serialized into one task);
    // the delta is what the r15 auto guard buys
    time("knn_graph")(
      Similarity.knnGraphIvf(vecs, "embedding", "vec_id", k = 8,
        nCentroids = k, dim = dim),
      col("dst_id") + col("rank"))
    // the unguarded control is itself the hazard (hotN² dots serialize
    // into ONE task — ~1 min per run already at the 100k cap, ×2 warm
    // runs): the guarded/unguarded delta is established at the default
    // band, so the headroom legs only need the guarded number
    if (nVecs <= 2000000L)
      time("knn_graph_unguarded")(
        Similarity.knnGraphIvf(vecs, "embedding", "vec_id", k = 8,
          nCentroids = k, dim = dim, nBlocks = 1),
        col("dst_id") + col("rank"))
    else println(s"[simprobe] knn_graph_unguarded SKIPPED (hotN=$hotN " +
      "serializes hotN^2 dots in one task; delta established at 1M)")

    // tier 6: PQ — encode-once corpus scan, ADC-scored queries
    time("pq_topk")(
      Similarity.pqTopK(queries, vecs, "embedding", "vec_id", k = 10,
        m = 4, codebookSize = 16, dim = dim),
      col("neighbor_id") + col("rn"))

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
    val extraJson = extras.map { case (n, v) => s""""$n":$v""" }
      .mkString(",")
    println("PROBEJSON {" +
      s""""probe":"sim","n_vecs":$nVecs,"dim":$dim,"hot_n":$hotN,""" +
      s""""n_centroids":$k,""" +
      (if (extras.nonEmpty) extraJson + "," else "") +
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
