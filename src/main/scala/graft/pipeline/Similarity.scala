package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Similarity search over embedding columns (`array<float>`): brute-force
  * cosine top-k as the correctness baseline, IVF (inverted-file) bucketing
  * as the 100 TB scale path.
  *
  * Scale design: brute force is O(|Q|·|C|) — fine when the query set is
  * small and broadcastable (the plan below broadcasts queries so the corpus
  * is scanned exactly once, no corpus shuffle). IVF cuts the scanned
  * fraction to ~probes/centroids: corpus vectors are pre-assigned to their
  * nearest centroid (a narrow projection against a broadcast centroid
  * table, persisted alongside the corpus at ingest), and a query only scans
  * the `probe` buckets nearest to it — at 1000 executors the bucket
  * assignment is the partition key, so each query touches few partitions.
  */
object Similarity {

  /** Caches acquired by plan builders whose returned frame REFERENCES the
    * cached relation (knnGraphIvf's AUTO hot-bucket branch persists the
    * bucket assignment so its two union arms share one argmax pass — it
    * cannot unpersist before the caller consumes the result). The
    * Verify/Bench loop's per-query `spark.catalog.clearCache()` already
    * drops these; a long-lived session that does NOT clear the catalog
    * owns the lifecycle instead: call [[releaseCaches]] after each
    * returned frame is consumed, or cached assignments accumulate. */
  private val acquiredCaches =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Unpersist (non-blocking) every cache acquired by builders in this
    * object since the last call. Safe to call at any point after the
    * returned frames have been consumed. */
  def releaseCaches(): Unit = {
    var d = acquiredCaches.poll()
    while (d != null) { d.unpersist(blocking = false); d = acquiredCaches.poll() }
  }

  /** Dot product of two double arrays — a sequential left fold, so the
    * result is deterministic and engine-reproducible. */
  def dot(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)

  /** Fixed-dimension dot product as a native codegen'd loop kernel
    * ([[graft.plans.DotFixed]]). Unlike the `aggregate` fold (an
    * interpreted higher-order function), this runs inside whole-stage
    * codegen — ~10× faster in O(n²) pair loops — and unlike the unrolled
    * `element_at(x,i)*element_at(y,i)` chain it originally expanded to,
    * its generated code is constant-size in `dim`: the unrolled form's
    * per-element null/bounds blocks made dim=64 scoring projections
    * ~20 KB — past HotSpot's 8 000-byte JIT ceiling, so the hot pair
    * loop ran interpreted anyway (CodegenAudit catch). The kernel's
    * left-associated sum is bit-identical to both the fold and the
    * unrolled chain (IEEE `0.0+x = x`; differential spec). */
  def dotFixed(x: Column, y: Column, dim: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.plans.DotFixed(
      ColumnBridge.expression(x), ColumnBridge.expression(y), dim))
  }

  /** Cosine similarity of two double arrays. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(dot(a, a)) / sqrt(dot(b, b))

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Cast to double and L2-normalize into `outCol` — ONE native compiled
    * pass ([[graft.plans.NormalizeVec]]) for float/double arrays (every
    * registered corpus). The original staged HOF chain
    * (`transform(cast) → sqrt(dot) → transform(divide)`) is kept only as
    * the fallback for other numeric element types: HOFs are
    * CodegenFallback, so the chain ran INTERPRETED with three array
    * allocations per row under every vector operator — and when a join
    * keys on a column derived from it (the IVF bucket), constraint
    * propagation substitutes the chain into scan-level filters and pays
    * it twice per row. Bit-identical doubles either way
    * (differential-tested). */
  def normalized(df: DataFrame, vecCol: String, outCol: String): DataFrame =
    df.schema(vecCol).dataType match {
      case org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType |
          org.apache.spark.sql.types.DoubleType, _) =>
        import org.apache.spark.sql.graft.ColumnBridge
        df.withColumn(outCol, ColumnBridge.column(
          graft.plans.NormalizeVec(ColumnBridge.expression(col(vecCol)))))
      case _ =>
        df.withColumn("_nv", asDouble(col(vecCol)))
          .withColumn("_norm", sqrt(dot(col("_nv"), col("_nv"))))
          .withColumn(outCol, transform(col("_nv"), x => x / col("_norm")))
          .drop("_nv", "_norm")
    }

  private def pairDot(dim: Int)(a: Column, b: Column): Column =
    if (dim > 0) dotFixed(a, b, dim) else dot(a, b)

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors (excluding itself). Both sides are normalized once (narrow);
    * queries are broadcast so the corpus is scanned exactly once and each
    * (query, corpus) pair costs a single codegen'd dot. Pass `dim` when the
    * embedding dimension is known to unlock flat-arithmetic codegen. */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame,
      vecCol: String, idCol: String, k: Int, dim: Int = 0): DataFrame = {
    val q = normalized(queries, vecCol, "qv")
      .select(col(idCol).as("query_id"), col("qv"))
    val c = normalized(corpus, vecCol, "cv")
      .select(col(idCol).as("neighbor_id"), col("cv"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        pairDot(dim)(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rn", row_number().over(w)).where(col("rn") <= k).drop("rn")
  }

  /** Deterministic centroid set: the `nCentroids` corpus rows with the
    * smallest `(md5(id), id)` — a content-independent uniform sample
    * that both engines reproduce exactly (identical lowercase-hex md5
    * of the decimal id string; swap in trained centroids in
    * production). Vectors come out normalized.
    *
    * Why hash-ordered and not lowest-id (the original stand-in,
    * replaced in round 15 after SimProbe measured the failure): real
    * corpora have CONTENT-CORRELATED ids — crawl order groups a site's
    * near-identical template pages into one contiguous id run — so
    * "the k lowest ids" can land every centroid inside ONE true
    * cluster. Every other vector is then near-orthogonal to all
    * centroids, the argmax degenerates to jitter, and downstream
    * bucket² work (knn graph, semantic dedup) approaches n² in one
    * bucket: an index-collapse scale-killer that no blocking guard can
    * save (splitting an n-sized bucket still pays n² dots). Ranking by
    * md5 makes the pick content-independent for ANY id distribution.
    *
    * The id pick runs as its OWN root query (collect of ≤nCentroids ids,
    * bounded like the PQ codebook collect), then filters the corpus by
    * the id list. A mid-plan `orderBy(…).limit(n)` reads the same but
    * physical-plans as a RANGE-PARTITIONED GLOBAL SORT of the whole
    * corpus (Spark only rewrites root-level sort+limit to the
    * distributed TakeOrdered heap) — found by the plan-fingerprint
    * lock as `global_sort=1` in every IVF-derived query, and exactly
    * the operator that cannot exist at 100 TB. The root collect DOES
    * get TakeOrdered; the isin filter is a narrow pushed-down scan. */
  def centroids(corpus: DataFrame, vecCol: String, idCol: String,
      nCentroids: Int): DataFrame = {
    val ids = corpus.select(col(idCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .limit(nCentroids)
      .collect().map(_.get(0))
    normalized(corpus.where(col(idCol).isin(ids: _*)), vecCol, "centv")
      .select(col(idCol).as("centroid_id"), col("centv"))
  }

  /** The IVF scale rule: nCentroids = ⌈√n⌉ (floored at `min`). With √n
    * buckets the expected bucket size is also √n, so the within-bucket
    * pair/scoring work is n^1.5 total instead of n²/k at a FIXED k —
    * the knob every real IVF deployment turns as the corpus grows
    * (round-9 probe: fixed k=8 made `sim_ann_ivf` 4.9× and
    * `sim_knn_graph` 5.8× at 10× input; √n holds them near-linear).
    * One bounded count() job at build time; the count is the same
    * number the oracle derives with `ceil(sqrt(count(*)))`. */
  def sqrtCentroids(corpus: DataFrame, min: Int = 4): Int =
    math.max(min, math.ceil(math.sqrt(corpus.count().toDouble)).toInt)

  /** Spherical k-means (Lloyd) training for the IVF centroids, as plain
    * DataFrame iterations: assign → per-bucket element-wise mean
    * (posexplode + (bucket, pos) average, re-assembled in position order)
    * → re-normalize. Init is the deterministic id-pick set from
    * [[centroids]], so training is fully reproducible. Empty clusters drop
    * out (k shrinks), matching Lloyd's standard behavior.
    *
    * Scale shape: each iteration is one broadcast-assign (narrow) plus a
    * (bucket, pos)-keyed aggregate whose shuffle is n·dim rows — so train
    * on a SAMPLE (`sampleFraction`) at 100 TB; centroid quality converges
    * long before the full corpus is seen, and assignment of the full
    * corpus stays the one narrow broadcast pass in [[assignBuckets]]. */
  def trainCentroids(
      corpus: DataFrame, vecCol: String, idCol: String,
      k: Int, iters: Int = 5, dim: Int = 0,
      sampleFraction: Double = 1.0): DataFrame = {
    val sample =
      if (sampleFraction < 1.0) corpus.sample(sampleFraction, 42) else corpus
    val norm = normalized(sample, vecCol, "v")
      .select(col(idCol), col("v")).persist()
    var cents = centroids(corpus, vecCol, idCol, k)
    try {
      for (_ <- 1 to iters) {
        val means = assignBuckets(norm, cents, idCol, dim)
          .select(col("bucket"), posexplode(col("v")))
          .groupBy("bucket", "pos").agg(avg("col").as("m"))
          .groupBy("bucket")
          .agg(transform(
            array_sort(collect_list(struct(col("pos"), col("m")))),
            s => s.getField("m")).as("raw"))
        cents = normalized(means, "raw", "centv")
          .select(col("bucket").as("centroid_id"), col("centv"))
        // materialize per iteration so the lineage doesn't stack iters
        // of crossJoin plans (driver-side plan growth, not data)
        cents = cents.sparkSession.createDataFrame(
          cents.collect().toList.asJava, cents.schema)
      }
      cents
    } finally norm.unpersist()
  }

  /** Lloyd training with CROSS-ENGINE-EXACT centroid updates — the
    * value-pinnable twin of [[trainCentroids]] (round-13, closing the
    * last two rows-only gates): the per-bucket mean is the one step a
    * float oracle cannot replay (group-sum order differs between
    * engines), so this variant quantizes each RAW member component to a
    * 1e-6 fixed-point LONG first — integer sums are order-free and
    * exact, and the one double division at the end is deterministic —
    * the same idiom [[labelCentroidDistances]] pinned in round 10.
    * Quantized-centroid k-means is standard practice in production ANN
    * builds (centroid stores are int8/fp16 quantized anyway); at 1e-6
    * resolution the centroid perturbation is ~1e-7 relative, far below
    * any bucket boundary this corpus (or any non-adversarial corpus)
    * has.
    *
    * Two deliberate divergences from [[trainCentroids]], both toward
    * exactness: (a) the mean is over RAW member vectors (magnitude-
    * weighted spherical k-means — quantizing the raw floats is exact in
    * both engines, while normalized components inherit each engine's
    * norm fold), then the mean is re-normalized as usual; (b) no
    * Bernoulli sampling — a seed-reproducible Spark sample is opaque to
    * every other engine, so callers bound training cost by id-sliced
    * deterministic samples instead (`where(id % m = 0)`), which any
    * oracle replays.
    *
    * Scale shape: identical to [[trainCentroids]] — one broadcast-
    * argmax assignment pass plus a (bucket, dim)-keyed LONG-sum
    * aggregate per iteration (map-side combine on primitive longs —
    * cheaper than the double `avg` it replaces). */
  def trainCentroidsExact(corpus: DataFrame, vecCol: String,
      idCol: String, k: Int, dim: Int, iters: Int = 1): DataFrame = {
    require(dim > 0, "exact training needs the fixed-dim kernel path")
    val prepared = normalized(
        corpus.select(col(idCol), asDouble(col(vecCol)).as("rv")),
        "rv", "v")
      .select(col(idCol), col("rv"), col("v")).persist()
    var cents = centroids(corpus, vecCol, idCol, k)
    try {
      for (_ <- 1 to iters) {
        val sums = assignBuckets(prepared, cents, idCol, dim,
            keep = Seq("rv"))
          .select(col("bucket"), posexplode(col("rv")).as(Seq("d", "x")))
          .select(col("bucket"), col("d"),
            round(col("x") * lit(1e6)).cast("long").as("q"))
          .groupBy("bucket", "d")
          .agg(sum(col("q")).as("sq"), count(lit(1)).as("n"))
        val means = sums
          .select(col("bucket"), col("d"),
            (col("sq").cast("double") /
              (col("n").cast("double") * lit(1e6))).as("m"))
          .groupBy("bucket")
          .agg(transform(
            array_sort(collect_list(struct(col("d"), col("m")))),
            s => s.getField("m")).as("raw"))
        cents = normalized(means, "raw", "centv")
          .select(col("bucket").as("centroid_id"), col("centv"))
        // materialize per iteration (see trainCentroids: lineage growth)
        cents = cents.sparkSession.createDataFrame(
          cents.collect().toList.asJava, cents.schema)
      }
      cents
    } finally prepared.unpersist()
  }

  /** Assign each (normalized) corpus vector to its nearest centroid —
    * ONE narrow codegen'd projection against the collected centroid
    * matrix (a model-sized reference object: k·dim doubles, ≤16 MB even
    * at √(10⁹) centroids); the bucket becomes the IVF partition key.
    *
    * This is a [[graft.plans.ArgmaxDot]] native kernel, NOT the
    * crossJoin(broadcast)+window form it replaces: the window
    * hash-partitions and sorts n·k materialized rows to keep one per
    * vector — with the k ~ √n scale rule that is an n^1.5-row exchange
    * (31.6× shuffled rows per 10× of corpus; the round-9 probe's
    * `sim_ann_ivf` 4.9× super-linearity was this operator). The kernel
    * keeps the identical doubles and (cos DESC, centroid_id ASC)
    * tie-break, so every IVF oracle still hash-matches. The generic
    * `dim = 0` path (unknown dimension — no registered query uses it)
    * keeps the window form. */
  def assignBuckets(corpusNorm: DataFrame, cents: DataFrame,
      idCol: String, dim: Int = 0, keep: Seq[String] = Nil): DataFrame = {
    val kept = keep.map(col)
    if (dim > 0) {
      val rows = cents.orderBy(col("centroid_id")).collect()
      val k = rows.length
      val vIdx = cents.schema.fieldIndex("centv")
      val cIdx = cents.schema.fieldIndex("centroid_id")
      val ids = rows.map(r => r.getAs[Number](cIdx).longValue)
      val flat = new Array[Double](k * dim)
      var kk = 0
      while (kk < k) {
        val cv = rows(kk).getSeq[Double](vIdx)
        var i = 0
        while (i < dim) { flat(kk * dim + i) = cv(i); i += 1 }
        kk += 1
      }
      import org.apache.spark.sql.graft.ColumnBridge
      // drop the Invalid (-1) sentinel: null/short vectors must never form
      // a real bucket — they would be cross-scored against each other in
      // ivfTopK/knnGraphIvf and mint a centroid_id -1 in trainCentroids,
      // breaking the "no real centroid id is negative" invariant the
      // sentinel relies on. An un-assignable vector has no nearest
      // centroid; excluding it is the only reading that can't corrupt
      // the index.
      // EvalOnce fence: without it the Invalid-sentinel filter pushes
      // below this projection and re-evaluates the k·dim argmax (and its
      // NormalizeVec child) PER ROW in the filter — the index build's
      // dominant flops, paid twice (DupExprScan: ArgmaxDot x2 +
      // NormalizeVec x2 in Filter and scan data-filters)
      corpusNorm.select(col(idCol) +: col("v") +: kept :+
        graft.plans.EvalOnce.of(ColumnBridge.column(graft.plans.ArgmaxDot(
          ColumnBridge.expression(col("v")), flat, ids, k, dim)))
          .as("bucket"): _*)
        .where(col("bucket") =!= graft.plans.ArgmaxDot.Invalid)
    } else {
      val w = Window.partitionBy(col(idCol))
        .orderBy(col("cos").desc, col("centroid_id").asc)
      corpusNorm
        .crossJoin(broadcast(cents))
        .select(col(idCol) +: col("v") +: kept :+ col("centroid_id") :+
          pairDot(dim)(col("v"), col("centv")).as("cos"): _*)
        .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select(col(idCol) +: col("v") +: kept :+
          col("centroid_id").as("bucket"): _*)
    }
  }

  /** Product-quantization (PQ) top-k — the memory side of the 100 TB ANN
    * path, complementing [[ivfTopK]]'s scan-fraction side: each corpus
    * vector is stored as `m` codebook indexes (4 bytes here vs 512 for
    * float64×64 — a 128× payload compression), and query-time distance is
    * the asymmetric sum of per-subvector distances to the CODEBOOK entry
    * the code names, so the scan never touches the original floats.
    *
    * Codebooks are the deterministic md5-spread sample set (the
    * [[centroids]] k-means stand-in both engines reproduce exactly; swap
    * in k-means-trained codebooks in production — the plan shape is
    * unchanged). Distances are squared-L2 computed as left-associated
    * flat codegen arithmetic (cf. [[dotFixed]]), so the DuckDB oracle
    * replays the exact doubles and the ranking hash-matches.
    *
    * Scale shape: the codebook is model-sized (m·codebookSize·subDim
    * doubles) and rides into ONE codegen'd encode projection as a flat
    * double[] reference driving a native loop kernel
    * ([[graft.plans.PqEncode]] — constant generated-code size in K, vs the
    * unrolled battery that breaches the 64 KB method limit) — a narrow
    * corpus pass, persisted at ingest in a real deployment (like
    * [[ivfTopKFromIndex]]'s build). Queries broadcast;
    * the corpus is scanned once; per-query top-k is a partitioned
    * window. Ties break on (distance, lowest k / lowest id) in both
    * engines. */
  def pqTopK(
      queries: DataFrame, corpus: DataFrame,
      vecCol: String, idCol: String, k: Int,
      m: Int = 4, codebookSize: Int = 16, dim: Int = 64): DataFrame = {
    require(dim % m == 0, "dim must split into m equal subvectors")
    val subDim = dim / m
    // deterministic sampled codebook: the codebookSize vectors with the
    // smallest (md5(id), id) — the same content-independent spread pick
    // as [[centroids]] (a lowest-id sample collapses when ids are
    // crawl-ordered: 16 template pages → 16 identical codebook entries
    // → every ADC distance degenerates). k = rank by (md5, id).
    // Collected rows index (sample k)(subvector m) — transpose so
    // cb(mm)(kk) is subvector mm of sample kk
    val samples: Array[Array[Array[Double]]] = corpus
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .limit(codebookSize)
      .select(asDouble(col(vecCol)).as("v"))
      .collect()
      .map(_.getSeq[Double](0).toArray.grouped(subDim).toArray)
    require(samples.length == codebookSize,
      s"corpus has fewer than $codebookSize vectors")
    val cb = Array.tabulate(m, codebookSize)((mm, kk) => samples(kk)(mm))
    // ENCODE: per subvector, argmin over the codebook by (distance, k) —
    // a native loop kernel (plans.PqEncode), NOT the unrolled
    // array_min(array(struct…)) battery: at m·K·subDim unrolled terms the
    // fused whole-stage-codegen method exceeds the JVM's 64 KB limit and
    // the full corpus pass silently drops to interpreted eval. The
    // expression is differential-tested against the unrolled form
    // (PqEncodeSpec) and keeps its exact doubles and tie-breaks.
    val cbFlat: Array[Double] = Array.tabulate(m * codebookSize * subDim) {
      j => cb(j / (codebookSize * subDim))((j / subDim) % codebookSize)(j % subDim)
    }
    val enc = corpus
      .select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
      .withColumn("codes", {
        import org.apache.spark.sql.graft.ColumnBridge
        ColumnBridge.column(graft.plans.PqEncode(
          ColumnBridge.expression(col("cv")), cbFlat, m, codebookSize, subDim))
      })
      .select(col("neighbor_id"), col("codes"))
    val q = queries
      .select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    // ADC: the scored pass is a native loop kernel (plans.PqAdc) over
    // the same flat codebook — the original unrolled form re-derived
    // each codebook element through a nested
    // element_at(element_at(literal, code+1), i) chain per TERM
    // (m·subDim literal traversals per scored row; SimProbe measured
    // the PQ scan as the slowest ANN query stage at 1M with the
    // arithmetic worth a fraction of it). Bit-identical doubles and
    // null semantics (PqAdcSpec differential rows).
    val adist = {
      import org.apache.spark.sql.graft.ColumnBridge
      ColumnBridge.column(graft.plans.PqAdc(
        ColumnBridge.expression(col("qv")),
        ColumnBridge.expression(col("codes")),
        cbFlat, m, codebookSize, subDim))
    }
    val scored = enc.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), adist.as("adist"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("adist").asc, col("neighbor_id").asc)
    // the rank rides along: the oracle hash then pins the exact ORDER of
    // the PQ ranking, not just the membership of the top-k set
    scored.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
      .select("query_id", "neighbor_id", "rn")
  }

  /** IVF top-k with `probe` probed buckets per query: each query is scored
    * only against corpus vectors in its `probe` nearest centroid buckets.
    * Recall < 1 by construction; validated against [[bruteForceTopK]]. */
  def ivfTopK(
      queries: DataFrame, corpus: DataFrame,
      vecCol: String, idCol: String, k: Int,
      nCentroids: Int, probe: Int = 1, dim: Int = 0,
      trainIters: Int = 0, trainSampleFraction: Double = 1.0): DataFrame = {
    val cents =
      if (trainIters > 0)
        trainCentroids(corpus, vecCol, idCol, nCentroids, trainIters, dim,
          trainSampleFraction)
      else centroids(corpus, vecCol, idCol, nCentroids)
    val corpusNorm = normalized(corpus, vecCol, "v")
      .select(col(idCol), col("v"))
    val bucketed = assignBuckets(corpusNorm, cents, idCol, dim)
    ivfTopKFromIndex(bucketed, cents, queries, vecCol, idCol, k, probe, dim)
  }

  /** [[ivfTopK]] against a PREBUILT index — `bucketed` is the
    * [[assignBuckets]] output, `cents` the centroid table. This is how a
    * deployment actually runs: the expensive corpus pass (assignment) is
    * the index build, persisted at ingest; queries only pay the probe
    * joins. [[recallReport]] runs its whole probe grid off one build. */
  def ivfTopKFromIndex(
      bucketed: DataFrame, cents: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, k: Int,
      probe: Int = 1, dim: Int = 0): DataFrame = {
    val qw = Window.partitionBy("query_id")
      .orderBy(col("qcos").desc, col("centroid_id").asc)
    val qBuckets = normalized(queries, vecCol, "qv")
      .select(col(idCol).as("query_id"), col("qv"))
      .crossJoin(broadcast(cents))
      .select(col("query_id"), col("qv"), col("centroid_id"),
        pairDot(dim)(col("qv"), col("centv")).as("qcos"))
      .withColumn("rn", row_number().over(qw)).where(col("rn") <= probe)
      .select(col("query_id"), col("qv"), col("centroid_id").as("bucket"))
    val scored = bucketed.join(broadcast(qBuckets), "bucket")
      .where(col("query_id") =!= col(idCol))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        pairDot(dim)(col("qv"), col("v")).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rn", row_number().over(w)).where(col("rn") <= k).drop("rn")
  }

  /** Recall@k of [[ivfTopK]] against [[bruteForceTopK]] over a
    * (k, nProbe) grid — the speed/quality tradeoff report an IVF
    * deployment tracks per index build (probe more buckets → scan more →
    * recover more of the true neighbors). One brute-force pass at
    * max(ks) is computed once and re-ranked per k; the IVF index
    * (bucket assignment — the expensive corpus pass) is built and
    * persisted ONCE, and every probe level queries it via
    * [[ivfTopKFromIndex]]. Recall is measured against the brute-force
    * set actually available (so a corpus smaller than k doesn't deflate
    * the number). Output: one row per (k, n_probe) with the mean recall
    * across queries — a |ks|·|probes|-row report, nothing data-sized. */
  def recallReport(queries: DataFrame, corpus: DataFrame,
      vecCol: String, idCol: String, ks: Seq[Int], probes: Seq[Int],
      nCentroids: Int, dim: Int = 0): DataFrame = {
    require(ks.nonEmpty && probes.nonEmpty)
    val kMax = ks.max
    def ranked(df: DataFrame): DataFrame =
      df.withColumn("rank", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("cos").desc, col("neighbor_id").asc)))
    // top-k lists are |Q|·kMax rows — tiny; persist so every grid cell
    // reads them instead of re-scanning the corpus
    val spark = queries.sparkSession
    import spark.implicits._
    val ksCol = array(ks.map(lit): _*)
    val probesCol = array(probes.map(lit): _*)
    // the k and probe dimensions EXPLODE inside one plan (top-k lists are
    // |Q|·kMax rows — replicating them |ks|·|probes| ways is nothing), so
    // the whole grid is a single groupBy — one Spark action total, not
    // one per cell (measured 7.0 → 4.6 s warm at sf0.1: the tiny
    // per-cell jobs were pure scheduling overhead; what remains is the
    // brute pass and the per-probe rank windows)
    val bruteKP =
      ranked(bruteForceTopK(queries, corpus, vecCol, idCol, kMax, dim))
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          explode(ksCol).as("k"))
        .where(col("rank") <= col("k"))
        .select(col("query_id"), col("neighbor_id"), col("k"),
          explode(probesCol).as("n_probe"))
    val cents = centroids(corpus, vecCol, idCol, nCentroids)
    // the index build is the one expensive corpus pass — built once,
    // persisted, queried by every probe level (how a deployment runs it)
    val bucketed = assignBuckets(
      normalized(corpus, vecCol, "v").select(col(idCol), col("v")),
      cents, idCol, dim).persist()
    val cells =
      try {
        val ivfKP = probes.map { p =>
          ranked(ivfTopKFromIndex(bucketed, cents, queries,
              vecCol, idCol, kMax, p, dim))
            .select(col("query_id"), col("neighbor_id"), col("rank"),
              lit(p).as("n_probe"))
        }.reduce(_ unionByName _)
          .select(col("query_id"), col("neighbor_id"), col("n_probe"),
            explode(ksCol).as("k"), col("rank"))
          .where(col("rank") <= col("k"))
          .select(col("query_id"), col("neighbor_id"), col("k"),
            col("n_probe"), lit(1).as("hit"))
        bruteKP
          .join(ivfKP, Seq("query_id", "neighbor_id", "k", "n_probe"), "left")
          .groupBy("k", "n_probe")
          .agg((sum(coalesce(col("hit"), lit(0))) / count(lit(1)))
            .as("recall"))
          .collect()
          .map(r => (r.getInt(0), r.getInt(1),
            math.rint(r.getDouble(2) * 1e6) / 1e6))
          .toSeq
      } finally bucketed.unpersist()
    // the report is |ks|·|probes| rows by construction — a literal frame,
    // no lingering caches
    cells.toDF("k", "n_probe", "recall")
  }

  /** Int8 scalar quantization per vector (the 4×-8× storage reduction
    * step before writing an embedding corpus): symmetric scale =
    * max|v|/127, q_i = round(v_i / scale). Pure narrow projection; each
    * stage's result is bound as a row attribute before the next lambda
    * references it (HOF lambdas re-evaluate free expressions per
    * element). Emits the quantized vector plus an in-band quality
    * signal (max absolute reconstruction error) — a 100 TB quantization
    * run wants the error distribution without a second pass. All-zero
    * vectors quantize to zeros with scale 0 rather than dividing by it.
    */
  def quantizeInt8(df: DataFrame, vecCol: String, idCol: String)
      : DataFrame = {
    val staged = df
      .select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .withColumn("scale",
        array_max(transform(col("v"), x => abs(x))) / 127.0)
    staged
      .withColumn("q",
        when(col("scale") === 0.0,
          transform(col("v"), _ => lit(0)))
          .otherwise(transform(col("v"),
            x => round(x / col("scale")).cast("int"))))
      .withColumn("max_abs_err",
        when(col("scale") === 0.0, lit(0.0))
          .otherwise(array_max(zip_with(col("v"), col("q"),
            (x, qi) => abs(x - qi * col("scale"))))))
      .select(col(idCol), round(col("scale"), 6).as("scale_r"),
        concat_ws(",", col("q")).as("q_csv"),
        round(col("max_abs_err"), 6).as("max_abs_err"))
  }

  /** Sparse-sign random projection (Johnson–Lindenstrauss, Achlioptas
    * ±1 variant): project `dIn`-dim embeddings to `dOut` dims with a
    * deterministic sign matrix — the dimensionality-reduction step
    * before ANN indexing or near-dup banding at 100 TB (dOut=16 over
    * d=64 shuffles 4× fewer bytes per vector, with pairwise distances
    * preserved in expectation: E‖Px‖² = dOut·‖x‖²).
    *
    * Determinism is absolute, not approximate: inputs are integerized
    * at 1e-6 and each component is an exact BIGINT sum of ±v_i — no
    * float accumulation, so the result is bit-identical across engines,
    * partitionings, and summation orders. The sign for (out dim j,
    * in dim i) is the parity of the first byte of md5("rp:j:i")
    * ([[rpSign]]); the DuckDB oracle derives the SAME signs from its
    * own md5, so the two engines agree by construction, with no magic
    * constants in either. Components are emitted CSV-joined in micro
    * units (the repo's array-output convention). Pure narrow
    * projection — one codegen'd pass, no shuffle, no UDF. */
  def randomProject(df: DataFrame, vecCol: String, idCol: String,
      dIn: Int, dOut: Int): DataFrame = {
    val vi = transform(col(vecCol).cast("array<double>"),
      x => round(x * lit(1e6)).cast("long"))
    // sign matrix as one flat byte[] into a native loop kernel
    // (plans.SignProject): the unrolled dOut·dIn signed-term chain
    // generated a 56 KB method — unJITtable, and nearly at Janino's
    // 64 KB compile cliff (CodegenAudit catch). Exact long arithmetic,
    // so results are identical by construction.
    val signs: Array[Byte] = Array.tabulate(dOut * dIn) { idx =>
      rpSign(idx / dIn, idx % dIn).toByte
    }
    val comps = {
      import org.apache.spark.sql.graft.ColumnBridge
      ColumnBridge.column(graft.plans.SignProject(
        ColumnBridge.expression(col("_vi")), signs, dIn, dOut))
    }
    df.select(col(idCol), vi.as("_vi"))
      .select(col(idCol),
        array_join(transform(comps, _.cast("string")), ",").as("p_csv"))
  }

  /** The (j, i) projection sign: +1 when the first byte of
    * md5("rp:j:i") is even, −1 otherwise. */
  def rpSign(j: Int, i: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"rp:$j:$i".getBytes("UTF-8"))
    if (((d(0) & 0xFF) % 2) == 0) 1 else -1
  }

  /** DuckDB rendering of [[randomProject]]'s component list over a
    * BIGINT-list column `vi` — the oracle twin, deriving identical
    * signs from DuckDB's md5. */
  def randomProjectSql(vi: String, dIn: Int, dOut: Int): String =
    (0 until dOut).map { j =>
      s"""list_sum([$vi[i] * (CASE WHEN CAST('0x' ||
         |      substr(md5('rp:$j:' || (i-1)), 1, 2) AS INT) % 2 = 0
         |      THEN 1 ELSE -1 END) for i in generate_series(1, $dIn)])"""
        .stripMargin
    }.mkString("[", ",\n", "]")

  /** Bucketed k-NN GRAPH over the whole corpus (each vector's k nearest
    * neighbors within its IVF bucket) — the input to SemDeDup-style
    * semantic curation, graph-based diversity sampling, and kNN
    * classification. Unlike [[ivfTopK]] (whose query side broadcasts),
    * BOTH sides here are the corpus, so the shape is: assign buckets
    * once (narrow, broadcast centroids), shuffle by bucket, then a
    * per-bucket primitive-array kernel computes the bucket² dots and a
    * bounded heap keeps each source's top-k — per-task memory is one
    * bucket of vectors (n/nCentroids × dim), per-task output n/k × k
    * rows, and nothing corpus-sized is ever broadcast or
    * driver-collected. Pick nCentroids ~ √(n/target_bucket) at scale;
    * parallelism is nCentroids tasks (the IVF contract).
    *
    * Why a kernel and not a relational self-join + rank window: the
    * join shape was built and MEASURED first — with the `dim`-unrolled
    * dot the whole-stage-codegen'd pair projection generates a method
    * too large for the JIT (500k pairs → 12 s warm at sf0.1; disabling
    * codegen: 4 s; this kernel: <1 s). Same finding and fix as
    * [[graft.pipeline.Dedup.embeddingNearDups]]'s pair loop. The
    * kernel's sequential dot is bit-identical to the unrolled
    * left-associated sum, so scores — and ranks — are unchanged.
    *
    * Emits `(src_id, dst_id, rank)`, rank 1..k by (cosine desc, dst
    * asc) within the shared bucket (approximate by construction:
    * cross-bucket neighbors are unseen — the standard IVF recall
    * trade). Singleton buckets emit nothing for their member. */
  /** Bounded top-k heap shared by the kNN kernels: keeps the k best
    * (cos desc, dst asc) candidates; head is the current worst. */
  private def worstFirst = new java.util.Comparator[(Double, Long)] {
    def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(a._1, b._1)
      if (c != 0) c else java.lang.Long.compare(b._2, a._2)
    }
  }

  private def topKInto(
      top: java.util.PriorityQueue[(Double, Long)], k: Int,
      srcId: Long, xs: Array[Double],
      cands: Array[(Long, Array[Double])]): Unit = {
    var j = 0
    while (j < cands.length) {
      val (dst, ys) = cands(j)
      if (dst != srcId) {
        var s = 0.0
        var m = 0
        while (m < xs.length) { s += xs(m) * ys(m); m += 1 }
        // peek-first admission: once the heap is full, a candidate that
        // would not displace the current worst is rejected on primitive
        // comparisons alone — no tuple allocation. The naive
        // add-then-poll form allocated one (Double, Long) per CANDIDATE
        // (bucket² of them — 4×10⁸ tuples / ~6 GB of garbage on a 20k
        // hot bucket; SimProbe measured the kernel GC-bound at ~30 s
        // where the dot flops alone are ~2 s). Admission order is
        // exactly the worstFirst comparator, so results are unchanged
        // for finite scores (differential specs: grid ≡ single-task,
        // kernel ≡ join+rank). NaN scores (a zero-norm vector
        // normalizes to NaN under the non-kernel fallback; the naive
        // form's Double.compare ranked NaN BEST and kept it) are never
        // admitted — a meaningless similarity must not displace a real
        // neighbor, and rejecting uniformly keeps the heap-full and
        // heap-filling arms consistent.
        if (!java.lang.Double.isNaN(s)) {
          if (top.size < k) top.add((s, dst))
          else {
            val w = top.peek()
            if (s > w._1 || (s == w._1 && dst < w._2)) {
              top.poll()
              top.add((s, dst))
            }
          }
        }
      }
      j += 1
    }
  }

  /** Drain a worst-first heap into best-first order. */
  private def drain(top: java.util.PriorityQueue[(Double, Long)])
      : Array[(Double, Long)] = {
    val arr = new Array[(Double, Long)](top.size)
    var q = top.size - 1
    while (q >= 0) { arr(q) = top.poll(); q -= 1 }
    arr
  }

  /** `nBlocks` semantics (round 15): `0` (the default) is AUTO — a
    * sampled bucket-size estimate (`autoSampleFraction` of the corpus
    * through the same argmax assignment, ~1% of the build flops) finds
    * buckets whose estimated size exceeds `autoTargetBlock`, and ONLY
    * those hot buckets take the block grid, each at its OWN width
    * b_i = ceil(est_i / autoTargetBlock) (r16: a global width sized by
    * the largest bucket multiplied every average hot bucket's exchange
    * by maxEst/est_i — ~70 GB of spill at 10M; see blockGrid); every
    * other bucket keeps the exact
    * single-task kernel plan. With no hot bucket detected the returned
    * plan is IDENTICAL to the explicit `nBlocks = 1` plan (no filter,
    * no union — the shipped small-SF fingerprints hold). `1` forces the
    * single-task path; `≥ 2` forces the grid over the whole corpus
    * (the pre-r15 guard, kept for the differential spec). The split
    * cannot change results — the grid's partial-top-k merge is
    * row-identical to the full kernel (spec-asserted), so the sampled
    * DECISION only moves work, never answers. */
  def knnGraphIvf(corpus: DataFrame, vecCol: String, idCol: String,
      k: Int, nCentroids: Int, dim: Int = 0, nBlocks: Int = 0,
      autoTargetBlock: Int = 4096,
      autoSampleFraction: Double = 0.01): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = centroids(corpus, vecCol, idCol, nCentroids)
    val norm = normalized(corpus, vecCol, "v").select(col(idCol), col("v"))
    val asg = assignBuckets(norm, cents, idCol, dim)

    // one task per bucket: full bucket² in a single kernel pass
    def singleTask(part: DataFrame): DataFrame = {
      val ds = part.select(col("bucket").cast("long").as("bucket"),
          col(idCol).cast("long").as("id"), col("v"))
        .as[(Long, Long, Array[Double])]
      ds.groupByKey(_._1).flatMapGroups { (_, it) =>
        val vecs = it.map(t => (t._2, t._3)).toArray.sortBy(_._1)
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
        var i = 0
        while (i < vecs.length) {
          val (src, xs) = vecs(i)
          val top = new java.util.PriorityQueue[(Double, Long)](k + 1,
            worstFirst)
          topKInto(top, k, src, xs, vecs)
          val arr = drain(top)
          var r = 0
          while (r < arr.length) { out += ((src, arr(r)._2, r + 1)); r += 1 }
          i += 1
        }
        out.iterator
      }.toDF("src_id", "dst_id", "rank")
    }

    // HOT-BUCKET GUARD: block grid WITHIN the bucket. A skewed
    // assignment (one centroid owning a large slice of the corpus)
    // would serialize that bucket's quadratic work into one task;
    // splitting each bucket into b id-hash blocks makes the unit of
    // work one (bucket, bi, bj) cell — b² cells per bucket, each
    // bounded by (bucket/b)² — with a per-cell PARTIAL top-k (the same
    // bounded heap) and a (src)-keyed merge whose input is k·b rows
    // per source, never bucket-sized. Scores are the same sequential
    // dots, so the merged graph is row-identical to the single-task
    // path (spec-asserted).
    // `part` must carry a per-bucket block count `_b` (int ≥ 2). PER
    // BUCKET, not global (SimProbe catch, r16, at 10M): a single grid
    // width sized by the LARGEST bucket (the 100k boilerplate slab →
    // b=25) is paid by EVERY grid bucket — each block's vector list is
    // replicated b× in the cell join and every source's merge input is
    // b·k rows, so when the average bucket also crosses the hot
    // threshold (avg √n = 3163 at 10M, with cluster granularity pushing
    // many buckets past 4096) the exchange+sort spilled ~70 GB and
    // ENOSPC'd the host. With b_i = ceil(est_i / autoTargetBlock) a
    // 5k bucket pays a 2×2 grid while the slab alone pays 25×25; the
    // scores are the same sequential dots under ANY b, so the merged
    // graph stays row-identical (spec-asserted).
    def blockGrid(part: DataFrame): DataFrame = {
      val blocks = part
        .select(col("bucket").cast("long").as("bucket"),
          pmod(col(idCol).cast("long"), col("_b").cast("long"))
            .cast("int").as("blk"),
          col(idCol).cast("long").as("id"), col("v"))
        .groupBy("bucket", "blk")
        .agg(collect_list(struct(col("id").as("_1"), col("v").as("_2")))
          .as("vecs"))
      val cells = blocks
        .select(col("bucket"), col("blk").as("bi"), col("vecs").as("va"))
        .join(blocks.select(col("bucket"), col("blk").as("bj"),
          col("vecs").as("vb")), Seq("bucket"))
        .select(col("bucket"), col("bi"), col("bj"), col("va"), col("vb"))
        // spread cells across tasks: the join leaves the output
        // partitioned by BUCKET, so every cell of a hot bucket runs
        // SERIALLY in one task and the grid split buys no parallelism
        // at all (SimProbe catch, r15: guarded == unguarded wall time
        // until this exchange). One cell-sized shuffle restores the b²
        // fan-out the guard exists for.
        .repartition(col("bucket"), col("bi"), col("bj"))
        .select(col("bi"), col("bj"), col("va"), col("vb"))
        .as[(Int, Int,
          Array[(Long, Array[Double])], Array[(Long, Array[Double])])]
      val partial = cells.flatMap { case (_, _, va, vb0) =>
        val vb = vb0.sortBy(_._1)
        va.iterator.flatMap { case (src, xs) =>
          val top = new java.util.PriorityQueue[(Double, Long)](k + 1,
            worstFirst)
          topKInto(top, k, src, xs, vb)
          drain(top).iterator.map { case (cos, dst) => (src, dst, cos) }
        }
      }.toDF("src_id", "dst_id", "cos")
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("src_id")
        .orderBy(col("cos").desc, col("dst_id").asc)
      partial.withColumn("rank", row_number().over(w))
        .where(col("rank") <= k)
        .select(col("src_id"), col("dst_id"), col("rank"))
    }

    if (nBlocks >= 2) blockGrid(asg.withColumn("_b", lit(nBlocks)))
    else if (nBlocks == 1) singleTask(asg)
    else {
      // AUTO: estimate per-bucket sizes from a seeded corpus sample run
      // through the same assignment (the sample is taken BEFORE the
      // argmax projection, so the stats pass pays autoSampleFraction of
      // the build flops, not all of them). The estimate only picks the
      // EXECUTION shape; rows are identical on either side of it.
      val est = assignBuckets(
          norm.sample(withReplacement = false, autoSampleFraction, 42L),
          cents, idCol, dim)
        .groupBy("bucket").count()
        .collect()
        .map(r => r.getAs[Number]("bucket").longValue ->
          (r.getAs[Long]("count") / autoSampleFraction))
      // per-bucket width: b_i = ceil(est_i / target), floored at 2 —
      // sizing every grid bucket by the largest one multiplies the
      // average hot bucket's exchange by maxEst/est_i (see blockGrid)
      val hotB = est.filter(_._2 > autoTargetBlock).map { case (bkt, e) =>
        (bkt, math.max(2, math.ceil(e.toDouble / autoTargetBlock).toInt))
      }
      if (hotB.isEmpty) singleTask(asg)
      else {
        val hot = hotB.map(_._1)
        val bDf = spark.createDataFrame(hotB.toSeq).toDF("bucket", "_b")
        // persist the assignment so the two branches share ONE argmax
        // pass (n·√n·dim flops — the build's dominant compute; without
        // the cache each union branch recomputes it, measured +75% on
        // the whole build at probe volume). This is the deployment
        // shape anyway — the assignment IS the IVF index, persisted at
        // ingest (ivfTopKFromIndex). Dropped by the per-query
        // clearCache the Verify/Bench session loop already does; the
        // no-skew path above stays cache-free and plan-identical to
        // the explicit nBlocks = 1 form.
        val cached = asg.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        acquiredCaches.add(cached)
        val hotCol = col("bucket").cast("long").isin(hot: _*)
        blockGrid(cached.where(hotCol)
            .withColumn("bucket", col("bucket").cast("long"))
            .join(broadcast(bDf), "bucket"))
          .unionByName(singleTask(cached.where(!hotCol)))
      }
    }
  }

  /** Sign-bit binary quantization: a 64-dim embedding becomes two
    * 32-bit words (bit i set iff component i > 0) — 32× smaller than
    * float32, and Hamming distance approximates angular distance
    * (binary passage retrieval / LSH sign-random-projection, Charikar
    * 2002, with the identity basis). Two 32-bit words rather than one
    * 64-bit word so every value stays below 2^32: both engines build
    * the signature with exact integer arithmetic — no sign-bit or
    * overflow edge anywhere. Pure narrow projection. Vectors shorter
    * than 64 components are zero-padded (missing component ⇒ bit 0):
    * the pad keeps `element_at` in bounds under ANSI mode instead of
    * throwing INVALID_ARRAY_INDEX. */
  def binarySignature(df: DataFrame, vecCol: String, idCol: String)
      : DataFrame = {
    // sign-bit words as a native kernel (plans.SignBits): the unrolled
    // 2×32-arm when-chain generated a ~17 KB method — past the JIT's
    // 8 000-byte ceiling (CodegenAudit catch). The kernel also subsumes
    // the old explicit zero-padding of short vectors: out-of-range
    // components leave their bits unset.
    import org.apache.spark.sql.graft.ColumnBridge
    def word(off: Int): Column =
      ColumnBridge.column(graft.plans.SignBits(
        ColumnBridge.expression(col("_v")), off))
    df.select(col(idCol), col(vecCol).cast("array<double>").as("_v"))
      .select(col(idCol), word(0).as("w0"), word(32).as("w1"))
  }

  /** Hamming top-k over binary signatures: for each query vector the
    * `k` corpus vectors with the fewest differing sign bits
    * (`bit_count(xor)` — codegen'd integer ops, no floats anywhere, so
    * cross-engine parity is EXACT, not margin-based). Queries
    * broadcast; the corpus is scanned once; ties break on neighbor id.
    * The 32-byte-per-row signature scan is the point at 100 TB: the
    * float embeddings never leave their partitions. */
  def hammingTopK(queries: DataFrame, corpus: DataFrame,
      vecCol: String, idCol: String, k: Int): DataFrame = {
    val q = binarySignature(queries, vecCol, idCol)
      .select(col(idCol).as("query_id"), col("w0").as("q0"),
        col("w1").as("q1"))
    val c = binarySignature(corpus, vecCol, idCol)
      .select(col(idCol).as("neighbor_id"), col("w0"), col("w1"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (bit_count(col("w0").bitwiseXOR(col("q0"))) +
          bit_count(col("w1").bitwiseXOR(col("q1"))))
          .cast("long").as("hamming"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("hamming").asc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Hard-negative mining for contrastive training: for each vector,
    * the `k` most similar vectors that belong to a DIFFERENT group
    * (source, domain, language — whatever `groupCol` encodes). The
    * standard shortlist approximation: take the in-bucket kNN shortlist
    * (`shortlist` ≥ k), drop same-group neighbors, keep the top `k`
    * survivors — negatives beyond the shortlist are by definition less
    * hard, so the truncation is the accepted trade (mirrors "mine
    * negatives from the ANN top-k" practice).
    *
    * Scale shape: [[knnGraphIvf]]'s kernel does the heavy work; the
    * group metadata joins are id-keyed shuffles of the (n·shortlist)
    * edge list against the metadata table — NOTHING corpus-sized is
    * broadcast (metadata is corpus-cardinality). Re-ranking reuses the
    * shortlist rank, so no new score computation happens. */
  def hardNegatives(corpus: DataFrame, meta: DataFrame,
      vecCol: String, idCol: String, metaIdCol: String, groupCol: String,
      k: Int, shortlist: Int, nCentroids: Int, dim: Int = 0): DataFrame = {
    require(shortlist >= k, "shortlist must cover k")
    val g = knnGraphIvf(corpus, vecCol, idCol, shortlist, nCentroids, dim)
    val srcMeta = meta.select(col(metaIdCol).cast("long").as("src_id"),
      col(groupCol).as("_src_g"))
    val dstMeta = meta.select(col(metaIdCol).cast("long").as("dst_id"),
      col(groupCol).as("_dst_g"))
    val w = Window.partitionBy("src_id").orderBy(col("rank").asc)
    g.join(srcMeta, "src_id")
      .join(dstMeta, "dst_id")
      .where(col("_src_g") =!= col("_dst_g"))
      .withColumn("neg_rank", row_number().over(w))
      .where(col("neg_rank") <= k)
      .select(col("src_id"), col("dst_id"), col("neg_rank"))
  }

  /** Pairwise squared distance between per-label embedding centroids —
    * cluster-separation / embedding-drift measurement between groups
    * (labels, sources, snapshots).
    *
    * Exactness: elements quantize at 1e-6, per-(label, dim) sums are
    * exact integers, and ||m_a − m_b||² is assembled from the identity
    * (s_a·n_b − s_b·n_a)² / (n_a·n_b)² — exact decimal(38)/HUGEINT
    * integer arithmetic with ONE exact-int-to-double cast and ONE
    * division at the end, so the doubles are bit-identical on any
    * engine with NO rounding tolerance (dist2 is in 1e-6² units).
    *
    * Scale: shuffles carry (label, dim) sums — labels × dim rows, not
    * vectors; the label-pair join is over that tiny sum table. */
  def labelCentroidDistances(df: DataFrame, vecCol: String,
      labelCol: String): DataFrame = {
    val q = df.select(col(labelCol).as("lbl"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("d", "x")))
      .select(col("lbl"), col("d"),
        round(col("x") * lit(1e6)).cast("long").as("q"))
    val sums = q.groupBy(col("lbl"), col("d")).agg(sum(col("q")).as("sq"))
    val cnts = df.groupBy(col(labelCol).as("lbl"))
      .agg(count(lit(1)).as("n"))
    def side(s: String) = sums.join(cnts, "lbl")
      .select(col("lbl").as(s"l$s"), col("d").as(s"d$s"),
        col("sq").as(s"s$s"), col("n").as(s"n$s"))
    def d18(c: org.apache.spark.sql.Column) = c.cast("decimal(18,0)")
    val diff = d18(col("sa")) * d18(col("nb")) -
      d18(col("sb")) * d18(col("na"))
    side("a").join(side("b"),
        col("da") === col("db") && col("la") < col("lb"))
      .withColumn("_t", diff * diff)
      .groupBy(col("la").as("label_a"), col("lb").as("label_b"),
        col("na").as("n_a"), col("nb").as("n_b"))
      .agg(sum(col("_t")).as("_num"))
      .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
        (col("_num").cast("double") /
          ((col("n_a") * col("n_b")) * (col("n_a") * col("n_b")))
            .cast("double")).as("dist2"))
  }
}
