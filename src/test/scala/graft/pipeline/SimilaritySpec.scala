package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  lazy val corpus = Seq(
    (0L, Array(1.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f)),
    (2L, Array(0.0f, 1.0f)),
    (3L, Array(-1.0f, 0.0f)),
    (4L, Array(0.7f, 0.7f))
  ).toDF("vec_id", "embedding")

  test("cosine is exact on axis-aligned vectors") {
    val df = Seq((Array(1.0, 0.0), Array(0.0, 1.0))).toDF("a", "b")
    assert(df.select(Similarity.cosine(col("a"), col("b"))).as[Double].head() == 0.0)
    val df2 = Seq((Array(2.0, 0.0), Array(5.0, 0.0))).toDF("a", "b")
    assert(df2.select(Similarity.cosine(col("a"), col("b"))).as[Double].head() == 1.0)
  }

  test("brute-force top-k ranks by cosine, excludes self") {
    val got = Similarity.bruteForceTopK(
        corpus.where(col("vec_id") === 0), corpus, "embedding", "vec_id", 2)
      .select("neighbor_id").as[Long].collect().toSeq
    assert(got == Seq(1L, 4L)) // cos: 1→.994, 4→.707, 2→0, 3→-1
  }

  test("IVF with all buckets probed equals brute force") {
    val q = corpus.where(col("vec_id") < 3)
    val bf = Similarity.bruteForceTopK(q, corpus, "embedding", "vec_id", 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(q, corpus, "embedding", "vec_id", 3,
        nCentroids = 2, probe = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(ivf == bf)
  }

  test("IVF probe=1 searches only the query's bucket") {
    // md5-spread pick over ids 0..4 takes {4, 1}: centroids
    // {4:(.707,.707), 1:(0.9,0.1)·norm}. Buckets: 0,1→1 (cos .994, 1);
    // 2=(0,1)→4 (.707 > .110); 3=(-1,0)→4 (-.707 > -.994); 4→4.
    // query 2 lands in bucket 4 → neighbors from {3,4} (no self).
    val q = corpus.where(col("vec_id") === 2)
    val got = Similarity.ivfTopK(q, corpus, "embedding", "vec_id", 3,
        nCentroids = 2, probe = 1)
      .select("neighbor_id").as[Long].collect().toSet
    assert(got == Set(3L, 4L))
  }

  test("PQ on codebook-composed vectors is exact (lossless codes ⇒ L2 ranking)") {
    // md5-spread pick over ids 0..3 takes {1, 2} as the codebook
    // (entry k0 = id1, k1 = id2); 0,3 are built from codebook
    // subvectors, so encoding is lossless and adist == exact squared L2
    val c = Seq(
      (1L, Array(0f, 0f, 0f, 0f)), // codebook A (k=0)
      (2L, Array(1f, 1f, 2f, 2f)), // codebook B (k=1)
      (0L, Array(0f, 0f, 2f, 2f)), // sub1 of A, sub2 of B
      (3L, Array(1f, 1f, 0f, 0f))  // sub1 of B, sub2 of A
    ).toDF("vec_id", "embedding")
    // exact L2² from id1: id3→2, id0→8, id2→10 — and PQ must agree exactly
    val ranked = Similarity.pqTopK(c.where(col("vec_id") === 1), c,
        "embedding", "vec_id", k = 3, m = 2, codebookSize = 2, dim = 4)
      .orderBy("rn").select("neighbor_id").as[Long].collect().toSeq
    assert(ranked == Seq(3L, 0L, 2L), s"got $ranked")
  }

  test("PQ ranks by code distance only; equal codes tie-break on id") {
    // 2 and 3 both quantize to codebook entry 0 on every subvector, so
    // their ADC distances are IDENTICAL even though their true distances
    // differ — the scan never touches the floats; id breaks the tie
    val c = Seq(
      (0L, Array(0f, 0f, 0f, 0f)),
      (1L, Array(4f, 4f, 4f, 4f)),
      (2L, Array(0.1f, 0f, 0f, 0f)),
      (3L, Array(0.2f, 0.1f, 0f, 0f)) // truly closer to the query than 2
    ).toDF("vec_id", "embedding")
    val got = Similarity.pqTopK(c.where(col("vec_id") === 1), c,
        "embedding", "vec_id", k = 3, m = 2, codebookSize = 2, dim = 4)
      .orderBy("rn").select("neighbor_id").as[Long].collect().toSeq
    assert(got == Seq(0L, 2L, 3L), s"got $got")
  }

  test("k-means centroids converge to the cluster directions") {
    // three tight clusters around x, y, and -x in CONTIGUOUS id runs
    // (the crawl-ordered shape); the md5-spread init picks ids
    // {27, 6, 19} — one per cluster — and training tightens each onto
    // its cluster direction
    val pts = (0 until 30).map { i =>
      val base = i / 10 match {
        case 0 => (1.0f, 0.02f * (i % 10))
        case 1 => (0.02f * (i % 10), 1.0f)
        case _ => (-1.0f, -0.02f * (i % 10))
      }
      (i.toLong, Array(base._1, base._2))
    }.toDF("vec_id", "embedding")
    val cents = Similarity.trainCentroids(pts, "embedding", "vec_id",
        k = 3, iters = 5)
      .select("centv").as[Array[Double]].collect()
    // one trained centroid near each cluster direction
    def nearest(dir: (Double, Double)): Double =
      cents.map(c => c(0) * dir._1 + c(1) * dir._2).max
    assert(nearest((1, 0)) > 0.95 && nearest((0, 1)) > 0.95 &&
      nearest((-1, 0)) > 0.95)
  }

  test("trainCentroidsExact: converges to cluster directions like the " +
      "float trainer, iteration 2 keeps improving past the pinned " +
      "iteration 1, and the quantized update stays within 2e-6 of the " +
      "float update on one step") {
    // same contiguous-run layout as the float trainer's test: the
    // md5-spread init lands one centroid per cluster
    val pts = (0 until 30).map { i =>
      val base = i / 10 match {
        case 0 => (1.0f, 0.02f * (i % 10))
        case 1 => (0.02f * (i % 10), 1.0f)
        case _ => (-1.0f, -0.02f * (i % 10))
      }
      (i.toLong, Array(base._1, base._2))
    }.toDF("vec_id", "embedding")
    def objective(cents: Array[Array[Double]]): Double = {
      // mean max-cosine over the corpus — the spherical k-means objective
      val vs = pts.select("embedding").as[Array[Float]].collect()
        .map { v =>
          val n = math.sqrt(v(0).toDouble * v(0) + v(1).toDouble * v(1))
          Array(v(0) / n, v(1) / n)
        }
      vs.map(v => cents.map(c => c(0) * v(0) + c(1) * v(1)).max).sum / vs.length
    }
    def trained(iters: Int): Array[Array[Double]] =
      Similarity.trainCentroidsExact(pts, "embedding", "vec_id",
        k = 3, dim = 2, iters = iters)
        .select("centv").as[Array[Double]].collect()
    val it1 = trained(1)
    val it2 = trained(2)
    // convergence beyond the pinned iteration: the objective is
    // non-decreasing (Lloyd monotonicity, quantization noise far below
    // the cluster separation on this data)
    assert(objective(it2) >= objective(it1) - 1e-9,
      s"iteration 2 degraded: ${objective(it2)} < ${objective(it1)}")
    // after 5 exact iterations the centroids separate the clusters,
    // same contract as the float trainer's convergence test
    val it5 = trained(5)
    def nearest(cents: Array[Array[Double]], dir: (Double, Double)) =
      cents.map(c => c(0) * dir._1 + c(1) * dir._2).max
    assert(nearest(it5, (1, 0)) > 0.95 && nearest(it5, (0, 1)) > 0.95 &&
      nearest(it5, (-1, 0)) > 0.95)
    // the 1e-6 quantization: one exact step stays within 2e-6 per
    // component of the magnitude-weighted float mean it quantizes —
    // pinning that the variant differs by quantization, not semantics
    import org.apache.spark.sql.functions.{avg => favg}
    val norm = Similarity.normalized(
      pts.select(col("vec_id"), col("embedding").cast("array<double>")
        .as("rv")), "rv", "v")
    val floatMeans = Similarity.assignBuckets(
        norm.select(col("vec_id"), col("rv"), col("v")),
        Similarity.centroids(pts, "embedding", "vec_id", 3),
        "vec_id", dim = 2, keep = Seq("rv"))
      .select(col("bucket"), posexplode(col("rv")).as(Seq("d", "x")))
      .groupBy("bucket", "d").agg(favg("x").as("m"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2))
      .toMap
    val exactRaw = {
      // re-derive the pre-normalization quantized means the same way
      val asg = Similarity.assignBuckets(
          norm.select(col("vec_id"), col("rv"), col("v")),
          Similarity.centroids(pts, "embedding", "vec_id", 3),
          "vec_id", dim = 2, keep = Seq("rv"))
        .select(col("bucket"), posexplode(col("rv")).as(Seq("d", "x")))
        .select(col("bucket"), col("d"),
          round(col("x") * lit(1e6)).cast("long").as("q"))
        .groupBy("bucket", "d")
        .agg(sum("q").as("sq"), count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getInt(1)) ->
          r.getLong(2).toDouble / (r.getLong(3).toDouble * 1e6)).toMap
      asg
    }
    exactRaw.foreach { case (k, m) =>
      assert(math.abs(m - floatMeans(k)) < 2e-6,
        s"quantized mean drifted at $k: $m vs ${floatMeans(k)}")
    }
  }

  test("trained IVF keeps recall high on clustered data") {
    // Pre-r15 this asserted trained ≫ untrained: the lowest-id init
    // put all centroids in one cluster and only training recovered.
    // The md5-spread pick removed that degenerate init (the collapse
    // case stays measured by SimProbe's idpick_skew stage), so the
    // contract now is: spread init is already well-bucketed, and
    // training must PRESERVE that — both ends recall > 0.9.
    val pts = (0 until 30).map { i =>
      val base = i / 10 match {
        case 0 => (1.0f, 0.02f * (i % 10))
        case 1 => (0.02f * (i % 10), 1.0f)
        case _ => (-1.0f, -0.02f * (i % 10))
      }
      (i.toLong, Array(base._1, base._2))
    }.toDF("vec_id", "embedding")
    val q = pts.where(col("vec_id") < 6)
    val bf = Similarity.bruteForceTopK(q, pts, "embedding", "vec_id", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recall(trainIters: Int): Double = {
      val got = Similarity.ivfTopK(q, pts, "embedding", "vec_id", 5,
          nCentroids = 3, probe = 1, trainIters = trainIters)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      got.intersect(bf).size.toDouble / bf.size
    }
    val trained = recall(3)
    assert(trained > 0.9 && recall(0) > 0.9,
      s"trained=$trained untrained=${recall(0)}")
  }

  test("recallReport: probe=all is exact, recall monotone in probe") {
    val pts = (0 until 30).map { i =>
      val base = i % 3 match {
        case 0 => (1.0f, 0.02f * (i / 3))
        case 1 => (0.02f * (i / 3), 1.0f)
        case _ => (-1.0f, -0.02f * (i / 3))
      }
      (i.toLong, Array(base._1, base._2))
    }.toDF("vec_id", "embedding")
    val q = pts.where(col("vec_id") < 6)
    // relative, not absolute: other suites share this session and may
    // legitimately hold caches — the claim is that the REPORT adds none
    val cachedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val rep = Similarity.recallReport(q, pts, "embedding", "vec_id",
        ks = Seq(3, 5), probes = Seq(1, 2, 3), nCentroids = 3)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(rep.size == 6, "one row per (k, nProbe) grid cell")
    // probing every centroid IS brute force — recall exactly 1
    assert(rep((3, 3)) == 1.0 && rep((5, 3)) == 1.0)
    // more probes never lose neighbors already found
    for (k <- Seq(3, 5)) {
      assert(rep((k, 1)) <= rep((k, 2)) && rep((k, 2)) <= rep((k, 3)))
    }
    assert(rep.values.forall(r => r >= 0.0 && r <= 1.0))
    // the report leaves no caches behind (its intermediates are released
    // inside; the result is a literal frame)
    assert(spark.sparkContext.getPersistentRDDs.keySet == cachedBefore)
  }

  test("int8 quantization: scale from max component, bounded error, zero-safe") {
    val df = Seq(
      (0L, Array(1.0f, -0.25f, 0.0f)),
      (1L, Array(0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.quantizeInt8(df, "embedding", "vec_id")
      .as[(Long, Double, String, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // scale = 1/127 ≈ 0.007874; q = [127, round(-31.75) = -32, 0]
    val (scale, csv, err) = got(0L)
    assert(scale == 0.007874 && csv == "127,-32,0")
    assert(err <= 1.0 / 127 / 2 + 1e-9, s"max error within half a step: $err")
    assert(got(1L) == ((0.0, "0,0,0", 0.0)), "all-zero vector is safe")
  }

  test("randomProject: exact vs driver reference; JL norm preservation") {
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 40L).map(id =>
      (id, Array.fill(64)(rnd.nextGaussian().toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
    val out = Similarity.randomProject(df, "embedding", "vec_id", 64, 16)
      .as[(Long, String)].collect().toMap
    // exactness: the column kernel reproduces the driver-side math
    def reference(v: Array[Float]): Seq[Long] = {
      val vi = v.map(x => math.round(x.toDouble * 1e6))
      (0 until 16).map(j =>
        (0 until 64).map(i => vi(i) * Similarity.rpSign(j, i)).sum)
    }
    vecs.foreach { case (id, v) =>
      assert(out(id) == reference(v).mkString(","), s"vec $id")
    }
    // JL property: E||Px||^2 = dOut/dIn * ... with ±1 signs,
    // E||Px||^2 = dOut * ||x||^2; check the empirical mean ratio over
    // 40 gaussian vectors lands within a loose (1 ± 0.5) band
    val ratios = vecs.map { case (id, v) =>
      val p = out(id).split(",").map(_.toLong)
      val p2 = p.map(x => x.toDouble * x).sum
      val v2 = v.map(x => x.toDouble * 1e6 * x * 1e6).sum
      p2 / (16.0 * v2)
    }
    val mean = ratios.sum / ratios.size
    assert(mean > 0.5 && mean < 1.5, s"JL mean ratio off: $mean")
    // sign matrix is balanced-ish (md5 parity, 1024 entries)
    val pos = (for { j <- 0 until 16; i <- 0 until 64 }
      yield Similarity.rpSign(j, i)).count(_ == 1)
    assert(pos > 400 && pos < 624, s"sign matrix skewed: $pos/1024 positive")
  }

  test("knnGraphIvf: neighbors stay in-bucket, ranked by cosine") {
    import spark.implicits._
    // Two orthogonal clusters; centroids = ids 0,1 (lowest ids) land one
    // in each, so the bucketed self-join partitions the graph cleanly.
    val df = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)),
      (2L, Seq(0.9f, 0.1f)), (3L, Seq(0.1f, 0.9f)),
      (4L, Seq(0.8f, 0.2f))).toDF("vec_id", "embedding")
    val got = Similarity.knnGraphIvf(df, "embedding", "vec_id",
        k = 2, nCentroids = 2, dim = 2)
      .as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    val xCluster = Set(0L, 2L, 4L)
    assert(got.keySet == Set(0L, 1L, 2L, 3L, 4L))
    assert(xCluster.forall(s => got(s).forall(xCluster - s)),
      "x-cluster neighbors never cross buckets")
    assert(got(1L) == Seq(3L) && got(3L) == Seq(1L),
      "2-vector bucket yields a single mutual neighbor")
    // cos(2,4)=cos of (0.9,0.1)·(0.8,0.2) normalized > cos(2,0)? dot
    // ordering: (2,0): .9/.905≈.9945, (2,4): (.72+.02)/(.905·.8246)≈.9915
    assert(got(2L) == Seq(0L, 4L), "rank follows cosine, not id")
  }

  test("hardNegatives: same-group shortlist entries are skipped") {
    import spark.implicits._
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)),
      (2L, Seq(0.9f, 0.1f)), (3L, Seq(0.1f, 0.9f)),
      (4L, Seq(0.8f, 0.2f))).toDF("vec_id", "embedding")
    // x-cluster {0,2,4}: 0 and 2 share a group, 4 differs → 0's hardest
    // cross-group neighbor is 4 even though 2 is nearer.
    val meta = Seq((0L, "g1"), (1L, "g1"), (2L, "g1"), (3L, "g2"),
      (4L, "g2")).toDF("doc_id", "source")
    val got = Similarity.hardNegatives(emb, meta, "embedding", "vec_id",
        "doc_id", "source", k = 1, shortlist = 2, nCentroids = 2, dim = 2)
      .as[(Long, Long, Int)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(got == Map(0L -> 4L, 2L -> 4L, 4L -> 2L, 1L -> 3L, 3L -> 1L),
      "same-group neighbors skipped; cross-group pairs kept both ways")
  }

  test("hammingTopK: sign-bit signatures, exact integer distances") {
    import spark.implicits._
    // 64-dim vectors differing in a known number of sign bits.
    def vec(flips: Set[Int]): Seq[Float] =
      (0 until 64).map(i => if (flips(i)) -1.0f else 1.0f)
    val df = Seq(
      (0L, vec(Set.empty)),          // query
      (1L, vec(Set(0))),             // hamming 1
      (2L, vec(Set(1, 40))),         // hamming 2 (one bit in each word)
      (3L, vec((0 until 64).toSet)), // hamming 64
      (4L, vec(Set(5)))              // hamming 1, higher id than 1
    ).toDF("vec_id", "embedding")
    val got = Similarity.hammingTopK(df.where(col("vec_id") === 0), df,
        "embedding", "vec_id", k = 3)
      .select("neighbor_id", "hamming", "rank")
      .as[(Long, Long, Int)].collect().sortBy(_._3)
    assert(got.toSeq == Seq((1L, 1L, 1), (4L, 1L, 2), (2L, 2L, 3)),
      "distance ties break on neighbor id; both words counted")
  }

  test("binarySignature: vectors shorter than 64 dims zero-pad (ANSI-safe)") {
    import spark.implicits._
    // 3 components: bits 0 and 2 positive → w0 = 1 + 4; the missing 61
    // components must read as 0 bits, not INVALID_ARRAY_INDEX
    val df = Seq((7L, Seq(1.0f, -1.0f, 2.0f))).toDF("vec_id", "embedding")
    val got = Similarity.binarySignature(df, "embedding", "vec_id")
      .as[(Long, Long, Long)].collect().head
    assert(got == ((7L, 5L, 0L)), s"got $got")
  }

  test("knnGraphIvf: block-grid guard is row-identical to one-task path") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val emb = (0L until 120L).map { i =>
      (i, Seq.fill(8)(rnd.nextFloat() - 0.5f))
    }.toDF("vec_id", "embedding")
    val plain = Similarity.knnGraphIvf(emb, "embedding", "vec_id",
        k = 4, nCentroids = 3, dim = 8)
      .as[(Long, Long, Int)].collect().toSet
    val grid = Similarity.knnGraphIvf(emb, "embedding", "vec_id",
        k = 4, nCentroids = 3, dim = 8, nBlocks = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(grid == plain, "partial top-k merge reproduces the full kernel")
  }

  test("centroids: md5-spread pick is content/id-order independent") {
    import spark.implicits._
    val df = (0L until 40L).map(i => (i, Seq.fill(4)(1.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.centroids(df, "embedding", "vec_id", 5)
      .select("centroid_id").as[Long].collect().toSet
    // the reference pick: 5 smallest by (md5(decimal id), id) — NOT the
    // 5 lowest ids (crawl-ordered corpora put near-identical template
    // pages in contiguous id runs; a lowest-id pick lands every
    // centroid in one true cluster and collapses the index)
    def hex(i: Long): String = java.security.MessageDigest
      .getInstance("MD5").digest(i.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val want = (0L until 40L).sortBy(i => (hex(i), i)).take(5).toSet
    assert(got == want, s"got $got want $want")
    assert(got != (0L until 5L).toSet, "the pick must not be lowest-id")
  }

  test("knnGraphIvf: auto skew guard splits only hot buckets, " +
      "rows identical to the forced single-task path") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // 250 near-identical vectors (one hot bucket) + 50 spread vectors
    val emb = (0L until 300L).map { i =>
      if (i < 250L)
        (i, Seq.tabulate(8)(j =>
          (if (j == 0) 1.0f else 0.0f) + (rnd.nextFloat() - 0.5f) * 0.01f))
      else (i, Seq.fill(8)(rnd.nextFloat() - 0.5f))
    }.toDF("vec_id", "embedding")
    val forced = Similarity.knnGraphIvf(emb, "embedding", "vec_id",
        k = 4, nCentroids = 4, dim = 8, nBlocks = 1)
      .as[(Long, Long, Int)].collect().toSet
    val auto = Similarity.knnGraphIvf(emb, "embedding", "vec_id",
        k = 4, nCentroids = 4, dim = 8, nBlocks = 0,
        autoTargetBlock = 32, autoSampleFraction = 1.0)
    assert(auto.queryExecution.optimizedPlan.toString.contains("Union"),
      "a >32-vector bucket must engage the hot-bucket grid (union plan)")
    assert(auto.as[(Long, Long, Int)].collect().toSet == forced,
      "the split moves work, never answers")
  }

  test("knnGraphIvf: auto with no skew keeps the exact single-task plan") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val emb = (0L until 120L).map { i =>
      (i, Seq.fill(8)(rnd.nextFloat() - 0.5f))
    }.toDF("vec_id", "embedding")
    val auto = Similarity.knnGraphIvf(emb, "embedding", "vec_id",
      k = 4, nCentroids = 3, dim = 8, autoSampleFraction = 1.0)
    assert(!auto.queryExecution.optimizedPlan.toString.contains("Union"),
      "no hot bucket -> the returned plan is the plain kernel path")
    val forced = Similarity.knnGraphIvf(emb, "embedding", "vec_id",
        k = 4, nCentroids = 3, dim = 8, nBlocks = 1)
      .as[(Long, Long, Int)].collect().toSet
    assert(auto.as[(Long, Long, Int)].collect().toSet == forced)
  }

  test("labelCentroidDistances: exact micros² distance, ordered pairs") {
    // A: (1,0),(0,1) → centroid (0.5,0.5); B: (1,1) → centroid (1,1)
    // ‖mA−mB‖² = 0.5 → 5e11 in 1e-6² units, EXACTLY
    val df = Seq(
      (0, Seq(1.0f, 0.0f)), (0, Seq(0.0f, 1.0f)),
      (1, Seq(1.0f, 1.0f))).toDF("label", "embedding")
    val got = Similarity.labelCentroidDistances(df, "embedding", "label")
      .as[(Int, Int, Long, Long, Double)].collect()
    assert(got.toSeq == Seq((0, 1, 2L, 1L, 5e11)),
      s"got ${got.toSeq}")
  }

  test("labelCentroidDistances: identical distributions → distance 0") {
    val df = Seq(
      (0, Seq(0.25f, -0.5f)), (1, Seq(0.25f, -0.5f)),
      (2, Seq(0.75f, 0.1f))).toDF("label", "embedding")
    val got = Similarity.labelCentroidDistances(df, "embedding", "label")
      .as[(Int, Int, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._5).toMap
    assert(got((0, 1)) == 0.0)
    assert(got((0, 2)) > 0.0 && got((0, 2)) == got((1, 2)))
  }

  test("assignBuckets drops un-assignable vectors: null/short inputs " +
      "never form a bucket (no -1 centroid can be minted)") {
    val cents = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)))
      .toDF("centroid_id", "centv")
    val corpus = Seq(
      (0L, Seq(1.0, 0.0)),          // valid → bucket 0
      (1L, Seq(0.6, 0.8)),          // valid → bucket 1
      (2L, null: Seq[Double]),      // null vector → excluded
      (3L, Seq(0.5))                // short (dim 1 < 2) → excluded
    ).toDF("id", "v")
    val got = Similarity.assignBuckets(corpus, cents, "id", dim = 2)
      .select("id", "bucket").as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 0L, 1L -> 1L),
      s"invalid vectors must not appear in any bucket, got $got")
    assert(got.values.forall(_ >= 0L))
  }
}
