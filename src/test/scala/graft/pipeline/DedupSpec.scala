package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  lazy val docsDF = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again"),
    (1L, "the quick brown fox jumps over the lazy dog again and again"), // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy cat again and again"), // near dup of 0
    (3L, "completely different content about spark distributed engines here"),
    (4L, "another unrelated short text with its own words entirely")
  ).toDF("doc_id", "text")

  test("exact dedup keeps lowest id and counts copies") {
    val surv = Dedup.exactSurvivors(docsDF, "text", "doc_id")
      .select("doc_id", "n_copies").as[(Long, Long)].collect().toMap
    assert(surv(0L) == 2 && !surv.contains(1L) && surv(2L) == 1)
    val pairs = Dedup.exactPairs(docsDF, "text", "doc_id")
      .as[(Long, Long)].collect().toSeq
    assert(pairs == Seq((0L, 1L)))
  }

  test("line dedup removes corpus-frequent lines, preserves order") {
    val docs = Seq(
      (1L, "header\nalpha one\nbeta two"),
      (2L, "header\ngamma three"),
      (3L, "header\nalpha one\ndelta four")).toDF("doc_id", "text")
    val got = Dedup.dedupLines(docs, "text", "doc_id", maxDocs = 2)
      .select("doc_id", "clean_text", "n_lines", "n_removed")
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    // "header" occurs in 3 docs > 2 → dropped; "alpha one" in 2 ≤ 2 → kept
    assert(got(1L) == ((1L, "alpha one\nbeta two", 3L, 1L)))
    assert(got(2L) == ((2L, "gamma three", 2L, 1L)))
    assert(got(3L) == ((3L, "alpha one\ndelta four", 3L, 1L)))
  }

  test("line dedup: all-boilerplate doc keeps an empty clean_text row") {
    val docs = Seq(
      (1L, "same line"), (2L, "same line"),
      (3L, "same line\nunique tail")).toDF("doc_id", "text")
    val got = Dedup.dedupLines(docs, "text", "doc_id", maxDocs = 1)
      .select("doc_id", "clean_text", "n_removed")
      .as[(Long, String, Long)].collect().map(r => r._1 -> r).toMap
    assert(got.size == 3, "fully-scrubbed docs must not vanish")
    assert(got(1L) == ((1L, "", 1L)) && got(2L) == ((2L, "", 1L)))
    assert(got(3L) == ((3L, "unique tail", 1L)))
  }

  test("jaccard of identical is 1, disjoint is 0") {
    val df = Seq((0L, "a b c d e"), (1L, "a b c d e"), (2L, "x y z w v"))
      .toDF("id", "t")
      .select(col("id"), Dedup.shingles(col("t"), 3).as("sh"))
    val a = df.where(col("id") === 0).select(col("sh").as("sa"))
    val b = df.where(col("id") === 1).select(col("sh").as("sb"))
    val c = df.where(col("id") === 2).select(col("sh").as("sc"))
    val j1 = a.crossJoin(b).select(Dedup.jaccard(col("sa"), col("sb"))).as[Double].head()
    val j0 = a.crossJoin(c).select(Dedup.jaccard(col("sa"), col("sc"))).as[Double].head()
    assert(j1 == 1.0 && j0 == 0.0)
  }

  test("minhash LSH finds exact and near dups, skips unrelated") {
    val got = Dedup.minhashNearDups(docsDF, "text", "doc_id",
        shingleN = 3, k = 12, bands = 6, threshold = 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got.contains((0L, 1L))) // exact dup always collides
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minhash similarity of identical signatures is 1") {
    val df = Seq((0L, "a b c d e f g")).toDF("id", "t")
      .select(Dedup.minhashSignature(Dedup.shingles(col("t"), 3), 8).as("sig"))
    val sim = df.select(Dedup.minhashSimilarity(col("sig"), col("sig")))
      .as[Double].head()
    assert(sim == 1.0)
  }

  test("relational simhashDF equals the expression simhash") {
    val expr = docsDF.select(col("doc_id"), Dedup.simhash(col("text")))
      .as[(Long, Long)].collect().toMap
    val rel = Dedup.simhashDF(docsDF, "text", "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(rel == expr)
  }

  test("simhash: identical texts agree, near texts close, different far") {
    val sh = docsDF.select(col("doc_id"), Dedup.simhash(col("text")).as("sh"))
      .as[(Long, Long)].collect().toMap
    assert(sh(0L) == sh(1L))
    val hamNear = java.lang.Long.bitCount(sh(0L) ^ sh(2L))
    val hamFar = java.lang.Long.bitCount(sh(0L) ^ sh(3L))
    assert(hamNear < hamFar)
    assert(sh(0L) >= 0 && sh(0L) < (1L << 60))
  }

  test("stop-shingle cap drops hot-shingle work, keeps true near-dups") {
    // every doc shares the hot prefix "common filler words"; only 0/1 are
    // real near-dups. With the cap at 3, the ubiquitous prefix shingle's
    // m² pair fan-out is skipped entirely.
    val docs = (0 until 8).map { i =>
      val tail = if (i == 1) "alpha beta gamma delta" // near-dup of 0
                 else if (i == 0) "alpha beta gamma delta"
                 else s"unique$i tail$i words$i only$i"
      (i.toLong, s"common filler words $tail")
    }.toDF("doc_id", "text")
    val exact = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
        shingleN = 3, threshold = 0.5, lenBucket = 100)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val capped = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
        shingleN = 3, threshold = 0.5, lenBucket = 100,
        maxShinglePostings = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.contains((0L, 1L)) && capped.contains((0L, 1L)))
    // capped jaccard only under-estimates: no pair appears under the cap
    // that the exact run rejected
    assert(capped.subsetOf(exact))
  }

  test("connected components: chains converge, clusters get min label") {
    val verts = (0L to 9L).toDF("id")
    // chain 0-1-2-3 (diameter forces multiple rounds), pair 5-6, singletons
    val edges = Seq((1L, 0L), (1L, 2L), (3L, 2L), (5L, 6L)).toDF("a", "b")
    val got = Dedup.connectedComponents(verts, "id", edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert((0L to 3L).forall(got(_) == 0L), s"chain collapses to 0: $got")
    assert(got(5L) == 5L && got(6L) == 5L)
    assert(got(4L) == 4L && got(9L) == 9L, "singletons keep their own id")
  }

  test("connected components ≡ union-find on seeded random graphs") {
    val rnd = new scala.util.Random(42)
    (0 until 3).foreach { trial =>
      val n = 30
      val edges = (0 until 25).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // reference: plain union-find with min-id representatives
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) { val lo = math.min(ra, rb); parent(math.max(ra, rb)) = lo }
      }
      val expect = (0 until n).map(i => i.toLong -> find(i).toLong).toMap
      val got = Dedup.connectedComponents(
          (0L until n.toLong).toDF("id"), "id",
          edges.toDF("a", "b"), "a", "b")
        .as[(Long, Long)].collect().toMap
      assert(got == expect, s"trial $trial: $got vs $expect")
    }
  }

  test("iterative path (cap=0): a diameter-199 chain converges within " +
      "O(log D) rounds — star rewiring, not O(D) propagation") {
    val n = 200L
    val verts = (0L until n).toDF("id")
    val edges = (0L until n - 1).map(i => (i, i + 1)).toDF("a", "b")
    // plain min-label propagation needs 199 rounds here; large-star/
    // small-star must land inside 12 (log² bound, log2(199) ≈ 7.6 plus
    // slack). maxIters is the assertion: an unconverged run leaves
    // labels != 0 mid-chain.
    val got = Dedup.connectedComponents(verts, "id", edges, "a", "b",
        maxIters = 12, smallGraphEdgeCap = 0L)
      .as[(Long, Long)].collect().toMap
    assert(got.size == n.toInt)
    assert(got.values.forall(_ == 0L),
      s"chain must fully collapse to 0 within 12 rounds: " +
        got.filter(_._2 != 0L).take(5).toString)
  }

  test("iterative path (cap=0) ≡ union-find on seeded random graphs") {
    val rnd = new scala.util.Random(271)
    val n = 30
    val edges = (0 until 25).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) { val lo = math.min(ra, rb); parent(math.max(ra, rb)) = lo }
    }
    val expect = (0 until n).map(i => i.toLong -> find(i).toLong).toMap
    val got = Dedup.connectedComponents(
        (0L until n.toLong).toDF("id"), "id",
        edges.toDF("a", "b"), "a", "b", smallGraphEdgeCap = 0L)
      .as[(Long, Long)].collect().toMap
    assert(got == expect)
  }

  test("nearDupClusters marks survivors and sizes") {
    val docsDF2 = Seq(
      (10L, "x"), (11L, "x"), (12L, "x"), (20L, "y"), (30L, "z"))
      .toDF("doc_id", "text")
    val pairs = Seq((10L, 11L), (11L, 12L)).toDF("id_a", "id_b")
    val got = Dedup.nearDupClusters(docsDF2, "doc_id", pairs)
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(10L) == ((10L, 3L, true)))
    assert(got(11L) == ((10L, 3L, false)) && got(12L) == ((10L, 3L, false)))
    assert(got(20L) == ((20L, 1L, true)) && got(30L) == ((30L, 1L, true)))
  }

  test("minhash LSH hot-bucket sub-split is exact vs the plain join") {
    val docs = (0 until 30).map { i =>
      val tail = if (i % 3 == 0) "alpha beta gamma delta epsilon zeta"
                 else s"unique$i tail${i % 4} words${i % 5} only$i more$i end$i"
      (i.toLong, s"common lead $tail")
    }.toDF("doc_id", "text")
    def run(cap: Int) = Dedup.minhashNearDups(docs, "text", "doc_id",
        shingleN = 3, k = 12, bands = 6, threshold = 0.3, maxBucket = cap)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val exact = run(0)
    assert(exact.nonEmpty, "sanity: identical-tail docs must pair")
    assert(run(2) == exact && run(1) == exact)
  }

  test("minhash LSH: 2k identical docs complete under the bucket cap") {
    // identical texts → identical signatures → every band bucket holds
    // all 2k docs; the cap bounds each cell's candidate output to ≤ 200²
    val n = 2000
    val docs = (0 until n).map(i => (i.toLong, "same text every time here again"))
      .toDF("doc_id", "text")
    val cnt = Dedup.minhashNearDups(docs, "text", "doc_id",
        shingleN = 3, k = 12, bands = 4, threshold = 0.5, maxBucket = 200)
      .count()
    assert(cnt == n.toLong * (n - 1) / 2)
  }

  test("hot-bucket sub-split is exact with STRING doc ids") {
    // the sub-group used to be pmod(id, nsub) — numeric-only; string ids
    // nulled the group and silently dropped every pair in capped buckets
    val docs = (0 until 30).map { i =>
      val tail = if (i % 3 == 0) "alpha beta gamma delta epsilon zeta"
                 else s"unique$i tail${i % 4} words${i % 5} only$i more$i end$i"
      (f"doc-$i%04d", s"common lead $tail")
    }.toDF("doc_id", "text")
    def mh(cap: Int) = Dedup.minhashNearDups(docs, "text", "doc_id",
        shingleN = 3, k = 12, bands = 6, threshold = 0.3, maxBucket = cap)
      .select("id_a", "id_b").as[(String, String)].collect().toSet
    val mhExact = mh(0)
    assert(mhExact.nonEmpty, "sanity: identical-tail docs must pair")
    assert(mh(2) == mhExact, "capped minhash must be exact on string ids")
    def sh(cap: Int) = Dedup.simhashNearDups(docs, "text", "doc_id",
        maxHamming = 30, prefixBits = 4, maxBucket = cap)
      .select("id_a", "id_b").as[(String, String)].collect().toSet
    val shExact = sh(0)
    assert(shExact.nonEmpty)
    assert(sh(2) == shExact, "capped simhash must be exact on string ids")
  }

  test("simhash hot-bucket sub-split is exact vs the plain join") {
    // varied small corpus: buckets of size > 1 plus singletons
    val docs = (0 until 40).map { i =>
      val base = s"shared lead words w${i % 5} x${i % 3}"
      (i.toLong, s"$base tail${i % 7} more${i % 11} end$i")
    }.toDF("doc_id", "text")
    def run(cap: Int) = Dedup.simhashNearDups(docs, "text", "doc_id",
        maxHamming = 30, prefixBits = 4, maxBucket = cap)
      .select("id_a", "id_b", "hamming")
      .as[(Long, Long, Int)].collect().toSet
    val exact = run(0)
    assert(exact.nonEmpty, "sanity: the corpus must produce pairs")
    assert(run(3) == exact, "cap=3 sub-split must emit the exact pair set")
    assert(run(1) == exact, "cap=1 (max splitting) must also be exact")
  }

  test("simhash hot bucket: 2k identical-prefix docs complete under the cap") {
    // 2000 IDENTICAL texts → one signature, one prefix bucket. The plain
    // join would compute all ~2M pairs in a single task; the cap bounds
    // every cell to ≤ 200² pair candidates. Output is counted, not
    // collected (hamming 0 ⇒ every pair passes the filter).
    val n = 2000
    val docs = (0 until n).map(i => (i.toLong, "same text every time here"))
      .toDF("doc_id", "text")
    val cnt = Dedup.simhashNearDups(docs, "text", "doc_id",
        maxHamming = 12, prefixBits = 8, maxBucket = 200)
      .count()
    assert(cnt == n.toLong * (n - 1) / 2)
  }

  test("ngram jaccard blocked pairs finds the near dup") {
    val got = Dedup.ngramJaccardPairs(docsDF, "text", "doc_id",
        shingleN = 3, threshold = 0.3, lenBucket = 100)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got.contains((0L, 1L)) && got.contains((0L, 2L)))
  }

  test("embedding near-dups by cosine threshold") {
    val e = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.99f, 0.1f, 0.0f)), // ~cos 0.995 with 0
      (2L, Array(0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = Dedup.embeddingNearDups(e, "embedding", "vec_id", 0.9)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 1L)))
  }

  test("semanticNearDups: within-cluster pairs only, subset of all-pairs") {
    // two tight clusters around +x and +y, one near-dup pair in each;
    // centroids are the id-pick rows 0 and 1 (one per cluster direction)
    val e = Seq(
      (0L, Array(1.0f, 0.05f, 0.0f)),  // centroid A (+x)
      (1L, Array(0.05f, 1.0f, 0.0f)),  // centroid B (+y)
      (2L, Array(0.99f, 0.08f, 0.0f)), // near 0
      (3L, Array(0.04f, 0.98f, 0.0f)), // near 1
      (4L, Array(0.0f, 0.0f, 1.0f))    // isolated (+z)
    ).toDF("vec_id", "embedding")
    val sem = Dedup.semanticNearDups(e, "embedding", "vec_id",
        threshold = 0.9, nCentroids = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(sem == Set((0L, 2L), (1L, 3L)))
    // recall contract: semantic pairs are a subset of the exact all-pairs
    val full = Dedup.embeddingNearDups(e, "embedding", "vec_id", 0.9)
      .as[(Long, Long)].collect().toSet
    assert(sem.subsetOf(full))
  }

  test("block-grid embedding dedup: 50k vectors, no driver materialization") {
    // planted dup pairs: id and id+50000 share a vector direction; all
    // other vectors are axis-distinct. Runs the full (block_i ≤ block_j)
    // grid — the driver never holds the corpus (no collect/broadcast in
    // the plan), each task two blocks.
    val n = 50000
    val planted = 40
    // deterministic pseudo-random 8-dim vectors from murmur3: two distinct
    // source ids agreeing on all 8 hashed components is ~(1/2001)^8 — at
    // threshold 0.99999 only the planted exact dups can pair
    val vec = "array(" + (0 until 8).map(j =>
      s"(pmod(hash(src, $j), 2001) - 1000) / 1000.0D").mkString(",") + ")"
    val e = spark.range(n + planted)
      .selectExpr("id AS vec_id",
        s"CASE WHEN id >= $n THEN id - $n ELSE id END AS src")
      .selectExpr("vec_id", s"$vec AS embedding")
    val got = Dedup.embeddingNearDups(e, "embedding", "vec_id",
        threshold = 0.99999, nBlocks = 8)
      .as[(Long, Long)].collect().toSet
    val expected = (0 until planted).map(i => (i.toLong, (n + i).toLong)).toSet
    assert(got == expected)
  }

  test("pipeline caches are owned by the session loop and fully dropped") {
    spark.catalog.clearCache()
    Dedup.minhashNearDups(docsDF, "text", "doc_id").count()
    Dedup.ngramJaccardPairs(docsDF, "text", "doc_id").count()
    // the queries persisted intermediates...
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty)
    // ...and the session loop's clearCache (Verify/Bench run it per query)
    // leaves no cached RDDs behind
    spark.catalog.clearCache()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("duplicateSpans: shared 10-word window flags in both docs") {
    import spark.implicits._
    val span = "a b c d e f g h i j"
    val df = Seq(
      (1L, s"$span x"),   // windows: [a..j], [b..j x]
      (2L, s"z $span"),   // windows: [z a..i], [a..j]
      (3L, "too short")   // < 10 words → zero spans
    ).toDF("doc_id", "text")
    val got = Dedup.duplicateSpans(df, "text", "doc_id", spanN = 10)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((2L, 1L, 0.5)), "one of two windows is corpus-dup")
    assert(got(2L) == ((2L, 1L, 0.5)))
    assert(got(3L) == ((0L, 0L, 0.0)), "short doc reports zero, not missing")
  }

  test("duplicateSpans: intra-document repetition counts as duplication") {
    import spark.implicits._
    val span = "a b c d e f g h i j"
    // 20 words: windows at i=0 and i=10 are both `span` → occ=2
    val df = Seq((1L, s"$span $span")).toDF("doc_id", "text")
    val got = Dedup.duplicateSpans(df, "text", "doc_id", spanN = 10)
      .as[(Long, Long, Long, Double)].collect().head
    assert(got._2 == 11L, "20 words → 11 windows")
    assert(got._3 == 2L, "both copies of the repeated span flag")
  }

  test("removeDuplicateSpans: covered tokens go, order survives") {
    import spark.implicits._
    val span = "a b c d e f g h i j"
    val df = Seq(
      (1L, s"pre $span post"),  // 12 words; dup window covers pos 1..10
      (2L, s"$span"),           // exactly the span → fully removed
      (3L, "tiny doc")          // < 10 words, untouched
    ).toDF("doc_id", "text")
    val got = Dedup.removeDuplicateSpans(df, "text", "doc_id", spanN = 10)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == (("pre post", 12L, 10L)),
      "only the duplicated window's tokens are removed, order kept")
    assert(got(2L) == (("", 10L, 10L)), "fully-dup doc keeps empty text")
    assert(got(3L) == (("tiny doc", 2L, 0L)))
  }

  test("removeDuplicateSpans: 2k identical docs stay linear (no m² blowup)") {
    import spark.implicits._
    val text = (1 to 30).map(i => s"tok$i").mkString(" ")
    val df = (1L to 2000L).map(i => (i, text)).toDF("doc_id", "text")
    val got = Dedup.removeDuplicateSpans(df, "text", "doc_id", spanN = 10)
      .agg(count(lit(1)), sum(col("n_removed")))
      .as[(Long, Long)].collect().head
    assert(got == ((2000L, 2000L * 30)),
      "every doc fully covered by corpus-duplicated windows")
  }

  test("duplicateSpans: randomized differential vs reference counts") {
    import spark.implicits._
    val vocab = Vector("x", "y", "z")
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(200 + seed)
      val docs = (1L to 20L).map(i => (i,
        Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" ")))
      val spanN = 3
      val windows = docs.map { case (id, t) =>
        id -> t.trim.split("\\s+").toSeq.filter(_.nonEmpty)
          .sliding(spanN).filter(_.size == spanN).map(_.mkString(" ")).toSeq
      }
      val freq = windows.flatMap(_._2).groupBy(identity)
        .view.mapValues(_.size).toMap
      val want = windows.map { case (id, ws) =>
        val dup = ws.count(freq(_) >= 2).toLong
        val frac = if (ws.isEmpty) 0.0
          else BigDecimal(dup.toDouble / ws.size)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (id, ws.size.toLong, dup, frac)
      }.toSet
      val got = Dedup.duplicateSpans(docs.toDF("doc_id", "text"), "text",
          "doc_id", spanN = spanN)
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(got == want, s"differential mismatch at seed=$seed")
    }
  }
}
