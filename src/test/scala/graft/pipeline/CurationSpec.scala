package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gates Curation.scala: bin boundaries for packTokenBudget, short/empty
  * docs in contamination, NULL-id/NULL-stratum handling in
  * stratifiedSample, and tie-break determinism in topKTokens. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------- stratified sample

  test("stratifiedSample is deterministic and rate-proportional") {
    val df = (0L until 4000L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("id", "lang")
    val run = () => Curation.stratifiedSample(df, "lang", "id",
      Map("en" -> 0.5, "de" -> 0.125)).select("id").as[Long].collect().toSet
    val a = run()
    assert(a == run(), "same input must select the same rows")
    val byLang = Curation.stratifiedSample(df, "lang", "id",
        Map("en" -> 0.5, "de" -> 0.125))
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    // 2000 candidates per stratum; md5 buckets are uniform enough for ±20%
    assert(math.abs(byLang("en") - 1000.0) < 200, s"en: ${byLang("en")}")
    assert(math.abs(byLang("de") - 250.0) < 100, s"de: ${byLang("de")}")
  }

  test("stratifiedSample samples NULL ids via sentinel instead of dropping") {
    val df = Seq((Some(1L), "en"), (None, "en"), (None, "en"))
      .toDF("id", "lang")
    // rate 1.0 keeps every bucket — NULL ids must survive, not vanish
    val kept = Curation.stratifiedSample(df, "lang", "id", Map("en" -> 1.0))
    assert(kept.count() == 3)
    // and at rate 0 nothing survives (no sentinel special-casing)
    val none = Curation.stratifiedSample(df, "lang", "id", Map("en" -> 0.0))
    assert(none.count() == 0)
  }

  test("stratifiedSample: NULL stratum falls through to defaultRate") {
    val df = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("id", "lang")
    assert(Curation.stratifiedSample(df, "lang", "id",
      Map("en" -> 0.0), defaultRate = 1.0).count() == 2)
    assert(Curation.stratifiedSample(df, "lang", "id",
      Map("en" -> 1.0), defaultRate = 0.0).count() == 0)
  }

  // ----------------------------------------------------------- token packing

  test("packTokenBudget: exclusive prefix sum puts boundary doc in new bin") {
    // budget 10, single shard: token counts 10,5,5,10 → prefix 0,10,15,20
    // → bins 0,1,1,2. A doc exactly at the budget boundary OPENS the next
    // bin (its own tokens are excluded from its prefix).
    val df = Seq((0L, "s", 10), (1L, "s", 5), (2L, "s", 5), (3L, "s", 10))
      .toDF("id", "stratum", "toks")
    val got = Curation.packTokenBudget(df, "stratum", "id", col("toks"),
        budget = 10L, nShards = 1)
      .select("id", "bin_id").as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 2L))
  }

  test("packTokenBudget: oversized doc overflows its bin by one doc only") {
    // 25 tokens with budget 10: prefix 0 → bin 0; next doc prefix 25 → bin 2
    val df = Seq((0L, "s", 25), (1L, "s", 3), (2L, "s", 3))
      .toDF("id", "stratum", "toks")
    val got = Curation.packTokenBudget(df, "stratum", "id", col("toks"),
        budget = 10L, nShards = 1)
      .select("id", "bin_id").as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 0L, 1L -> 2L, 2L -> 2L))
  }

  test("packTokenBudget: shards pack independently; pack_key is composite") {
    val df = (0L until 8L).map(i => (i, "s", 6)).toDF("id", "stratum", "toks")
    val got = Curation.packTokenBudget(df, "stratum", "id", col("toks"),
        budget = 10L, nShards = 2)
      .select("id", "shard", "bin_id", "pack_key")
      .as[(Long, Long, Long, String)].collect()
    // per shard: 4 docs × 6 tokens, prefix 0,6,12,18 → bins 0,0,1,1
    got.foreach { case (id, shard, bin, key) =>
      assert(shard == id % 2)
      val expected = if ((id / 2) < 2) 0L else 1L
      assert(bin == expected, s"id=$id bin=$bin")
      assert(key == s"s#$shard#$bin")
    }
    // bin_id alone collides across shards; pack_key does not conflate them
    val keys = got.map(_._4).toSet
    assert(keys.size == 4, s"expected 4 distinct packs, got $keys")
  }

  // ------------------------------------------------------------ contamination

  test("contamination scores short and empty docs 0.0 without crashing") {
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon"), // shares shingles with bench
      (1L, "one"),                            // 1 word  < shingleN
      (2L, ""),                               // empty
      (3L, "totally unrelated words entirely here")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val got = Curation.contamination(corpus, "text", "doc_id", bench, "text",
        shingleN = 3, threshold = 0.5)
      .select("doc_id", "contamination", "contaminated")
      .as[(Long, Double, Boolean)].collect()
      .map { case (k, c, f) => k -> ((c, f)) }.toMap
    assert(got.keySet == Set(0L, 1L, 2L, 3L), "every doc is scored")
    assert(got(0L) == ((1.0, true)), "full overlap scores 1.0")
    assert(got(1L) == ((0.0, false)), "1-word doc scores 0, not a crash")
    assert(got(2L) == ((0.0, false)), "empty doc scores 0, not a crash")
    assert(got(3L) == ((0.0, false)))
  }

  test("contamination computes partial overlap fractions") {
    // corpus doc: words a..f → 4 distinct 3-shingles; bench covers the
    // first 3 words → 1 shared shingle → 1/4
    val corpus = Seq((0L, "a b c d e f")).toDF("doc_id", "text")
    val bench = Seq((1L, "a b c")).toDF("doc_id", "text")
    val got = Curation.contamination(corpus, "text", "doc_id", bench, "text",
        shingleN = 3, threshold = 0.1)
      .select("n_shingles", "n_hits", "contamination")
      .as[(Int, Long, Double)].head()
    assert(got == ((4, 1L, 0.25)))
  }

  // ------------------------------------------------------------- source mix

  test("sourceMixReport: volumes, dup rates, and shares per source") {
    val df = Seq(
      (0L, "web", "a b c"), (1L, "web", "a b c"), (2L, "web", "d e"),
      (3L, "books", "f g h i")
    ).toDF("doc_id", "source", "text")
    val got = Curation.sourceMixReport(df, "source", "text")
      .as[(String, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    // web: 3 docs, 1 exact dup (two identical "a b c"), 8 tokens
    assert(got("web") == ((3L, 1L, 8L, 2.666667, 0.75)))
    assert(got("books") == ((1L, 0L, 4L, 4.0, 0.25)))
  }

  test("mixtureRates: budget shares cap at 1.0 and exclude unlisted sources") {
    val rates = Curation.mixtureRates(
      tokensBySource = Map("web" -> 1000L, "books" -> 100L, "junk" -> 500L),
      targetShares = Map("web" -> 0.5, "books" -> 0.5),
      tokenBudget = 400L)
    assert(rates("web") == 0.2)    // wants 200 of 1000
    assert(rates("books") == 1.0)  // wants 200 of 100 → capped
    assert(rates("junk") == 0.0)   // not in the mixture
  }

  // -------------------------------------------------------------- top-k tokens

  test("topKTokens orders by count desc then token asc, and caps at k") {
    val df = Seq("b a", "b a", "b c", "", "   ").toDF("text")
    val got = Curation.topKTokens(df, "text", k = 2)
      .as[(String, Long)].collect().toSeq
    // b:3, a:2, c:1 → top-2 = b,a; empty/whitespace rows contribute nothing
    assert(got == Seq(("b", 3L), ("a", 2L)))
    val tied = Seq("x", "y", "z").toDF("text")
    val t = Curation.topKTokens(tied, "text", k = 2).as[(String, Long)]
      .collect().toSeq
    assert(t == Seq(("x", 1L), ("y", 1L)), "ties break by token asc")
  }

  test("materializePacks concatenates in order with doc/token counts") {
    val staged = Seq(
      (1L, "en", "aaa bbb", 2L),
      (3L, "en", "ccc", 1L),
      (2L, "en", "ddd eee fff", 3L)).toDF("doc_id", "lang", "text", "n_tokens")
      .withColumn("pack_key", lit("en#0#0"))
    val got = Curation.materializePacks(staged, "text", "doc_id", sep = "|")
      .as[(String, Long, Long, String)].head()
    assert(got == (("en#0#0", 3L, 6L, "aaa bbb|ddd eee fff|ccc")),
      "docs join in orderCol order, not input order")
  }

  test("nearDupLeaks flags only train docs paired with test docs") {
    val split = Seq((1L, "train"), (2L, "test"), (3L, "train"),
      (4L, "train"), (5L, "test")).toDF("doc_id", "split")
    // 1-2 crosses (reversed endpoint order too: 5-4 crosses), 3-4 is
    // train-train, 2-5 is test-test — test docs never flag
    val pairs = Seq((1L, 2L), (3L, 4L), (2L, 5L), (5L, 4L))
      .toDF("id_a", "id_b")
    val got = Curation.nearDupLeaks(split, "doc_id", pairs)
      .as[(Long, String, Boolean)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> false,
      4L -> true, 5L -> false))
  }

  // ------------------------------------------------------------ takeExactN

  test("takeExactN: exact budget per stratum, deterministic, partition-stable") {
    val df = (0L until 300L).map(i =>
      (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "fr"))
      .toDF("doc_id", "lang")
    val got = Curation.takeExactN(df, "lang", "doc_id", n = 10)
      .as[(Long, String)].collect()
    assert(got.groupBy(_._2).view.mapValues(_.length).toMap ==
      Map("en" -> 10, "de" -> 10, "fr" -> 10))
    // repartitioning must not change WHICH rows are selected (the
    // two-phase pre-rank is a pure optimization)
    val again = Curation.takeExactN(df.repartition(13), "lang", "doc_id", 10)
      .as[(Long, String)].collect()
    assert(again.toSet == got.toSet)
  }

  test("takeExactN: stratum smaller than the budget returns it whole") {
    val df = Seq((1L, "en"), (2L, "en"), (3L, "xx")).toDF("doc_id", "lang")
    val got = Curation.takeExactN(df, "lang", "doc_id", n = 10)
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "en"), (2L, "en"), (3L, "xx")))
  }

  // ------------------------------------------------- leakage-guarded split

  test("leakageGuardedSplit: deterministic assignment, duplicates flagged") {
    val base = (0L until 200L).map(i => (i, s"distinct text number $i"))
    val first = Curation.leakageGuardedSplit(
        base.toDF("doc_id", "text"), "text", "doc_id", testRate = 0.2)
      .as[(Long, String, Boolean)].collect()
    assert(first.forall(!_._3), "all-distinct corpus has zero leaks")
    assert(first.count(_._2 == "test") > 0 && first.count(_._2 == "train") > 0)
    val testId = first.find(_._2 == "test").get._1
    val trainId = first.find(_._2 == "train").get._1
    // duplicate one test doc's text into a train doc → that train doc
    // (and only it) is a leak; the test doc itself is never flagged
    val leaky = base.map { case (i, t) =>
      if (i == trainId) (i, s"distinct text number $testId") else (i, t) }
    val second = Curation.leakageGuardedSplit(
        leaky.toDF("doc_id", "text"), "text", "doc_id", testRate = 0.2)
      .as[(Long, String, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(second(trainId)._3, "train dup of a test doc must flag")
    assert(!second(testId)._3, "test docs are never leaks")
    assert(second.values.count(_._3) == 1, "only the duplicated doc flags")
    // re-run is bit-identical (no RNG anywhere)
    val again = Curation.leakageGuardedSplit(
        leaky.toDF("doc_id", "text"), "text", "doc_id", testRate = 0.2)
      .as[(Long, String, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(again == second)
  }

  test("leakageGuardedSplit: NULL text hashes via sentinel, never NULL flag") {
    // many ids so both splits get a NULL-text doc with high probability;
    // a NULL-text train doc must flag against a NULL-text test doc, and
    // is_leak must be a real boolean (the NULL digest would otherwise
    // make Spark emit false where a SQL `IN` oracle emits NULL)
    val rows = (0L until 400L).map(i =>
      (i, if (i % 4 == 0) null else s"unique text $i"))
    val got = Curation.leakageGuardedSplit(
        rows.toDF("doc_id", "text"), "text", "doc_id", testRate = 0.3)
      .as[(Long, String, Boolean)].collect()
    val nullIds = rows.filter(_._2 == null).map(_._1).toSet
    val bySplit = got.filter(r => nullIds(r._1)).groupBy(_._2)
    assert(bySplit.contains("test") && bySplit.contains("train"),
      "fixture must land NULL-text docs on both sides")
    assert(bySplit("train").forall(_._3),
      "every NULL-text train doc leaks against the NULL-text test docs")
    assert(got.forall(r => nullIds(r._1) || !r._3),
      "distinct non-null texts never flag")
  }

  test("deterministicShuffle: reproducible, dense positions, partition-stable") {
    import spark.implicits._
    val df = (1L to 200L).toDF("id")
    val run1 = Curation.deterministicShuffle(df, "id", "seed1", 8)
      .as[(Long, Long, Int)].collect().sortBy(_._1)
    val run2 = Curation.deterministicShuffle(df.repartition(13), "id", "seed1", 8)
      .as[(Long, Long, Int)].collect().sortBy(_._1)
    assert(run1.sameElements(run2),
      "same seed → identical shards/positions at any input partitioning")
    assert(run1.length == 200 && run1.map(_._1).distinct.length == 200)
    assert(run1.forall(r => r._2 >= 0 && r._2 < 8))
    run1.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.sameElements(1 to rows.length),
        "positions are dense 1..n within each shard")
    }
    val run3 = Curation.deterministicShuffle(df, "id", "seed2", 8)
      .as[(Long, Long, Int)].collect().sortBy(_._1)
    assert(!run1.sameElements(run3), "different seed → different permutation")
  }

  test("weightedSample: higher weight wins at equal draw; reproducible") {
    import spark.implicits._
    val df = (1L to 500L).map(i => (i, (i % 10) + 1L)).toDF("id", "w")
    val s1 = Curation.weightedSample(df, "id", "w", n = 50)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val s2 = Curation.weightedSample(df.repartition(9), "id", "w", n = 50)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(s1.sameElements(s2), "sample independent of partitioning")
    assert(s1.length == 50)
    // weight-10 rows should be overrepresented vs weight-1 rows
    val w10 = s1.count(_._2 == 10L)
    val w1 = s1.count(_._2 == 1L)
    assert(w10 > w1, s"A-Res bias toward heavy rows: w10=$w10 w1=$w1")
    // zero/negative weights never sampled
    val withZero = (1L to 10L).map(i => (i, 0L)).toDF("id", "w")
    assert(Curation.weightedSample(withZero, "id", "w", 5).count() == 0)
  }

  test("topPByGroup: boundary row kept, coverage >= p, order exact") {
    import spark.implicits._
    // group g: scores 50, 30, 20 (total 100); p=0.5 → keep 50 and 30
    // (50 alone: cum-score 0 < 50 ✓; 30: cum-30=50 >= 50? NO → kept
    // iff cum - score < p*tot: 80-30=50 < 50 false → only 50 kept...
    val df = Seq(("g", 1L, 50L), ("g", 2L, 30L), ("g", 3L, 20L))
      .toDF("src", "id", "score")
    val got = Curation.topPByGroup(df, "src", "id", "score", 0.5)
      .as[(String, Long, Long, Long)].collect().map(_._2).toSet
    assert(got == Set(1L), "50 covers exactly p of the mass; 30 excluded")
    val got2 = Curation.topPByGroup(df, "src", "id", "score", 0.51)
      .as[(String, Long, Long, Long)].collect().map(_._2).toSet
    assert(got2 == Set(1L, 2L), "boundary-crossing row is kept")
  }

  test("temperatureMixRates: sqrt tempering upweights small sources") {
    import spark.implicits._
    // s1: 100 tokens, s2: 400 tokens → w ∝ 10, 20 → q = 1/3, 2/3.
    // budget 300: rate(s1) = min(1, 100/100) = 1.0; rate(s2) = 200/400.
    val df = Seq(
      ("s1", Array.fill(100)("t").mkString(" ")),
      ("s2", Array.fill(400)("t").mkString(" "))).toDF("source", "text")
    val got = Curation.temperatureMixRates(df, "source", "text", 300L)
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("s1") == ((100L, 1.0)))
    assert(got("s2") == ((400L, 0.5)))
    // untempered proportional sampling would give both sources the
    // SAME rate (300/500); sqrt tempering doubles s1's share density
    assert(got("s1")._2 > got("s2")._2)
  }

  test("curriculumBins ≡ brute-force rank binning (3 seeds)") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      // heavy ties: scores from a tiny domain force id tie-breaks
      val rows = (1L to 97L).map(i => (i, rnd.nextInt(6).toLong))
      val got = Curation.curriculumBins(rows.toDF("id", "s"), "s", "id",
          nBins = 7)
        .as[(Long, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
      val n = rows.length
      val want = rows.sortBy(r => (r._2, r._1)).zipWithIndex
        .map { case ((_, s), i) => (i.toLong * 7 / n, s) }
        .groupBy(_._1).map { case (bin, xs) =>
          bin -> ((xs.length.toLong, xs.map(_._2).min, xs.map(_._2).max,
            xs.map(_._2).sum))
        }
      assert(got == want, s"seed $seed")
    }
  }

  test("threeWaySplit: bucket boundaries, growth-stable assignment") {
    import spark.implicits._
    val small = (1L to 200L).map(i => Tuple1(i)).toDF("id")
    val s1 = Curation.threeWaySplit(small, "id", "t", 80, 10)
      .as[(Long, Long, String)].collect()
    s1.foreach { case (_, b, sp) =>
      val want = if (b < 80) "train" else if (b < 90) "val" else "test"
      assert(sp == want, s"bucket $b → $sp")
    }
    assert(s1.map(_._3).toSet == Set("train", "val", "test"))
    // growing the corpus must not move any existing assignment
    val grown = (1L to 400L).map(i => Tuple1(i)).toDF("id")
    val s2 = Curation.threeWaySplit(grown, "id", "t", 80, 10)
      .as[(Long, Long, String)].collect().map(r => r._1 -> r._3).toMap
    s1.foreach { case (id, _, sp) => assert(s2(id) == sp) }
  }

  test("writeShards: shard dirs, in-shard order, re-run identical") {
    import spark.implicits._
    val df = (1L to 40L).map(i => (i, s"doc$i")).toDF("id", "text")
    val d1 = java.nio.file.Files.createTempDirectory("sh1").toString
    val d2 = java.nio.file.Files.createTempDirectory("sh2").toString
    Curation.writeShards(df, "id", "s9", nShards = 4, d1)
    Curation.writeShards(df.repartition(7), "id", "s9", nShards = 4, d2)
    val r1 = spark.read.parquet(d1).select("shard", "pos", "id", "text")
      .as[(Int, Int, Long, String)].collect().sortBy(r => (r._1, r._2))
    val r2 = spark.read.parquet(d2).select("shard", "pos", "id", "text")
      .as[(Int, Int, Long, String)].collect().sortBy(r => (r._1, r._2))
    assert(r1.toSeq == r2.toSeq,
      "layout must not depend on the input partitioning")
    assert(r1.map(_._3).toSet == (1L to 40L).toSet, "no row lost or duped")
    assert(r1.map(_._1).distinct.sorted.toSeq.nonEmpty &&
      r1.map(_._1).forall(s => s >= 0 && s < 4))
    // every shard's positions are dense 1..n_shard
    r1.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1 to rows.length).toSeq)
    }
  }

  test("curriculumBins: explicit band rule, partition-invariant") {
    import spark.implicits._
    // 12 rows, scores 1..12, 10 bins: rank r → ((r−1)·10) div 12 puts
    // TWO rows in bins 0 and 5, one everywhere else
    val df = (1L to 12L).map(i => (i, i)).toDF("id", "s")
    val got = Curation.curriculumBins(df, "s", "id", nBins = 10)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(0L) == ((2L, 1L, 2L, 3L)))
    assert(got(5L) == ((2L, 7L, 8L, 15L)))
    assert(got(9L) == ((1L, 12L, 12L, 12L)))
    assert(got.values.map(_._1).sum == 12L)
    val re = Curation.curriculumBins(df.repartition(7), "s", "id", 10)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(re == got, "two-phase rank must not depend on input layout")
  }

  test("interleaveSources: closed-form pos equals the window order") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val df = (1L to 37L).map(i => (i, s"src${i % 5}")).toDF("id", "source")
    val got = Curation.interleaveSources(df, "source", "id", "t1")
    // differential: the closed-form position must equal a plain global
    // row_number over (src_rank, source)
    val want = got.withColumn("want_pos", row_number().over(
      Window.orderBy(col("src_rank"), col("source"))).cast("long"))
    assert(want.where(col("pos") =!= col("want_pos")).count() == 0)
    // positions are a dense permutation of 1..n
    val ps = got.select("pos").as[Long].collect().sorted
    assert(ps.toSeq == (1L to 37L).toSeq)
  }

  test("interleaveSources: exhausted sources drop from later rounds") {
    import spark.implicits._
    // a has 3 rows, b has 1: order must be a1 b1 a2 a3 (b absent
    // after round 1), whatever the md5 permutation picked per source
    val df = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"))
      .toDF("id", "source")
    val got = Curation.interleaveSources(df, "source", "id", "t2")
      .as[(Long, String, Long, Long)].collect().sortBy(_._4)
    assert(got.map(r => (r._2, r._3)).toSeq ==
      Seq(("a", 1L), ("b", 1L), ("a", 2L), ("a", 3L)))
  }
}
