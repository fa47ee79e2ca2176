package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  test("repetitionFeatures: ratios for repeated, diverse, and tiny docs") {
    val df = Seq(
      (0L, "a a a a"),            // 1 distinct / 4; max word 4/4; bigram "a a" 3/3
      (1L, "w x y z"),            // all distinct; every bigram unique
      (2L, "one"),                // single word: no bigrams → ratio 0.0
      (3L, "go go stop go stop")  // go:3/5, distinct 2/5, "go stop" 2/4
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionFeatures(df, "text", "doc_id")
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(0L) == ((4L, 0.25, 1.0, 1.0)))
    assert(got(1L) == ((4L, 1.0, 0.25, 0.333333)))
    assert(got(2L) == ((1L, 1.0, 1.0, 0.0)), "1-word doc: bigram ratio 0, no crash")
    assert(got(3L) == ((5L, 0.4, 0.6, 0.5)))
  }

  test("tfidfKeywords ranks doc-distinctive tokens above ubiquitous ones") {
    val df = Seq(
      (0L, "spark spark catalyst common"),
      (1L, "duck duck oracle common"),
      (2L, "plain text here common")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfKeywords(df, "text", "doc_id", k = 2)
      .select("doc_id", "token", "rank")
      .as[(Long, String, Int)].collect()
      .groupBy(_._1).map { case (k, v) =>
        k -> v.sortBy(_._3).map(_._2).toSeq }
    // "common" appears in every doc (df=3) → never the top keyword;
    // doubled distinctive tokens win rank 1
    assert(got(0L).head == "spark" && !got(0L).contains("common"))
    assert(got(1L).head == "duck")
    // ties (all tf=1, df=1) break alphabetically
    assert(got(2L) == Seq("here", "plain"))
  }

  test("chunkByTokens: overlapping windows cover every token") {
    val df = Seq((0L, (1 to 10).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = TextAnalysis.chunkByTokens(df, "text", "doc_id",
        chunkTokens = 4, overlap = 1)
      .select("chunk_idx", "start", "n_chunk_tokens", "chunk_text")
      .as[(Int, Int, Int, String)].collect().sortBy(_._1).toSeq
    // step 3: starts 0,3,6,9 → chunks of 4,4,4,1 tokens
    assert(got.map(_._2) == Seq(0, 3, 6, 9))
    assert(got.map(_._3) == Seq(4, 4, 4, 1))
    assert(got.head._4 == "w1 w2 w3 w4")
    assert(got(1)._4 == "w4 w5 w6 w7", "overlap repeats the boundary token")
    assert(got.last._4 == "w10")
    // single-word and empty docs chunk without crashing
    val tiny = TextAnalysis.chunkByTokens(
      Seq((1L, "one"), (2L, "")).toDF("doc_id", "text"),
      "text", "doc_id", chunkTokens = 4, overlap = 1)
    assert(tiny.count() == 2)
  }

  test("gopherFilter: flags fire on the right rule and compose into keep") {
    val longDiverse = (1 to 60).map(i => s"tok$i").mkString(" ")
    val longRepetitive = (1 to 60).map(_ => "same").mkString(" ")
    val shortDiverse = (1 to 10).map(i => s"u$i").mkString(" ")
    val df = Seq(
      (0L, longDiverse),       // keeps
      (1L, shortDiverse),      // too short, nothing else fires
      (2L, longRepetitive)     // short? no (60 words) — but repetitive
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherFilter(df, "text", "doc_id")
      .select("doc_id", "keep", "flag_too_short", "flag_repetitive_word",
        "flag_low_diversity")
      .as[(Long, Boolean, Boolean, Boolean, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(0L) == ((true, false, false, false)))
    assert(got(1L) == ((false, true, false, false)))
    assert(got(2L)._1 == false && got(2L)._3 && got(2L)._4,
      "all-same doc trips word-repetition and diversity flags")
  }
}

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token and subword counts") {
    val df = Seq("the cat, sat!  on 42 mats").toDF("t")
    val (n, s) = df.select(
      TextAnalysis.tokenCount(col("t")),
      TextAnalysis.subwordCount(col("t"))).as[(Int, Int)].head()
    assert(n == 6)
    // the|cat|,|sat|!|on|42|mats
    assert(s == 8)
  }

  test("langId picks the dominant stopword language") {
    val df = Seq(
      ("the cat is in the house and it is big", "en"),
      ("der hund ist nicht mit der katze auf dem sofa", "de"),
      ("le chat est pour la maison et les oiseaux", "fr"),
      ("zzz qqq www", "und")
    ).toDF("t", "expected")
    val got = df.select(col("expected"), TextAnalysis.langId(col("t")))
      .as[(String, String)].collect()
    got.foreach { case (exp, act) => assert(act == exp, s"expected $exp got $act") }
  }

  test("fingerprint is invariant under word order and duplication") {
    val df = Seq(("b a c a b", "a b c", "a b d")).toDF("x", "y", "z")
    val (fx, fy, fz) = df.select(
      TextAnalysis.fingerprint(col("x")),
      TextAnalysis.fingerprint(col("y")),
      TextAnalysis.fingerprint(col("z"))).as[(String, String, String)].head()
    assert(fx == fy && fx != fz)
  }

  test("oovRate: per-doc coverage vs vocab; zero-token doc scores 0.0") {
    val docs = Seq(
      (1L, "the cat sat"),         // all in vocab
      (2L, "the zyx sat qqq"),     // 2 of 4 OOV
      (3L, "   "),                 // zero tokens
      (4L, "zzz")).toDF("doc_id", "text")
    val vocab = Seq("the", "cat", "sat").toDF("token")
    val got = TextAnalysis.oovRate(docs, "text", "doc_id", vocab)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((3L, 0L, 0.0)))
    assert(got(2L) == ((4L, 2L, 0.5)))
    assert(got(3L) == ((0L, 0L, 0.0)), "empty doc: no tokens, rate 0")
    assert(got(4L) == ((1L, 1L, 1.0)))
    assert(got.size == 4, "every input doc appears, tokens or not")
  }

  test("quality features are computed and bounded") {
    val df = Seq((1L, "the quick, brown fox!")).toDF("doc_id", "text")
    val row = TextAnalysis.qualityFeatures(df, "text")
      .select("n_tokens", "punct_ratio", "alpha_ratio", "stopword_ratio_en")
      .as[(Int, Double, Double, Double)].head()
    assert(row._1 == 4)
    assert(row._2 > 0 && row._2 < 0.2)
    assert(row._3 > 0.7 && row._3 < 1.0)
    assert(row._4 == 0.25) // "the" of 4 tokens
  }

  test("collocations: pmi ratio from exact counts, minCount gates") {
    import spark.implicits._
    // "new york" ×3 adjacent; "of the" ×2; singles elsewhere.
    val df = Seq(
      (1L, "new york new york new york of the"),
      (2L, "of the city of new haven")).toDF("doc_id", "text")
    val got = TextAnalysis.collocations(df, "text", "doc_id", minCount = 2L)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // tokens: doc1 = 8, doc2 = 6 → N_tokens=14; bigrams within docs.
    // c(new york)=3, c(new)=4, c(york)=3 → ratio = 3*14/(4*3) = 3.5
    assert(got(("new", "york")) == ((3L, 3.5)))
    // c(of the)=2, c(of)=3, c(the)=2 → 2*14/6 = 4.666667
    assert(got(("of", "the")) == ((2L, 4.666667)))
    // (york,new) bridges repeats: c=2, ratio = 2*14/(3*4) = 2.333333
    assert(got(("york", "new")) == ((2L, 2.333333)))
    assert(!got.contains(("the", "city")), "count-1 pairs gated out")
  }

  test("tokenEntropy: uniform > skewed > single-token; exact micros") {
    import spark.implicits._
    def micros(ps: Seq[Double]): Long =
      -ps.map(p => BigDecimal.valueOf(p * math.log(p) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).sum
    val df = Seq(
      (1L, "a b c d"),          // uniform: 4 × p=1/4
      (2L, "a a a b"),          // skewed: 3/4, 1/4
      (3L, "a a a a"),          // degenerate: entropy 0
      (4L, "   ")               // whitespace only: no tokens, drops out
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tokenEntropy(df, "text", "doc_id")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((4L, 4L, micros(Seq.fill(4)(0.25)))))
    assert(got(2L) == ((4L, 2L, micros(Seq(0.75, 0.25)))))
    assert(got(3L) == ((4L, 1L, 0L)))
    assert(!got.contains(4L))
    assert(got(1L)._3 > got(2L)._3 && got(2L)._3 > got(3L)._3)
  }

  test("zipfSlope: exact ideal-Zipf corpus fits slope −1") {
    import spark.implicits._
    // freqs 12, 6, 4, 3 at ranks 1..4 = 12/r exactly → slope −1.
    // Build the corpus literally: 12 a's, 6 b's, 4 c's, 3 d's.
    val text = (Seq.fill(12)("a") ++ Seq.fill(6)("b") ++
      Seq.fill(4)("c") ++ Seq.fill(3)("d")).mkString(" ")
    val got = TextAnalysis.zipfSlope(Seq(Tuple1(text)).toDF("text"),
        "text", topK = 4)
      .as[(Long, Double)].collect().head
    assert(got._1 == 4L)
    assert(math.abs(got._2 + 1.0) < 1e-4,
      s"ideal 12/r corpus must fit ≈ −1, got ${got._2}")
  }

  test("textRank: hub word of a star co-occurrence graph ranks first") {
    import spark.implicits._
    // "hub x hub y hub z" ×5: hub co-occurs with everything, the
    // leaves only with hub → hub must out-rank every leaf
    val df = (1 to 5).map(i => (i.toLong, "hub x hub y hub z"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.textRank(df, "text", minPairCount = 5L, k = 2)
      .as[(String, Long, Int)].collect().sortBy(_._3)
    assert(got.head._1 == "hub" && got.head._3 == 1, s"got ${got.toSeq}")
    assert(got.length == 2, "k truncates")
    assert(got(1)._2 < got.head._2, "leaves carry strictly less rank")
  }

  test("rakeKeyphrases: stopword-split runs, degree/freq, tie on text") {
    import spark.implicits._
    // phrases: "deep learning" ×2 (docs 1, 2), "deep nets" ×1
    // freq: deep 3, learning 2, nets 1; degree: deep 6, learning 4,
    // nets 2 → every word scores 2.0 → both phrases score 4_000_000
    val df = Seq(
      (1L, "deep learning of deep nets"),
      (2L, "Deep Learning")).toDF("doc_id", "text")
    val got = TextAnalysis.rakeKeyphrases(df, "text", "doc_id", "en", 10)
      .as[(String, Long, Long, Long, Int)].collect().sortBy(_._5)
    assert(got.toSeq == Seq(
      ("deep learning", 2L, 2L, 4000000L, 1),
      ("deep nets", 2L, 1L, 4000000L, 2)), s"got ${got.toSeq}")
  }

  test("sourceVocabOverlap: exact Jaccard by inclusion-exclusion") {
    import spark.implicits._
    val df = Seq(
      ("s1", "a b c"), ("s1", "c d"),      // V(s1) = {a,b,c,d}
      ("s2", "c d e"),                     // V(s2) = {c,d,e}
      ("s3", "x y")                        // V(s3) = {x,y} (disjoint)
    ).toDF("source", "text")
    val got = TextAnalysis.sourceVocabOverlap(df, "source", "text")
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    // s1 ∩ s2 = {c,d} → 2 / (4+3−2) = 0.4
    assert(got(("s1", "s2")) == ((4L, 3L, 2L, 0.4)))
    assert(!got.contains(("s1", "s3")) && !got.contains(("s2", "s3")),
      "disjoint pairs produce no row (no zero-intersection padding)")
    assert(!got.contains(("s2", "s1")), "pairs are ordered source_a < source_b")
  }
}
