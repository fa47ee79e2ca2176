package graft.pipeline

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("bm25: hand-computed scores, saturation, and ranking") {
    // N=3, avgdl=8/3; df(spark)=2 → idf=(3-2+0.5)/(2+0.5)=0.6
    // d1 tf=1 dl=2: denom=1+1.2*(0.25+0.75*2/(8/3))=1.975
    //   score=0.6*2.2/1.975=0.6683544…  → 668354
    // d2 tf=2 dl=3: denom=2+1.2*(0.25+0.75*3/(8/3))=3.3125
    //   score=0.6*4.4/3.3125=0.7969811… → 796981
    val df = Seq((1L, "spark fast"), (2L, "spark spark slow"),
      (3L, "other words here")).toDF("doc_id", "text")
    val got = Retrieval.bm25TopK(df, "text", "doc_id", Seq("spark"), k = 10)
      .as[(Long, Long, Long, Int)].collect().sortBy(_._4)
    assert(got.map(_._1).toSeq == Seq(2L, 1L), "tf=2 doc ranks first")
    assert(got.map(_._3).toSeq == Seq(796981L, 668354L))
    assert(got.forall(_._2 == 1), "one distinct query term matched")
    assert(got.map(_._4).toSeq == Seq(1, 2))
  }

  test("bm25: non-matching docs are not candidates; ties break on id") {
    val df = Seq((5L, "spark"), (2L, "spark"), (9L, "none")).toDF("doc_id", "text")
    val got = Retrieval.bm25TopK(df, "text", "doc_id", Seq("spark"), k = 10)
      .as[(Long, Long, Long, Int)].collect().sortBy(_._4)
    assert(got.map(_._1).toSeq == Seq(2L, 5L), "equal score → id ascending")
    assert(got(0)._3 == got(1)._3)
  }

  test("bm25: multi-term scores sum exactly; k truncates") {
    val df = Seq((1L, "alpha beta"), (2L, "alpha"), (3L, "beta"),
      (4L, "alpha beta gamma")).toDF("doc_id", "text")
    val got = Retrieval.bm25TopK(df, "text", "doc_id",
      Seq("alpha", "beta"), k = 2)
      .as[(Long, Long, Long, Int)].collect()
    assert(got.length == 2)
    assert(got.forall(_._2 == 2), "both terms matched by top docs")
  }

  test("bm25: randomized differential vs single-threaded reference") {
    def micro(x: Double): Long =
      java.math.BigDecimal.valueOf(x * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    def reference(docs: Seq[(Long, String)], terms: Seq[String], k: Int,
        k1: Double, b: Double): Seq[(Long, Long, Long, Int)] = {
      val toks = docs.map { case (id, t) =>
        id -> t.trim.split("\\s+").toSeq.filter(_.nonEmpty)
      }
      val n = docs.size.toLong
      val avgdl = toks.map(_._2.size.toLong).sum.toDouble / n
      val dfT = terms.map(t =>
        t -> toks.count(_._2.contains(t)).toLong).toMap
      val perDoc = toks.flatMap { case (id, ws) =>
        val dl = ws.size.toLong
        val matched = terms.filter(ws.contains)
        if (matched.isEmpty) None
        else {
          val total = matched.map { t =>
            val tf = ws.count(_ == t).toLong
            val idf = (n - dfT(t) + 0.5) / (dfT(t) + 0.5)
            micro(idf * (tf * (k1 + 1.0)) /
              (tf + k1 * (1.0 - b + b * dl / avgdl)))
          }.sum
          Some((id, matched.size.toLong, total))
        }
      }
      perDoc.sortBy { case (id, _, s) => (-s, id) }.take(k)
        .zipWithIndex.map { case ((id, nt, s), i) => (id, nt, s, i + 1) }
    }
    val vocab = Vector("w1", "w2", "w3", "w4", "w5", "w6")
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(100 + seed)
      val docs = (1L to 25L).map(i => (i,
        Seq.fill(1 + rnd.nextInt(15))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" ")))
      val terms = Seq("w1", "w3")
      val want = reference(docs, terms, 10, 1.2, 0.75)
      val got = Retrieval.bm25TopK(docs.toDF("doc_id", "text"), "text",
          "doc_id", terms, k = 10)
        .as[(Long, Long, Long, Int)].collect().sortBy(_._4).toSeq
      assert(got == want, s"differential mismatch at seed=$seed")
    }
  }

  test("ndcgAtK: hand-computed DCG/IDCG; ideal draws from the corpus") {
    def micros(gain: Long, pos: Int): Long =
      BigDecimal.valueOf(
        gain.toDouble / (math.log(pos + 1.0) / math.log(2.0)) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    // retrieved: positions 1..3 with rels (3, 0, 1)
    val ranked = Seq((10L, 1, 3), (20L, 2, 0), (30L, 3, 1))
      .toDF("id", "rank", "rel")
    // corpus holds a better list than retrieved: rels (3, 3, 1, 0)
    val corpus = Seq((10L, 3), (11L, 3), (30L, 1), (20L, 0))
      .toDF("doc_id", "rel")
    val got = Retrieval.ndcgAtK(ranked, "rank", "rel", corpus, "doc_id",
        k = 3).as[(Long, Long, Long, Double)].collect().head
    val dcg = micros(7, 1) + micros(0, 2) + micros(1, 3)
    val idcg = micros(7, 1) + micros(7, 2) + micros(1, 3)
    assert(got._1 == 3L && got._2 == dcg && got._3 == idcg)
    val ndcg = BigDecimal.valueOf(dcg.toDouble / idcg.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got._4 == ndcg)
    assert(got._4 < 1.0, "retrieved list is worse than the corpus ideal")
  }

  test("rrfFusion: hand-computed micros, doc in both lists wins") {
    // 1e6/61 → 16393, 1e6/62 → 16129 (HALF_UP)
    val a = Seq((1L, 1), (2L, 2)).toDF("doc_id", "rank")
    val b = Seq((2L, 1), (3L, 2)).toDF("doc_id", "rank")
    val got = Retrieval.rrfFusion(Seq(a, b), "doc_id", "rank", k = 3)
      .as[(Long, Long, Long, Int)].collect().sortBy(_._4)
    assert(got.toSeq == Seq(
      (2L, 2L, 16393L + 16129L, 1),
      (1L, 1L, 16393L, 2),
      (3L, 1L, 16129L, 3)))
  }

  test("ndcgAtK: perfect retrieval scores exactly 1.0") {
    val corpus = Seq((1L, 2), (2L, 1), (3L, 0)).toDF("doc_id", "rel")
    val ranked = Seq((1L, 1, 2), (2L, 2, 1), (3L, 3, 0))
      .toDF("id", "rank", "rel")
    val got = Retrieval.ndcgAtK(ranked, "rank", "rel", corpus, "doc_id",
        k = 3).as[(Long, Long, Long, Double)].collect().head
    assert(got._2 == got._3 && got._4 == 1.0)
  }
}
