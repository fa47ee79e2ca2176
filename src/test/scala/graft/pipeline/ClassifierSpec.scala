package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  // train: A="x x", B="y" → V=2, tok_A=2, tok_B=1, priors ln(1/2) each.
  // prior_micro = round(ln(0.5)·1e6) = -693147
  // logp(x|A) = ln(3/4) → -287682 ; logp(x|B) = ln(1/3) → -1098612
  // oov_A = ln(1/4) → -1386294 ; oov_B = ln(1/3) → -1098612
  private def trainDf = Seq(("x x", "A"), ("y", "B")).toDF("text", "label")

  test("naive bayes: hand-computed posteriors pick the right class") {
    val test = Seq((1L, "x")).toDF("doc_id", "text")
    val got = Classifier.naiveBayes(trainDf, test, "text", "doc_id", "label")
      .as[(Long, String, Long)].collect().head
    assert(got == ((1L, "A", -693147L - 287682L)))
  }

  test("naive bayes: OOV token scores the smoothed floor per class") {
    // "q" unseen anywhere: A gets prior+oov_A=-2079441, B=-1791759 → B
    val test = Seq((1L, "q")).toDF("doc_id", "text")
    val got = Classifier.naiveBayes(trainDf, test, "text", "doc_id", "label")
      .as[(Long, String, Long)].collect().head
    assert(got == ((1L, "B", -693147L - 1098612L)))
  }

  test("naive bayes: zero-token doc classifies by prior, tie → label asc") {
    val test = Seq((7L, "")).toDF("doc_id", "text")
    val got = Classifier.naiveBayes(trainDf, test, "text", "doc_id", "label")
      .as[(Long, String, Long)].collect().head
    assert(got == ((7L, "A", -693147L)), "equal priors tie-break on label")
  }

  test("naive bayes: token frequency multiplies the log-prob exactly") {
    val test = Seq((1L, "x x x")).toDF("doc_id", "text")
    val got = Classifier.naiveBayes(trainDf, test, "text", "doc_id", "label")
      .as[(Long, String, Long)].collect().head
    assert(got._3 == -693147L - 3 * 287682L)
  }

  test("naive bayes: randomized differential vs single-threaded reference") {
    // Deterministic-seed random corpora; the reference implementation
    // mirrors the operator's integer-ized arithmetic exactly (HALF_UP
    // micros via BigDecimal — math.round would differ on negative .5).
    def micro(x: Double): Long =
      java.math.BigDecimal.valueOf(x * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    def toks(t: String): Seq[String] =
      t.trim.split("\\s+").toSeq.filter(_.nonEmpty)
    def referenceNb(train: Seq[(String, String)], test: Seq[(Long, String)])
        : Map[Long, (String, Long)] = {
      val trainToks = train.flatMap { case (t, l) => toks(t).map((l, _)) }
      val ct = trainToks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val tot = trainToks.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val v = trainToks.map(_._2).distinct.size.toLong
      val nd = train.size.toLong
      val ndc = train.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val labels = ndc.keys.toSeq.sorted
      test.map { case (id, t) =>
        val scores = labels.map { c =>
          val prior = micro(math.log(ndc(c).toDouble / nd))
          val tokSum = toks(t).groupBy(identity).map { case (w, ws) =>
            val lp = ct.get((c, w))
              .map(cnt => micro(math.log((cnt + 1.0) / (tot(c) + v))))
              .getOrElse(micro(math.log(1.0 / (tot(c) + v))))
            ws.size.toLong * lp
          }.sum
          c -> (prior + tokSum)
        }
        val best = scores.maxBy { case (c, s) => (s, c) }(
          Ordering.Tuple2(Ordering.Long, Ordering.String.reverse))
        id -> best
      }.toMap
    }
    val alphabet = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    val labels = Vector("L1", "L2", "L3")
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      def text(max: Int) =
        Seq.fill(rnd.nextInt(max))(alphabet(rnd.nextInt(alphabet.size)))
          .mkString(" ")
      val train = Seq.fill(30)((text(12), labels(rnd.nextInt(labels.size))))
      val test = (1L to 20L).map(i => (i, text(8)))
      val want = referenceNb(train, test)
      val got = Classifier.naiveBayes(
        train.toDF("text", "label"), test.toDF("doc_id", "text"),
        "text", "doc_id", "label")
        .as[(Long, String, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == want, s"differential mismatch at seed=$seed")
    }
  }

  test("linearProbe: separable data converges; training is partition-stable") {
    val rnd = new scala.util.Random(11)
    // positives cluster at +1 on dim 0, negatives at -1; dims 1-3 noise
    def pt(sign: Double) = Seq(sign + rnd.nextGaussian() * 0.2,
      rnd.nextGaussian(), rnd.nextGaussian(), rnd.nextGaussian())
    val rows = (0L until 80L).map { i =>
      val pos = i % 2 == 0
      (i, pt(if (pos) 1.0 else -1.0), if (pos) "p" else "n")
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val got = Classifier.linearProbe(df, df, "embedding", "vec_id",
        positive = col("label") === "p", dim = 4, iters = 40, lr = 2.0)
      .as[(Long, Double, Long, Boolean)].collect()
    val acc = got.count(r => (r._2 == 1.0) == r._4).toDouble / got.length
    assert(acc >= 0.95, s"separable toy data should classify: acc=$acc")
    val again = Classifier.linearProbe(df.repartition(7), df, "embedding",
        "vec_id", positive = col("label") === "p", dim = 4,
        iters = 40, lr = 2.0)
      .as[(Long, Double, Long, Boolean)].collect()
    assert(got.sortBy(_._1).sameElements(again.sortBy(_._1)),
      "integer-ized gradient sums make training partition-independent")
  }
}
