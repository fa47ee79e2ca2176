package graft.pipeline

import graft.SparkSpec

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
}
