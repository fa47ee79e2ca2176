package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

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
}
