package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  test("charNgrams: sliding windows; below-n text yields empty, not garbage") {
    val got = Seq(("abcd", "ab", "")).toDF("a", "b", "c")
      .select(NgramLm.charNgrams(col("a"), 3).as("x"),
        NgramLm.charNgrams(col("b"), 3).as("y"),
        NgramLm.charNgrams(col("c"), 3).as("z"))
      .as[(Seq[String], Seq[String], Seq[String])].head()
    assert(got._1 == Seq("abc", "bcd"))
    assert(got._2 == Nil, "2-char text has no trigram window")
    assert(got._3 == Nil)
  }

  test("train: hand-checked counts on a two-doc corpus") {
    val df = Seq((1L, "aaaa"), (2L, "aaab")).toDF("doc_id", "text")
    val tri = NgramLm.train(df, "text", 3)
      .as[(String, Long)].collect().toMap
    assert(tri == Map("aaa" -> 3L, "aab" -> 1L))
    val bi = NgramLm.train(df, "text", 2)
      .as[(String, Long)].collect().toMap
    assert(bi == Map("aa" -> 5L, "ab" -> 1L))
  }

  test("scoreDocs: exact smoothed log-prob on the tiny corpus") {
    val df = Seq((1L, "aaaa"), (2L, "aaab")).toDF("doc_id", "text")
    val got = NgramLm.scoreDocs(df, "text", "doc_id",
        vocabSize = 64, rareMax = 2)
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // doc 1: positions aaa|aa ×2 → ln((3+1)/(5+64)) each
    val p1 = math.log(4.0 / 69.0)
    assert(got(1L)._2 == 2L)
    assert(math.abs(got(1L)._3 - BigDecimal(p1)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(got(1L)._4 == 0.0, "aaa count 3 > rareMax 2")
    // doc 2: aaa|aa and aab|aa → mean of ln(4/69), ln(2/69); aab is rare
    val p2 = (math.log(4.0 / 69.0) + math.log(2.0 / 69.0)) / 2.0
    assert(math.abs(got(2L)._3 - BigDecimal(p2)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(got(2L)._4 == 0.5, "one of two positions is rare")
  }

  test("gibberish scores below in-distribution text; rare_frac saturates") {
    val common = (0 until 20).map(i => (i.toLong, "the quick brown fox jumps"))
    val df = (common :+ (99L, "zq#7!xv@kp~wm")).toDF("doc_id", "text")
    val got = NgramLm.scoreDocs(df, "text", "doc_id")
      .select("doc_id", "avg_logprob", "rare_frac")
      .as[(Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(99L)._2 < got(0L)._2,
      "out-of-distribution trigrams must score lower")
    assert(got(99L)._3 == 1.0, "every gibberish trigram is rare")
    assert(got(0L)._3 == 0.0, "every common trigram count is 20 > rareMax")
  }
}
