package graft.rates

import graft.SparkSpec
import java.sql.Timestamp

class RatesSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  lazy val df = Seq(
    ("a", t("2024-01-01 00:00:05")),
    ("a", t("2024-01-01 00:00:25")),
    ("a", t("2024-01-01 00:00:45")),
    ("b", t("2024-01-01 00:01:10"))
  ).toDF("k", "ts")

  test("tumbling buckets align to epoch") {
    val got = Rates.tumbling(df, "ts", Seq("k"), 60)
      .select("k", "bucket_s", "n").as[(String, Long, Long)].collect().toSet
    val base = t("2024-01-01 00:00:00").getTime / 1000
    assert(got == Set(("a", base, 3L), ("b", base + 60, 1L)))
  }

  test("sliding 60/30 puts each event in two buckets") {
    val got = Rates.sliding(df, "ts", Seq("k"), 60, 30)
      .select("k", "bucket_s", "n").as[(String, Long, Long)].collect().toSet
    val base = t("2024-01-01 00:00:00").getTime / 1000
    assert(got == Set(
      ("a", base - 30, 2L), // 00:00:05, 00:00:25
      ("a", base, 3L),      // all three
      ("a", base + 30, 1L), // 00:00:45
      ("b", base + 30, 1L), // 00:01:10 ∈ [00:00:30, 00:01:30)
      ("b", base + 60, 1L)))
  }

  test("avg and limit trigger") {
    val rates = Rates.tumbling(df, "ts", Seq("k"), 60)
    val avg = Rates.withAvg(rates, 60)
      .where($"k" === "a").select("avg_per_sec").as[Double].head()
    assert(avg == 0.05) // 3/60
    assert(Rates.overLimit(rates, 2).select("k").as[String].collect().toSeq == Seq("a"))
  }
}
