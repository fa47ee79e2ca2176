package graft.pipeline

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("quantiles: exact interpolated percentiles per stratum") {
    // stratum a: values 10,20,30,40 → p50 = 25 (midpoint), p100-ish
    // boundaries checked via 0.0/1.0
    val df = Seq(("a", 10L), ("a", 20L), ("a", 30L), ("a", 40L),
      ("b", 5L)).toDF("k", "v")
    val got = Profile.quantiles(df, "k", "v", Seq(0.0, 0.5, 1.0))
      .as[(String, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got(("a", 0.0)) == 10.0)
    assert(got(("a", 0.5)) == 25.0, "linear interpolation between 20 and 30")
    assert(got(("a", 1.0)) == 40.0)
    assert(got(("b", 0.5)) == 5.0, "single-value stratum: every p is it")
  }

  test("histogram: integral-div buckets, NULLs excluded, lo is inclusive") {
    val df = Seq(("a", Some(0L)), ("a", Some(199L)), ("a", Some(200L)),
      ("a", Some(399L)), ("a", Some(400L)), ("b", Some(250L)),
      ("a", Option.empty[Long])).toDF("k", "v")
    val got = Profile.histogram(df, "k", "v", 200L)
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("a", 0L, 2L), ("a", 200L, 2L), ("a", 400L, 1L),
      ("b", 200L, 1L)))
  }

  test("correlation: exact-sum Pearson r, NULLs excluded") {
    val df = Seq(
      ("lin", Some(1.0), Some(2.0)), ("lin", Some(2.0), Some(4.0)),
      ("lin", Some(3.0), Some(6.0)),
      ("anti", Some(1.0), Some(3.0)), ("anti", Some(2.0), Some(2.0)),
      ("anti", Some(3.0), Some(1.0)),
      // Pearson((1,2,3),(1,3,2)) = 0.5 by hand
      ("half", Some(1.0), Some(1.0)), ("half", Some(2.0), Some(3.0)),
      ("half", Some(3.0), Some(2.0)),
      ("half", Option.empty[Double], Some(9.0))
    ).toDF("k", "x", "y")
    val got = Profile.correlation(df, "k", "x", "y")
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("lin") == ((3L, 1.0)))
    assert(got("anti") == ((3L, -1.0)))
    assert(got("half") == ((3L, 0.5)), "NULL x row drops from n and sums")
  }
}
