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

  test("expectations: one scan, NULL predicate counts as violation") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (Some(5.0), "ok"), (Some(-1.0), "ok"), (None, "Bad"),
      (Some(2.0), "ok")).toDF("v", "s")
    val got = Profile.expectations(df, Seq(
        Profile.Expectation("v", "not_null", col("v").isNotNull),
        Profile.Expectation("v", "non_negative", col("v") >= 0.0),
        Profile.Expectation("s", "lowercase", col("s").rlike("^[a-z]+$"))))
      .as[(String, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got(("v", "not_null")) == ((4L, 1L, 0.25)))
    // -1 violates; the NULL row's predicate is NULL → violation too
    assert(got(("v", "non_negative")) == ((4L, 2L, 0.5)))
    assert(got(("s", "lowercase")) == ((4L, 1L, 0.25)))
  }

  test("psiDrift: identical distributions → psi 0; disjoint → drifted") {
    import org.apache.spark.sql.functions._
    // same: baseline and current identical per bin → every term ln(1)=0
    val same = (1 to 50).flatMap(i =>
      Seq(("k", i.toLong % 5 * 10, true), ("k", i.toLong % 5 * 10, false)))
      .toDF("g", "v", "isb")
    val gotSame = Profile.psiDrift(same, "g", "v", col("isb"), 10L)
      .as[(String, Long, Long, Long, Boolean)].collect().head
    assert(gotSame == (("k", 50L, 50L, 0L, false)))
    // disjoint bins: baseline all in bin 0, current all in bin 9
    val far = ((1 to 40).map(_ => ("k", 1L, true)) ++
      (1 to 40).map(_ => ("k", 99L, false))).toDF("g", "v", "isb")
    val gotFar = Profile.psiDrift(far, "g", "v", col("isb"), 10L)
      .as[(String, Long, Long, Long, Boolean)].collect().head
    // p=(41/42, 1/42) vs q=(1/42, 41/42): psi = 2·(40/42)·ln(41) ≈ 7.07
    assert(gotFar._4 > 200000L && gotFar._5, s"expected drift: $gotFar")
  }

  test("psiDrift: negative values bin by floor division (DuckDB `//`)") {
    import org.apache.spark.sql.functions._
    // trunc-div would fold -3 into bin 0 with the +2s (psi 0); floor-div
    // puts baseline in bin -1, current in bin 0 → disjoint → drifted
    val df = ((1 to 40).map(_ => ("k", -3L, true)) ++
      (1 to 40).map(_ => ("k", 2L, false))).toDF("g", "v", "isb")
    val got = Profile.psiDrift(df, "g", "v", col("isb"), 5L)
      .as[(String, Long, Long, Long, Boolean)].collect().head
    assert(got._4 > 200000L && got._5,
      s"negative baseline must floor into its own bin: $got")
    // identical ± distributions still cancel exactly
    val same = Seq(("k", -7L, true), ("k", -7L, false),
      ("k", 3L, true), ("k", 3L, false)).toDF("g", "v", "isb")
    val psi0 = Profile.psiDrift(same, "g", "v", col("isb"), 5L)
      .as[(String, Long, Long, Long, Boolean)].collect().head
    assert(psi0._4 == 0L && !psi0._5, s"got $psi0")
  }

  test("giniConcentration: even → 0, fully concentrated → (n−1)/n") {
    val even = (1L to 40L).map(i => Tuple1(i % 4)).toDF("k")
    val g0 = Profile.giniConcentration(even, "k")
      .as[(Long, Long, Double)].collect().head
    assert(g0 == ((4L, 40L, 0.0)), s"got $g0")
    // one key owns everything except 3 singletons: G near (n−1)/n·…
    // hand-computed: counts sorted [1,1,1,37], ranks 1..4 →
    // S = 1+2+3+4·37 = 154; G = 2·154/(4·40) − 5/4 = 1.925 − 1.25
    val skew = (Seq.fill(37)(0L) ++ Seq(1L, 2L, 3L)).map(Tuple1(_))
      .toDF("k")
    val g1 = Profile.giniConcentration(skew, "k")
      .as[(Long, Long, Double)].collect().head
    assert(g1 == ((4L, 40L, 0.675)), s"got $g1")
  }

  test("quantilesApprox: rank error within the sketch bound on skew") {
    import org.apache.spark.sql.functions._
    // heavily skewed: 9000 small values + a 1000-long heavy tail
    val vals = (1 to 9000).map(_.toLong % 100) ++
      (1 to 1000).map(i => 10000L + i)
    val df = vals.map(("k", _)).toDF("g", "v")
    val sorted = vals.sorted
    val got = Profile.quantilesApprox(df, "g", "v", Seq(0.5, 0.9, 0.99),
        accuracy = 1000)
      .as[(String, Double, Double)].collect()
      .map(r => r._2 -> r._3).toMap
    // contract: the returned value's RANK is within n/accuracy = 10
    // ranks of the requested percentile's rank
    for ((p, q) <- got) {
      val lo = sorted(((p * sorted.length).toInt - 15).max(0))
      val hi = sorted(((p * sorted.length).toInt + 15).min(sorted.length - 1))
      assert(q >= lo && q <= hi, s"p=$p q=$q outside [$lo,$hi]")
    }
    // exact distinct vs sketch distinct: approx_count_distinct error
    // is bounded ~2.3% at default rsd=0.05's tighter setting
    val exact = df.agg(countDistinct(col("v"))).as[Long].head()
    val approx = df.agg(approx_count_distinct(col("v"), 0.02))
      .as[Long].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx $approx vs exact $exact")
  }

  test("chiSquare: perfectly independent table scores exactly 0") {
    // counts proportional across rows → O == E for every cell
    val df = (Seq.fill(4)(("en", "s1")) ++ Seq.fill(2)(("en", "s2")) ++
      Seq.fill(8)(("de", "s1")) ++ Seq.fill(4)(("de", "s2")))
      .toDF("a", "b")
    val got = Profile.chiSquare(df, "a", "b")
      .as[(Long, Long, Long)].collect().head
    assert(got == ((4L, 1L, 0L)), s"got $got")
  }

  test("chiSquare: hand-computed 2×2 dependence includes zero cells") {
    // O = [[10, 0], [0, 10]]: E = 5 in every cell (including the two
    // UNOBSERVED ones, rebuilt by the grid cross join) → χ² =
    // 4 · (10−5)²/5 = 20 → 20_000_000 micros; dof = (2−1)(2−1)
    val df = (Seq.fill(10)(("x", "p")) ++ Seq.fill(10)(("y", "q")))
      .toDF("a", "b")
    val got = Profile.chiSquare(df, "a", "b")
      .as[(Long, Long, Long)].collect().head
    assert(got == ((4L, 1L, 20000000L)), s"got $got")
  }

  test("outliersMad: rank-based median/MAD, only flagged rows emit") {
    // values 1..9 + 100: lower median (rank 5 of 10) = 5;
    // |x−5| sorted = 0,1,1,2,2,3,3,4,4,95 → MAD (rank 5) = 2;
    // threshold 3·2 = 6 flags only the 100
    val df = ((1 to 9).map(i => (i.toLong, "k", Some(i.toDouble))) :+
      ((100L, "k", Some(100.0))) :+ ((101L, "k", Option.empty[Double])))
      .toDF("id", "g", "v")
    val got = Profile.outliersMad(df, "g", "v", "id", k = 3)
      .as[(Long, String, Double, Double, Double)].collect()
    assert(got.toSeq == Seq((100L, "k", 100.0, 5.0, 2.0)), s"${got.toSeq}")
  }

  test("keySkew: heavy key surfaces with share and max/mean factor") {
    // key a: 6 rows, b: 2, c: 2, d: 2 → N=12, 4 keys, mean 3,
    // skew = 6/3 = 2.0; shares 0.5 / 0.166667
    val df = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq.fill(2)("c") ++
      Seq.fill(2)("d")).toDF("k")
    val got = Profile.keySkew(df, "k", topK = 2)
      .select("key", "cnt", "rank", "share", "skew_factor")
      .as[(String, Long, Int, Double, Double)].collect().sortBy(_._3)
    assert(got.toSeq == Seq(("a", 6L, 1, 0.5, 2.0),
      ("b", 2L, 2, 0.166667, 2.0)), s"got ${got.toSeq}")
  }

  test("psiDrift: smoothing handles bins absent on one side") {
    import org.apache.spark.sql.functions._
    val df = Seq(("k", 5L, true), ("k", 5L, false), ("k", 25L, false))
      .toDF("g", "v", "isb")
    // bins {0, 2}; add-one: p = (2/3, 1/3), q = (2/4, 2/4) — the bin-2
    // baseline count is zero yet no division by zero, finite psi
    val got = Profile.psiDrift(df, "g", "v", col("isb"), 10L)
      .as[(String, Long, Long, Long, Boolean)].collect().head
    assert(got._2 == 1L && got._3 == 2L && !got._5)
    val expected = Seq((2.0 / 3, 2.0 / 4), (1.0 / 3, 2.0 / 4)).map {
      case (p, q) =>
        BigDecimal.valueOf((p - q) * math.log(p / q) * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }.sum
    assert(got._4 == expected, s"got ${got._4}, want $expected")
  }
}
