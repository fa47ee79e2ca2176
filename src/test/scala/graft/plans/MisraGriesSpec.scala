package graft.plans

import graft.SparkSpec
import graft.pipeline.Profile
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** The Misra–Gries guarantee, the mergeable-summaries merge rule, and the
  * determinism of the two-pass exact heavy-hitter answer. */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  private def sketch(keys: Seq[String], k: Int, parts: Int): Map[String, Long] = {
    val df = keys.toDF("key").repartition(parts)
    val mg = ColumnBridge.column(
      MisraGries(ColumnBridge.expression(col("key")), k).toAggregateExpression())
    df.agg(mg.as("sk"))
      .select(explode($"sk").as("e"))
      .select($"e.key", $"e.cnt").as[(String, Long)].collect().toMap
  }

  test("sketch never exceeds capacity and undercounts by at most n/(k+1)") {
    val keys = Seq.fill(60)("hot") ++ (1 to 50).map(i => s"cold$i")
    val n = keys.size
    val k = 5
    for (parts <- Seq(1, 3, 7)) {
      val sk = sketch(keys, k, parts)
      assert(sk.size <= k)
      // MG bound: every key with count > n/(k+1) is present, and its
      // residual is within n/(k+1) of the true count
      assert(sk.contains("hot"), s"parts=$parts sketch lost the heavy key")
      assert(sk("hot") <= 60L && sk("hot") >= 60L - n / (k + 1))
    }
  }

  test("property: all keys above the n/(k+1) bound survive any partitioning") {
    val rnd = new scala.util.Random(41)
    for (_ <- 1 to 15) {
      val keys = List.fill(200) {
        val r = rnd.nextInt(14)
        if (r < 8) "H1" else if (r < 13) "H2" else s"t${rnd.nextInt(40) + 1}"
      }
      val k = rnd.nextInt(7) + 2 // 2..8
      val parts = rnd.nextInt(6) + 1 // 1..6
      val sk = sketch(keys, k, parts)
      assert(sk.size <= k)
      val counts = keys.groupBy(identity).view.mapValues(_.size.toLong)
      val bound = keys.size.toLong / (k + 1)
      counts.foreach { case (key, cnt) =>
        if (cnt > bound)
          assert(sk.contains(key),
            s"k=$k parts=$parts lost $key (cnt=$cnt > bound=$bound)")
      }
    }
  }

  test("composes with groupBy: one bounded sketch per group") {
    val df = (Seq.fill(30)(("t1", "hot")) ++ Seq.fill(5)(("t1", "warm")) ++
      (1 to 20).map(i => ("t1", s"c$i")) ++ Seq.fill(10)(("t2", "only")))
      .toDF("tenant", "key")
    val mg = ColumnBridge.column(
      MisraGries(ColumnBridge.expression(col("key")), 3).toAggregateExpression())
    val perTenant = df.groupBy("tenant").agg(mg.as("sk"))
      .select($"tenant", explode($"sk").as("e"))
      .select($"tenant", $"e.key").as[(String, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // t1: n=55, bound 13 → "hot" (30) guaranteed; t2 trivially holds "only"
    assert(perTenant("t1").contains("hot"))
    assert(perTenant("t1").size <= 3)
    assert(perTenant("t2") == Set("only"))
  }

  test("heavyHittersByGroup: exact per-group answer, partitioning-independent") {
    // t1: n=60, k=3 → bound 15: hot(30) in, warm(15) exactly AT the
    // bound stays out; t2: n=10, only(10) > 2.5 in
    val rows = Seq.fill(30)(("t1", "hot")) ++ Seq.fill(15)(("t1", "warm")) ++
      (1 to 15).map(i => ("t1", s"c$i")) ++ Seq.fill(10)(("t2", "only"))
    for (parts <- Seq(1, 5)) {
      val out = Profile.heavyHittersByGroup(
          rows.toDF("tenant", "key").repartition(parts), "tenant", "key", 3)
        .select($"grp", $"key", $"cnt", $"n_grp")
        .as[(String, String, Long, Long)].collect().toSet
      assert(out == Set(("t1", "hot", 30L, 60L), ("t2", "only", 10L, 10L)),
        s"parts=$parts got $out")
    }
  }

  test("null keys are ignored; empty input yields an empty sketch") {
    val df = Seq[Option[String]](None, None, Some("a"), None).toDF("key")
    val mg = ColumnBridge.column(
      MisraGries(ColumnBridge.expression(col("key")), 3).toAggregateExpression())
    val rows = df.agg(mg.as("sk"))
      .select(explode($"sk").as("e")).select($"e.key").as[String].collect()
    assert(rows.toSeq == Seq("a"))
    val empty = spark.emptyDataset[String].toDF("key")
      .agg(mg.as("sk")).select(size($"sk")).as[Int].collect()
    assert(empty.toSeq == Seq(0))
  }

  test("heavyHitters: exact answer is partitioning-independent and strict") {
    // 3 heavies (counts 30, 25, 20 of n=90; bound with k=4 is 18) and a
    // long tail; a tail key at exactly the bound must be EXCLUDED
    val keys = Seq.fill(30)("a") ++ Seq.fill(25)("b") ++ Seq.fill(20)("c") ++
      Seq.fill(9)("tail1") ++ Seq.fill(6)("tail2")
    val n = keys.size // 90; threshold cnt*5 > 90 ⇔ cnt > 18
    for (parts <- Seq(1, 4, 9)) {
      val out = Profile.heavyHitters(
          keys.toDF("key").repartition(parts), "key", 4)
        .orderBy($"cnt".desc)
        .select($"key", $"cnt", $"n_rows").as[(String, Long, Long)].collect()
      assert(out.toSeq == Seq(("a", 30L, 90L), ("b", 25L, 90L), ("c", 20L, 90L)),
        s"parts=$parts")
    }
    // boundary: a key at exactly n/(k+1) (cnt*5 == n) is not a heavy hitter
    val atBound = Seq.fill(20)("x") ++ (1 to 80).map(i => s"z${i % 40}")
    assert(atBound.size == 100 && atBound.count(_ == "x") * 5 == 100)
    val hh = Profile.heavyHitters(atBound.toDF("key"), "key", 4)
      .select($"key").as[String].collect()
    assert(!hh.contains("x"))
  }

  test("streaming: sketch state carries across micro-batches in the state store") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val s = spark
    val input = MemoryStream[String](spark)
    val mg = ColumnBridge.column(
      MisraGries(ColumnBridge.expression(col("value")), 2).toAggregateExpression())
    val q = input.toDS().toDF("value")
      .groupBy(lit(1).as("g")).agg(mg.as("sk"))
      .select(explode($"sk").as("e")).select($"e.key", $"e.cnt")
      .writeStream.format("memory").queryName("mg_out")
      .outputMode(OutputMode.Complete).start()
    try {
      // batch 1: a×3, b×1 — sketch {a:3, b:1}
      input.addData("a", "a", "a", "b")
      q.processAllAvailable()
      val b1 = spark.table("mg_out").as[(String, Long)].collect().toMap
      assert(b1("a") == 3L)
      // batch 2: b×4, c×1 — merged with CARRIED state: a:3, b:5, c:1 →
      // capacity 2 cut drops c; counts only make sense if batch-1 state
      // survived in the state store
      input.addData("b", "b", "b", "b", "c")
      q.processAllAvailable()
      val b2 = spark.table("mg_out").as[(String, Long)].collect().toMap
      // whatever the partial/merge order, b (true count 5 > n/3) must
      // survive with residual ≥ 4, a stays (never evictable at size 2),
      // and c can never displace a full buffer
      assert(b2.keySet == Set("a", "b"), s"got $b2")
      assert(b2("b") >= 4L, s"batch-2 b undercounted past the bound: $b2")
    } finally q.stop()
  }

  test("serialize/deserialize round-trips a buffer exactly") {
    val agg = MisraGries(ColumnBridge.expression(col("key")), 4)
    val buf = agg.createAggregationBuffer()
    import org.apache.spark.unsafe.types.UTF8String
    buf.update(UTF8String.fromString("k1"), 7L)
    buf.update(UTF8String.fromString("k2"), 3L)
    buf.update(UTF8String.fromString("λ漢"), 1L)
    val back = agg.deserialize(agg.serialize(buf))
    assert(back == buf)
  }
}
