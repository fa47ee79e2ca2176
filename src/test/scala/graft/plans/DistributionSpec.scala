package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DistributionSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without shuffling either side") {
    spark.sql("DROP TABLE IF EXISTS dist_a")
    spark.sql("DROP TABLE IF EXISTS dist_b")
    for (t <- Seq("dist_a", "dist_b")) {
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles.foreach(rm); f.delete()
        }
        rm(loc)
      }
    }
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong, s"b$i")).toDF("k", "vb")
    Distribution.writeBucketed(a, "dist_a", "k", 8)
    Distribution.writeBucketed(b, "dist_b", "k", 8)
    val joined = spark.table("dist_a").join(spark.table("dist_b"), "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected co-located bucket join, got:\n$plan")
    assert(joined.count() == 1000)
  }

  test("salted join returns exactly the plain join's rows") {
    val big = (1 to 5000).map(i => (if (i % 2 == 0) 1L else i.toLong, i))
      .toDF("k", "payload") // heavy skew on k=1
    val small = Seq((1L, "hot"), (3L, "cold"), (9999L, "miss")).toDF("k", "name")
    val plain = big.join(small, "k").select("k", "payload", "name")
      .as[(Long, Int, String)].collect().toSet
    val salted = Distribution.saltedJoin(big, small, "k", salt = 8)
      .select("k", "payload", "name").as[(Long, Int, String)].collect().toSet
    assert(salted == plain && plain.size == 2502) // 2500 even + i=1 + i=3
  }

  test("salted two-phase count equals direct groupBy") {
    val df = (1 to 10000).map(i => if (i % 10 < 9) "hot" else s"k${i % 7}")
      .toDF("k")
    val direct = df.groupBy("k").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val salted = Distribution.saltedCount(df, "k", 8)
      .as[(String, Long)].collect().toMap
    assert(salted == direct)
  }

  // ---- plan-shape locks for the narrow curation operators: these must
  // stay pure projections/filters over the scan — a shuffle sneaking in
  // is a 100 TB regression even when results stay correct. (Sources are
  // spark.range, not LocalRelation, so ConvertToLocalRelation can't
  // constant-fold the plan away before the assertion.)

  private def physical(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("stratifiedSample is shuffle-free") {
    val df = spark.range(1000).select(col("id"),
      concat(lit("l"), pmod(col("id"), lit(3))).as("lang"))
    val plan = physical(graft.pipeline.Curation.stratifiedSample(
      df, "lang", "id", Map("l0" -> 0.5), defaultRate = 0.1))
    assert(!plan.contains("Exchange"), s"sample must stay narrow:\n$plan")
  }

  test("chunkByTokens is shuffle-free") {
    val df = spark.range(100).select(col("id"),
      concat_ws(" ", lit("a b c d e f g"), col("id").cast("string")).as("text"))
    val plan = physical(graft.pipeline.TextAnalysis.chunkByTokens(
      df, "text", "id", chunkTokens = 3, overlap = 1))
    assert(!plan.contains("Exchange"), s"chunking must stay narrow:\n$plan")
  }

  test("repetitionFeatures pre-aggregates before every exchange") {
    val df = spark.range(100).select(col("id"),
      lit("a b a c a b d").as("text"))
    val plan = physical(
      graft.pipeline.TextAnalysis.repetitionFeatures(df, "text", "id"))
    // both token aggregates must show partial_ forms upstream of their
    // exchange (map-side combine), and nothing may cross-join
    assert(plan.contains("partial_"), s"expected partial aggregation:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
