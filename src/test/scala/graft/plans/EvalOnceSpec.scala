package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{JsonToStructs, Md5}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

/** The r12 plan-hygiene wins, pinned as tests: Catalyst pushes
  * predicates on derived fields below the projection that computes
  * them and re-derives the field per reference — for an expensive
  * derivation (a JSON parse, a full-text digest) that multiplied the
  * query's dominant cost 10–54×. These assert the EvalOnce fence keeps
  * one evaluation per row AND that results are unchanged, so a
  * refactor that drops a fence (or an optimizer upgrade that finds a
  * new duplication path) fails CI, not a bench review. */
class EvalOnceSpec extends SparkSpec {
  import spark.implicits._

  private def countIn(plan: SparkPlan)(pf: PartialFunction[Any, Unit])
      : Map[String, Int] = {
    val m = scala.collection.mutable.Map.empty[String, Int]
    plan.foreach { n =>
      var c = 0
      n.expressions.foreach(_.foreach { e =>
        if (pf.isDefinedAt(e)) c += 1 })
      if (c > 0) m.update(n.nodeName, m.getOrElse(n.nodeName, 0) + c)
    }
    m.toMap
  }

  private def md5Counts(df: DataFrame): Map[String, Int] =
    countIn(df.queryExecution.executedPlan) { case _: Md5 => }

  test("fence is a semantic no-op: fenced and unfenced results are " +
      "byte-equal through eval and codegen paths") {
    val df = (1L to 200L).map(i => (i, s"doc-$i-${"x" * (i % 7).toInt}"))
      .toDF("id", "t")
    val plain = df.select(col("id"), md5(col("t")).as("d"))
      .where(substring(col("d"), 1, 1).isin("0", "1", "2", "3", "4",
        "5", "6", "7"))
    val fenced = df.select(col("id"), EvalOnce.of(md5(col("t"))).as("d"))
      .where(substring(col("d"), 1, 1).isin("0", "1", "2", "3", "4",
        "5", "6", "7"))
    assert(fenced.collect().map(_.toString).sorted.toSeq ==
      plain.collect().map(_.toString).sorted.toSeq)
  }

  test("fence blocks predicate pushdown: the k-probe filter evaluates " +
      "the digest attribute, not k re-hashes below the projection") {
    val df = spark.range(100).select(col("id").cast("string").as("t"))
    def probes(c: org.apache.spark.sql.Column) =
      (0 until 5).map(i => pmod(xxhash64(c, lit(i)), lit(64L)) < 60)
        .reduce(_ && _)
    val unfenced = df.select(md5(col("t")).as("d")).where(probes(col("d")))
    val fenced = df.select(EvalOnce.of(md5(col("t"))).as("d"))
      .where(probes(col("d")))
    // the unfenced shape is the trap: k re-hashes inside the filter
    assert(md5Counts(unfenced).getOrElse("Filter", 0) >= 5)
    val fc = md5Counts(fenced)
    assert(fc.getOrElse("Filter", 0) == 0, s"md5 leaked into filter: $fc")
    assert(fc.getOrElse("Project", 0) == 1, s"expected one digest: $fc")
    assert(fenced.count() == unfenced.count())
  }

  test("wal2json consumers parse each JSON row once per decode leg " +
      "(was 27-54x before the fence)") {
    import graft.cdc.{Mirror, Wal2Json}
    val rows = (1L to 50L).map { i =>
      val act = Seq("I", "U", "D")((i % 3).toInt)
      (i, s"""{"action":"$act","schema":"public","table":"t",""" +
        s""""timestamp":"2026-01-01 00:00:0${i % 10}.000000+00",""" +
        s""""columns":[{"name":"k","type":"int8","typeoid":20,"value":${i % 7}}]}""")
    }.toDF("seq", "w2j")
    val decoded = Wal2Json.decodeChanges(rows, "w2j", "seq").toDF()
    val scd2 = Mirror.scd2FromWal(decoded, "k")
    val parses = countIn(scd2.queryExecution.executedPlan) {
      case _: JsonToStructs => }
    val total = parses.values.sum
    assert(total <= 2, s"wal2json re-parse regression: $parses")
    assert(scd2.count() > 0)
  }

  test("incremental-dedup bloom routing hashes each document once per " +
      "leg on both join sides (was 10x in the filters)") {
    import graft.pipeline.Incremental
    val docs = (1L to 120L).map(i => (i, s"text-${i % 40}")).toDF("id", "t")
    val out = Incremental.newDocs(
      docs.where(col("id") % 3 =!= 0), docs.where(col("id") % 3 === 0),
      "t", "id", mBits = 1 << 10, k = 5)
    val m = md5Counts(out)
    m.foreach { case (op, n) =>
      assert(n <= 1 || op == "Project",
        s"full-text md5 duplicated: $op x$n (all: $m)") }
    assert(m.values.sum <= 3, s"expected <=1 md5 per leg: $m")
    // and the routing is still EXACT: result == plain anti-join
    val want = docs.where(col("id") % 3 =!= 0)
      .select(col("id"), md5(col("t")).as("digest"))
      .join(docs.where(col("id") % 3 === 0)
        .select(md5(col("t")).as("digest")), Seq("digest"), "left_anti")
    assert(out.select("id").as[Long].collect().sorted.toSeq ==
      want.select("id").as[Long].collect().sorted.toSeq)
  }

  test("IVF index build evaluates the centroid argmax once per vector — " +
      "the Invalid-sentinel filter must not re-run the k·dim kernel " +
      "(was ArgmaxDot x2 + NormalizeVec x2 in the filter)") {
    import graft.pipeline.Similarity
    val dim = 8
    val vecs = (1L to 60L).map(i =>
      (i, Array.tabulate(dim)(j => ((i * 31 + j * 7) % 13).toDouble)))
      .toDF("id", "vec")
    val plan = Similarity.ivfTopK(vecs.limit(10), vecs, "vec", "id",
      k = 3, nCentroids = 4, dim = dim).queryExecution.executedPlan
    val kernelsByOp = countIn(plan) {
      case _: ArgmaxDot => case _: NormalizeVec => }
    kernelsByOp.foreach { case (op, n) =>
      assert(op == "Project" || op == "SerializeFromObject" || n == 0,
        s"vector kernel leaked into $op x$n (all: $kernelsByOp)") }
  }

  test("simhashDF computes one word digest per vocabulary entry " +
      "(was 15 inlined copies)") {
    import graft.pipeline.Dedup
    val docs = (1L to 40L).map(i => (i, s"alpha beta w$i gamma"))
      .toDF("id", "t")
    val m = md5Counts(Dedup.simhashDF(docs, "t", "id"))
    m.foreach { case (op, n) =>
      assert(n <= 1, s"vocab digest duplicated: $op x$n (all: $m)") }
  }

  test("composition restriction (documented on every fenced public " +
      "API): raw fenced column inside an aggregate is rejected at " +
      "analysis time; the bind-first idiom composes freely") {
    import graft.pipeline.TextAnalysis
    val docs = Seq((1L, "a b c"), (2L, "d e")).toDF("id", "t")
    // raw fenced column inside an aggregate: AnalysisException, never a
    // wrong result — this is the trap the scaladoc warns about
    intercept[org.apache.spark.sql.AnalysisException] {
      docs.agg(sum(TextAnalysis.tokenCount(col("t")))).collect()
    }
    // the documented idiom: bind once, then aggregate the attribute
    val bound = docs.withColumn("n", TextAnalysis.tokenCount(col("t")))
      .agg(sum(col("n")).as("total")).collect()
    assert(bound.head.getLong(0) == 5L)
    // join condition: same rule, same idiom
    val other = Seq((3L, 1)).toDF("oid", "n")
    intercept[org.apache.spark.sql.AnalysisException] {
      docs.join(other, TextAnalysis.tokenCount(col("t")) === col("n"))
        .collect()
    }
    assert(docs.withColumn("tc", TextAnalysis.tokenCount(col("t")))
      .join(other, col("tc") === col("n")).count() == 0L)
  }
}
