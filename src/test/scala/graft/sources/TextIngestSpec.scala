package graft.sources

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.types._

class TextIngestSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("text", StringType)))

  private def write(lines: Seq[String], suffix: String): String = {
    val dir = Files.createTempDirectory("ingest").toFile
    dir.deleteOnExit()
    val f = new java.io.File(dir, s"part-0.$suffix")
    Files.writeString(f.toPath, lines.mkString("\n"))
    dir.getAbsolutePath
  }

  test("jsonl: good rows parse, malformed lines quarantine whole") {
    val path = write(Seq(
      """{"id": 1, "text": "hello"}""",
      """{"id": 2 "text": "missing comma"}""",
      """{"id": 3, "text": "world"}""",
      """not json at all"""), "jsonl")
    val (good, bad) = TextIngest.split(
      TextIngest.readJsonl(spark, path, schema))
    assert(good.as[(Long, String)].collect().toSet ==
      Set((1L, "hello"), (3L, "world")))
    val raw = bad.as[String].collect()
    assert(raw.length == 2)
    assert(raw.exists(_.contains("missing comma")) &&
      raw.contains("not json at all"),
      "the quarantined side carries the ORIGINAL line for triage")
    spark.catalog.clearCache()
  }

  test("jsonl: type mismatch quarantines (explicit schema, no coercion)") {
    val path = write(Seq(
      """{"id": "not-a-number", "text": "x"}""",
      """{"id": 7, "text": "ok"}"""), "jsonl")
    val (good, bad) = TextIngest.split(
      TextIngest.readJsonl(spark, path, schema))
    assert(good.as[(Long, String)].collect().toSeq == Seq((7L, "ok")))
    assert(bad.count() == 1)
    spark.catalog.clearCache()
  }

  test("csv: arity and cast failures quarantine; clean rows parse") {
    val path = write(Seq(
      "1,alpha",
      "oops-not-long,beta",
      "3,gamma"), "csv")
    val (good, bad) = TextIngest.split(
      TextIngest.readCsv(spark, path, schema))
    assert(good.as[(Long, String)].collect().toSet ==
      Set((1L, "alpha"), (3L, "gamma")))
    assert(bad.as[String].collect().toSeq == Seq("oops-not-long,beta"))
    spark.catalog.clearCache()
  }
}
