package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Raw text-dump ingestion — the first hop of a training-data pipeline:
  * crawl/export dumps arrive as JSONL or CSV (often gzip, which Spark
  * decompresses transparently by extension), with some fraction of
  * malformed lines that must be QUARANTINED, not dropped silently and
  * not allowed to kill a 100 TB job.
  *
  * Shape: PERMISSIVE parse with an explicit schema (never inference —
  * schema inference is a second full read of 100 TB) plus the standard
  * corrupt-record side channel. [[split]] separates parsed rows from
  * quarantined raw lines so the pipeline can count/inspect failures
  * in-band — mirroring how every serious lakehouse ingest treats bad
  * records. */
object TextIngest {

  val CorruptCol = "_corrupt_record"

  /** JSONL with explicit schema; malformed lines land whole in
    * `_corrupt_record` with every data column null. */
  def readJsonl(spark: SparkSession, path: String, schema: StructType)
      : DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** CSV with explicit schema (no header by default; pass
    * `header = true` for dumps that carry one). Rows with the wrong
    * arity or uncastable values quarantine like JSONL. */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = false): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("header", header.toString)
      .csv(path)

  /** Split an ingest read into (parsed, quarantined-raw-lines).
    *
    * The frame is persisted first: Spark (correctly) refuses queries
    * that reference ONLY the corrupt-record column of a raw file scan,
    * and without a persist the two sides would re-read and re-parse the
    * input twice anyway. Cache ownership follows the session-loop
    * convention (caller clears after consuming both sides). */
  def split(ingested: DataFrame): (DataFrame, DataFrame) = {
    val cached = ingested.persist()
    val good = cached.where(col(CorruptCol).isNull).drop(CorruptCol)
    val bad = cached.where(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"))
    (good, bad)
  }
}
