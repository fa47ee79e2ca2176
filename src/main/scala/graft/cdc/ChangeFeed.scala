package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Turns a table (batch or stream) into a CDC change feed with the metadata
  * the WALRUS pipeline expects — the Spark analog of the reference's WAL poll
  * scan (S1, wal2json rows → change structs,
  * /root/reference/lib/extensions/postgres_cdc_rls/replication_poller.ex:149-232).
  *
  * Deterministic change-type derivation for the synthetic test feed: the
  * driver testdata has no real WAL, so we derive INSERT/UPDATE/DELETE from the
  * row key (stable across engines, expressible in the DuckDB oracle):
  * id % 10 ∈ [0,6) → INSERT, [6,9) → UPDATE, 9 → DELETE.
  */
object ChangeFeed {

  /** Wrap a typed table DataFrame as a change feed: adds `change_type`,
    * `change_schema`, `change_table`, `commit_timestamp`. Narrow (no shuffle).
    */
  def fromTable(
      df: DataFrame,
      idCol: String,
      tsCol: String,
      table: String,
      schemaName: String = "public"): DataFrame = {
    val m = pmod(col(idCol), lit(10))
    df.withColumn("change_type",
        when(m < 6, "INSERT").when(m < 9, "UPDATE").otherwise("DELETE"))
      .withColumn("change_schema", lit(schemaName))
      .withColumn("change_table", lit(table))
      .withColumn("commit_timestamp",
        date_format(col(tsCol), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"))
  }

  /** Read one of the driver parquet tables.
    *
    * The synthetic `events` table stores TIMESTAMP(NANOS) which Spark 4 won't
    * read natively; read nanos as long and truncate to microsecond timestamps
    * (integer division — doubles can't hold epoch-nanos exactly). DuckDB's
    * µs-native TIMESTAMP truncates identically, so oracles agree. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.fields.foldLeft(df) {
      case (acc, f) if f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType =>
        acc.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // naive µs timestamps (TIMESTAMP_NTZ) → session-UTC instants: every
      // main/spec session pins spark.sql.session.timeZone=UTC, so the cast
      // is value-preserving and DuckDB's naive read sees the same epoch —
      // while LTZ-only functions (unix_micros & co) keep working when the
      // driver emits µs instead of nanos
      case (acc, f) if f.dataType == org.apache.spark.sql.types.TimestampNTZType =>
        acc.withColumn(f.name,
          col(f.name).cast(org.apache.spark.sql.types.TimestampType))
      case (acc, _) => acc
    }
  }
}
