package graft.messages

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The message log: bounded replay + partitioned storage + retention — the
  * Spark re-expression of `realtime.messages`
  * (/root/reference/lib/realtime/tenants/repo/migrations/
  * 20241030150047_messages_partitioning.ex:7-18, daily RANGE partitions) and
  * the replay query (/root/reference/lib/realtime/messages.ex:22-67).
  *
  * Scale design: the log is a date-partitioned parquet/Delta table. Replay
  * predicates (`topic =`, `inserted_at` range) prune partitions at the scan —
  * at 100 TB the replay query touches only the ≤72 h of live partitions, and
  * the retention job is a partition drop, not a rewrite. The per-topic top-k
  * uses a window ranked within partitions after a hash partition on topic —
  * one shuffle, no global sort (contrast `ORDER BY … LIMIT` which would
  * funnel through a single reducer at scale).
  */
object Messages {

  /** Hard cap on replayed messages (reference messages.ex:10). */
  val ReplayHardLimit = 25

  /** Retention window (reference messages.ex:73-102). */
  val RetentionHours = 72

  /** Write the log partitioned by day — the analog of the reference's daily
    * RANGE partitions; retention becomes a partition drop. */
  def write(messages: DataFrame, path: String): Unit =
    messages
      .withColumn("inserted_date", to_date(col("inserted_at")))
      .write.mode("append").partitionBy("inserted_date").parquet(path)

  /** The retention MAINTENANCE job on a [[write]] layout: delete the
    * day-partitions that lie entirely before the 72 h cutoff — a
    * directory drop, never a rewrite (the reference drops whole daily
    * RANGE partitions the same way, messages.ex:73-102). The partition
    * containing the cutoff instant is KEPT (it still holds live rows);
    * [[retained]] remains the row-level filter for reads. Returns the
    * dropped partition names. Works through the Hadoop FS API, so the
    * same call runs on local disk, HDFS, or object storage. */
  def dropExpired(spark: org.apache.spark.sql.SparkSession, path: String,
      now: java.sql.Timestamp): Seq[String] = {
    val cutoffDate = java.time.Instant
      .ofEpochMilli(now.getTime - RetentionHours * 3600000L)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory &&
        s.getPath.getName.startsWith("inserted_date="))
      .filter(s => java.time.LocalDate
        .parse(s.getPath.getName.stripPrefix("inserted_date="))
        .isBefore(cutoffDate))
      .map { s => fs.delete(s.getPath, true); s.getPath.getName }
      .sorted
  }

  /** Bounded replay for one topic (reference messages.ex:45-67): private
    * broadcast messages in `[since, now+1min)`, newest `limit` (≤25), returned
    * in chronological order. `now` is an explicit parameter — determinism. */
  def replay(
      messages: DataFrame,
      topic: String,
      since: java.sql.Timestamp,
      now: java.sql.Timestamp,
      limit: Int = 10): DataFrame = {
    val k = math.min(math.max(limit, 0), ReplayHardLimit)
    messages
      .where(col("private") === true &&
        col("extension") === "broadcast" &&
        col("topic") === topic &&
        col("inserted_at") >= lit(since) &&
        col("inserted_at") < lit(new java.sql.Timestamp(now.getTime + 60000L)))
      .orderBy(col("inserted_at").desc, col("id").desc)
      .limit(k)
      .orderBy(col("inserted_at").asc, col("id").asc)
  }

  /** Per-topic top-k replay for many topics at once (W1 generalized): rank
    * within topic, keep newest k. One hash shuffle on topic; no global sort. */
  def replayPerTopic(
      messages: DataFrame,
      since: java.sql.Timestamp,
      now: java.sql.Timestamp,
      k: Int = ReplayHardLimit): DataFrame = {
    val kk = math.min(math.max(k, 0), ReplayHardLimit)
    val w = Window.partitionBy("topic")
      .orderBy(col("inserted_at").desc, col("id").desc)
    messages
      .where(col("private") === true &&
        col("extension") === "broadcast" &&
        col("inserted_at") >= lit(since) &&
        col("inserted_at") < lit(new java.sql.Timestamp(now.getTime + 60000L)))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= kk)
      .drop("rn")
  }

  /** Replayed-message dedup (P9/U3): drop live rows whose id was already
    * replayed — a broadcast left-anti join (replayed set is ≤25×topics). */
  def dedupAgainstReplayed(live: DataFrame, replayed: DataFrame): DataFrame =
    live.join(broadcast(replayed.select("id").distinct()), Seq("id"), "left_anti")

  /** Rows surviving 72 h retention relative to `now`. As a partitioned-table
    * maintenance job this is a partition drop (date < cutoff). */
  def retained(messages: DataFrame, now: java.sql.Timestamp): DataFrame =
    messages.where(col("inserted_at") >=
      lit(new java.sql.Timestamp(now.getTime - RetentionHours * 3600000L)))
}
