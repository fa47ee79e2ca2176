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
    * in chronological order. `now` is an explicit parameter — determinism.
    * The clamp is the reference's `max(min(limit, 25), 1)`
    * (messages.ex:24): a zero or negative limit still replays ONE
    * message, not zero. */
  def replay(
      messages: DataFrame,
      topic: String,
      since: java.sql.Timestamp,
      now: java.sql.Timestamp,
      limit: Int = 10): DataFrame = {
    val k = math.max(math.min(limit, ReplayHardLimit), 1)
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
    val kk = math.max(math.min(k, ReplayHardLimit), 1)
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

  /** JOIN-TIME replay — the admission arms and raw-param handling of
    * `can_replay?` + `maybe_replay_messages`
    * (realtime_channel.ex:92-94, 1041-1096), which wrap
    * [[replay]]'s message query per joining socket. The reference reads
    * the RAW join params here (NOT the Payloads.Join changeset — the
    * changeset's replay defaults of 10/0 are never consulted on this
    * path), which produces three sharp behaviors this operator pins:
    *
    *  1. arm order — `can_replay?` runs first: a replay request under a
    *     `broadcast read: false` policy is `unauthorized` even on a
    *     PUBLIC channel (the private check lives in
    *     `maybe_replay_messages`, which runs after);
    *  2. a replay request on a public channel is
    *     `invalid_replay_channel`; a NON-MAP replay value on a private
    *     channel silently falls to the catch-all — ok with an EMPTY
    *     replay, not an error;
    *  3. raw-param defaults: `limit || 25` (absent limit = 25, the
    *     changeset's 10 is dead code on this path), then
    *     `max(min(limit, 25), 1)`; `since` has NO default — an absent
    *     or non-integer `since` (or a non-integer present `limit`)
    *     fails `Realtime.Messages.replay`'s integer guards →
    *     `invalid_replay_params`.
    *
    * Inputs: `joins` one row per joining socket with `join_id`,
    * `topic`, `private` (bool), `read_policy` (bool — the socket's
    * broadcast read policy), `replay_requested` (bool — the `replay`
    * KEY present), `replay_is_map` (bool), `since_raw` / `limit_raw`
    * (the raw param text, null = absent); `messages` the message-log
    * table. Output: one row per replayed message
    * `(join_id, status, message_id, inserted_us)` in ok-joins (epoch
    * micros — a NULLABLE timestamp column trips engine-dependent
    * datetime-unit comparison paths downstream, and the wire payload
    * carries epoch anyway), one null-message row per empty-ok or
    * errored join.
    *
    * Shape: the status projection is row-local; the replay leg joins
    * ok-requests to the log on `topic` (messages shuffle on topic; the
    * join dimension is sockets-sized) and ranks per join_id with each
    * join's own clamped limit — rank ≤ a COLUMN, one window after the
    * join. The error/empty legs union back at dimension size. */
  def replayOnJoin(
      joins: DataFrame,
      messages: DataFrame,
      now: java.sql.Timestamp): DataFrame = {
    val intRe = "^-?\\d+$"
    val sinceOk = col("since_raw").isNotNull && col("since_raw").rlike(intRe)
    val limitOk = col("limit_raw").isNull || col("limit_raw").rlike(intRe)
    val status = when(col("replay_requested") && !col("read_policy"),
        "unauthorized")
      .when(col("replay_requested") && !col("private"),
        "invalid_replay_channel")
      .when(col("replay_requested") && col("replay_is_map") &&
        (!sinceOk || !limitOk), "invalid_replay_params")
      .otherwise("ok")
    val wantsMessages = col("status") === "ok" &&
      col("replay_requested") && col("replay_is_map")
    val decided = joins.withColumn("status", status)
      .withColumn("_wants", wantsMessages)
      .withColumn("_since_ms",
        when(col("_wants"), col("since_raw").cast("long")))
      .withColumn("_limit",
        when(col("_wants"), greatest(least(
          coalesce(col("limit_raw").cast("long"), lit(25L)), lit(25L)),
          lit(1L))))
    val nowPlus = new java.sql.Timestamp(now.getTime + 60000L)
    // Pre-prune the log to the newest ReplayHardLimit per topic BEFORE
    // the join. This is exact, not approximate: every per-join limit is
    // capped at 25 and the since filter is a ts LOWER bound, so the k
    // newest messages ≥ since_j are always among the k newest overall
    // (if y qualified for some join's top-25 but sat outside the global
    // top-25, the >25 globally-newer messages are all ≥ y ≥ since_j and
    // would displace it). Without the prune a hot topic pairs EVERY
    // join against EVERY qualifying message pre-rank — quadratic in the
    // hot topic's volume; with it the join side is ≤ 25·|topics| rows
    // and the probe-scale hot key is flat.
    val wTopic = Window.partitionBy("_mtopic")
      .orderBy(col("inserted_at").desc, col("id").desc)
    // the since bound lives in the JOIN CONDITION, not a post-filter: a
    // join whose topic matches rows but none qualify must still surface
    // as ONE null-message row (empty replay), which only the left join's
    // null-extension provides
    val replayable = messages.where(col("private") === true &&
        col("extension") === "broadcast" &&
        col("inserted_at") < lit(nowPlus))
      .select(col("topic").as("_mtopic"), col("id"), col("inserted_at"))
      .withColumn("_trn", row_number().over(wTopic))
      .where(col("_trn") <= ReplayHardLimit)
      .drop("_trn")
    val wants = decided.where(col("_wants"))
      .select(col("join_id"), col("status"), col("topic"),
        col("_since_ms"), col("_limit"))
    val w = Window.partitionBy("join_id")
      .orderBy(col("inserted_at").desc, col("id").desc)
    val replayed = wants.join(replayable,
        wants("topic") === replayable("_mtopic") &&
          replayable("inserted_at") >=
            timestamp_millis(wants("_since_ms")), "left")
      .withColumn("_rn", row_number().over(w))
      .where(col("id").isNull || col("_rn") <= col("_limit"))
      .select(col("join_id"), col("status"), col("id").as("message_id"),
        unix_micros(col("inserted_at")).as("inserted_us"))
    val bare = decided.where(!col("_wants"))
      .select(col("join_id"), col("status"),
        lit(null).cast("long").as("message_id"),
        lit(null).cast("long").as("inserted_us"))
    replayed.unionByName(bare)
  }

  /** Rows surviving 72 h retention relative to `now`. As a partitioned-table
    * maintenance job this is a partition drop (date < cutoff). */
  def retained(messages: DataFrame, now: java.sql.Timestamp): DataFrame =
    messages.where(col("inserted_at") >=
      lit(new java.sql.Timestamp(now.getTime - RetentionHours * 3600000L)))
}
