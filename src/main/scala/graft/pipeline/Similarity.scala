package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`): brute-force
  * cosine top-k as the correctness baseline, IVF (inverted-file) bucketing
  * as the 100 TB scale path.
  *
  * Scale design: brute force is O(|Q|·|C|) — fine when the query set is
  * small and broadcastable (the plan below broadcasts queries so the corpus
  * is scanned exactly once, no corpus shuffle). IVF cuts the scanned
  * fraction to ~probes/centroids: corpus vectors are pre-assigned to their
  * nearest centroid (a narrow projection against a broadcast centroid
  * table, persisted alongside the corpus at ingest), and a query only scans
  * the `probe` buckets nearest to it — at 1000 executors the bucket
  * assignment is the partition key, so each query touches few partitions.
  */
object Similarity {

  /** Cosine similarity of two double arrays — a sequential left fold, so
    * the result is deterministic and engine-reproducible. */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    dot(a, b) / sqrt(dot(a, a)) / sqrt(dot(b, b))
  }

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors (excluding itself). Queries are broadcast; corpus scanned once.
    */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame,
      vecCol: String, idCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rn", row_number().over(w)).where(col("rn") <= k).drop("rn")
  }

  /** Deterministic centroid set: the corpus rows with the `nCentroids`
    * smallest ids (a k-means stand-in that both engines reproduce exactly;
    * swap in trained centroids in production). */
  def centroids(corpus: DataFrame, vecCol: String, idCol: String,
      nCentroids: Int): DataFrame =
    corpus.orderBy(col(idCol)).limit(nCentroids)
      .select(col(idCol).as("centroid_id"), asDouble(col(vecCol)).as("centv"))

  /** Assign each corpus vector to its nearest centroid (narrow projection
    * against broadcast centroids — this becomes the IVF partition key). */
  def assignBuckets(corpus: DataFrame, cents: DataFrame,
      vecCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("cos").desc, col("centroid_id").asc)
    corpus.select(col(idCol), asDouble(col(vecCol)).as("v"))
      .crossJoin(broadcast(cents))
      .select(col(idCol), col("v"), col("centroid_id"),
        cosine(col("v"), col("centv")).as("cos"))
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col(idCol), col("v"), col("centroid_id").as("bucket"))
  }

  /** IVF top-k with `probe` probed buckets per query: each query is scored
    * only against corpus vectors in its `probe` nearest centroid buckets.
    * Recall < 1 by construction; validated against [[bruteForceTopK]]. */
  def ivfTopK(
      queries: DataFrame, corpus: DataFrame,
      vecCol: String, idCol: String, k: Int,
      nCentroids: Int, probe: Int = 1): DataFrame = {
    val cents = centroids(corpus, vecCol, idCol, nCentroids)
    val bucketed = assignBuckets(corpus, cents, vecCol, idCol)
    val qw = Window.partitionBy("query_id")
      .orderBy(col("qcos").desc, col("centroid_id").asc)
    val qBuckets = queries
      .select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .crossJoin(broadcast(cents))
      .select(col("query_id"), col("qv"), col("centroid_id"),
        cosine(col("qv"), col("centv")).as("qcos"))
      .withColumn("rn", row_number().over(qw)).where(col("rn") <= probe)
      .select(col("query_id"), col("qv"), col("centroid_id").as("bucket"))
    val scored = bucketed.join(broadcast(qBuckets), "bucket")
      .where(col("query_id") =!= col(idCol))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        cosine(col("qv"), col("v")).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rn", row_number().over(w)).where(col("rn") <= k).drop("rn")
  }
}
