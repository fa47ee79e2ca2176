package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental (cross-batch) deduplication: which documents of a new
  * crawl batch are genuinely new versus already present in a historical
  * corpus — the recurring front-door question of a continuously-ingesting
  * training-data pipeline.
  *
  * The exact answer is a digest anti-join, but at 100 TB the history's
  * digest set is itself huge and the anti-join shuffles the ENTIRE new
  * batch. The scale shape here is a Bloom prefilter built
  * DISTRIBUTIVELY over the history (explode k bit positions → map-side
  * `bit_or` per 64-bit word → collect only `mBits/64` words to the
  * driver) and broadcast into a narrow projection over the batch as a
  * literal word array — codegen'd Column arithmetic, no UDF. Rows the
  * filter rejects are DEFINITELY new (Bloom has no false negatives) and
  * skip the shuffle entirely; only the "maybe present" sliver — true
  * duplicates plus the fpp·|batch| false positives — reaches the exact
  * anti-join that removes false positives. The result is therefore
  * EXACT regardless of `mBits`/`k`; the knobs trade filter size against
  * confirm-join traffic (1 MiB of filter ≈ 8M bits; at fpp ≈ 1% the
  * confirm join shrinks ~100× on a mostly-new batch).
  *
  * Hashing is xxhash64(digest, seed) — deterministic and
  * engine-independent, so the filter (and the plan) is reproducible
  * bit-for-bit across runs and cluster sizes.
  */
object Incremental {

  /** Build the Bloom filter's 64-bit words over a digest column:
    * k bit positions per digest, OR-combined per word distributively
    * (map-side partial `bit_or` — at most `mBits/64` rows per partition
    * reach the exchange, and only `mBits/64` words reach the driver). */
  def bloomWords(digests: DataFrame, digestCol: String,
      mBits: Int, k: Int): Array[Long] = {
    require(mBits > 0 && mBits % 64 == 0, "mBits must be a positive multiple of 64")
    val posCols = (0 until k).map(i =>
      pmod(xxhash64(col(digestCol), lit(i)), lit(mBits.toLong)))
    val words = digests
      .select(explode(array(posCols: _*)).as("pos"))
      .selectExpr("cast(pos div 64 as int) AS w", "cast(pos % 64 as int) AS b")
      .groupBy("w").agg(expr("bit_or(shiftleft(1L, b))").as("word"))
      .collect()
    val arr = new Array[Long](mBits / 64)
    words.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  /** Membership-test column over `digestColName` against the broadcast
    * word array (rides the row as a literal — zero per-row allocation).
    * False positives possible at the configured fpp; false negatives
    * never. Pure codegen'd arithmetic: k× (xxhash64 + element_at +
    * mask test). */
  def mightContain(words: Array[Long], digestColName: String,
      mBits: Int, k: Int): Column = {
    require(words.length == mBits / 64, "word array does not match mBits")
    val tests = (0 until k).map { i =>
      val pos = s"pmod(xxhash64($digestColName, $i), ${mBits}L)"
      s"((element_at(_bloom, cast($pos div 64 AS int) + 1) & " +
        s"shiftleft(1L, cast($pos % 64 AS int))) != 0)"
    }
    expr(tests.mkString(" AND "))
  }

  /** Batch rows whose content digest is NOT present in `history`:
    * `(idCol, digest)` — exact (the Bloom stage only routes; the
    * confirm anti-join removes its false positives). NULL text hashes
    * via the `coalesce('')` sentinel, same convention as
    * [[Curation.leakageGuardedSplit]]. */
  def newDocs(batch: DataFrame, history: DataFrame,
      textCol: String, idCol: String,
      mBits: Int = 1 << 20, k: Int = 5): DataFrame = {
    // Both digest projections are EvalOnce-fenced — md5 of the FULL
    // document text must evaluate once per row, and two optimizer moves
    // otherwise inline it into each of the bloom test's k×2 hash
    // references (DupExprScan caught both as Md5 x10 in a Filter):
    //  - batch side: the `_maybe` routing filter pushes below the
    //    digest projection;
    //  - history side: InferFiltersFromConstraints copies the SAME
    //    bloom test across the anti-join's digest equality onto the
    //    history input — a genuinely good pruning (only maybe-digests
    //    ship to the confirm join), which the fence keeps, evaluated
    //    over the one computed digest instead of ten re-hashes.
    val digest = md5(coalesce(col(textCol), lit("")))
    val hist = history.select(graft.plans.EvalOnce.of(digest).as("digest"))
    val words = bloomWords(hist, "digest", mBits, k)
    val tagged = batch
      .select(col(idCol), graft.plans.EvalOnce.of(digest).as("digest"))
      .withColumn("_bloom", typedLit(words.toSeq))
      .withColumn("_maybe", mightContain(words, "digest", mBits, k))
    val definiteNew = tagged.where(!col("_maybe"))
      .select(col(idCol), col("digest"))
    val confirmedNew = tagged.where(col("_maybe"))
      .select(col(idCol), col("digest"))
      .join(hist, Seq("digest"), "left_anti")
      .select(col(idCol), col("digest"))
    definiteNew.unionByName(confirmedNew)
  }

  /** Streaming twin of [[newDocs]] for a continuously-ingesting corpus:
    * the FIRST occurrence of each content digest passes, every later
    * arrival drops — Structured Streaming keeps the digest set as keyed
    * state, so cross-micro-batch duplicates are caught, not just
    * within-batch ones.
    *
    * With `watermark = Some((tsCol, delay))` the state is bounded:
    * `dropDuplicatesWithinWatermark` expires a digest once the watermark
    * passes it, trading unbounded memory for "duplicates farther apart
    * than the horizon re-admit" — the standard streaming-dedup contract.
    * Without a watermark the digest state grows with the corpus: correct,
    * but only viable for bounded streams (at 100 TB, give a horizon, or
    * run [[newDocs]] as a periodic batch reconciliation against the
    * accumulated history). */
  def streamNewDocs(stream: DataFrame, textCol: String, idCol: String,
      watermark: Option[(String, String)] = None): DataFrame = {
    val withDigest = stream
      .withColumn("digest", md5(coalesce(col(textCol), lit(""))))
    watermark match {
      case Some((tsCol, delay)) =>
        withDigest.withWatermark(tsCol, delay)
          .dropDuplicatesWithinWatermark("digest")
      case None => withDigest.dropDuplicates("digest")
    }
  }
}
