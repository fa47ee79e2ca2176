package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design notes (100 TB):
  *  - Exact dedup: hash-groupBy on md5(text) — one shuffle keyed by digest,
  *    map-side partial min; never compares full texts.
  *  - MinHash/LSH: O(n·k) signature computation is a narrow projection;
  *    candidate generation shuffles only (band_hash → doc_id) pairs, never
  *    text; verification joins shingle sets only for candidate pairs (the
  *    LSH contract: candidates ≪ n²). Brute-force n² never happens.
  *  - SimHash: narrow signature projection; near-dup = band-bucket join on
  *    signature prefixes, hamming-verified.
  *  - Embedding near-dup: brute force is the correctness baseline;
  *    [[Similarity]] provides the bucketed scale path.
  *
  * All hashing uses md5 hex (deterministic, engine-portable) — no
  * engine-specific hash functions, so DuckDB oracles reproduce signatures
  * bit-for-bit.
  */
object Dedup {

  // ------------------------------------------------------------------ exact

  /** Exact dedup: keep the lowest id per distinct text digest. */
  def exactSurvivors(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("digest"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /** Exact-duplicate pairs (id_kept, id_dropped). */
  def exactPairs(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val d = df.select(md5(col(textCol)).as("digest"), col(idCol))
    val kept = d.groupBy("digest").agg(min(col(idCol)).as("id_kept"))
    d.join(kept, "digest")
      .where(col(idCol) =!= col("id_kept"))
      .select(col("id_kept"), col(idCol).as("id_dropped"))
  }

  // --------------------------------------------------------------- shingles

  /** Word n-gram shingles (space-joined), distinct. */
  def shingles(text: Column, n: Int): Column = {
    val ws = TextAnalysis.words(text)
    array_distinct(
      transform(sequence(lit(0), size(ws) - n),
        i => concat_ws(" ", slice(ws, i + 1, lit(n)))))
  }

  /** Jaccard similarity of two (distinct) shingle arrays. */
  def jaccard(a: Column, b: Column): Column =
    round(size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double"), 6)

  // ---------------------------------------------------------------- minhash

  /** MinHash signature: k independent permutations approximated by keyed
    * md5; element i = min over shingles of md5("i:shingle"). Narrow, O(n·k).
    */
  def minhashSignature(shinglesCol: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(shinglesCol,
        s => md5(concat(i.cast("string"), lit(":"), s)))))

  /** Estimated Jaccard from two signatures: fraction of agreeing elements. */
  def minhashSimilarity(sigA: Column, sigB: Column): Column =
    round(size(filter(zip_with(sigA, sigB, (a, b) => a === b), x => x))
      .cast("double") / size(sigA).cast("double"), 6)

  /** LSH band keys: signature split into `bands` bands of `rows` elements;
    * band j key = md5 of the joined slice. Docs sharing any (band, key)
    * bucket become candidate pairs. */
  def lshBandKeys(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      j => md5(concat_ws(",", slice(sig, j * lit(rows) + 1, lit(rows)))))

  /** Full MinHash+LSH near-dup pipeline: returns verified candidate pairs
    * `(id_a, id_b, jaccard)` with id_a < id_b and true Jaccard ≥ threshold.
    *
    * Stages: shingle+sign (narrow) → explode band keys (×bands) → self-join
    * on (band, key) → distinct pairs → verify true Jaccard on the pair's
    * shingle sets. Only the band keys and candidate ids shuffle.
    */
  def minhashNearDups(
      df: DataFrame, textCol: String, idCol: String,
      shingleN: Int = 3, k: Int = 12, bands: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    val rows = k / bands
    val base = df.select(
      col(idCol).as("id"),
      shingles(col(textCol), shingleN).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), k))
    val banded = base.select(col("id"),
        posexplode(lshBandKeys(col("sig"), bands, rows)).as(Seq("band", "key")))
    val cands = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
        col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    val withSh = cands
      .join(base.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(base.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
    withSh.select(col("id_a"), col("id_b"),
        jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Blocked n-gram Jaccard near-dup (no LSH): candidate pairs share a cheap
    * blocking key (language + length bucket), then exact Jaccard filters.
    * The blocking keeps the pair count ≪ n² — the portable baseline the LSH
    * path is validated against. */
  def ngramJaccardPairs(
      df: DataFrame, textCol: String, idCol: String,
      shingleN: Int = 3, threshold: Double = 0.3,
      lenBucket: Int = 50): DataFrame = {
    val base = df.select(
      col(idCol).as("id"),
      (length(col(textCol)) / lenBucket).cast("long").as("blk"),
      shingles(col(textCol), shingleN).as("sh"))
    base.as("x").join(base.as("y"),
        col("x.blk") === col("y.blk") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        jaccard(col("x.sh"), col("y.sh")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  // ---------------------------------------------------------------- simhash

  /** Number of SimHash bits (60 = 15 md5 hex nibbles, fits a signed long). */
  val SimhashBits = 60

  /** 60-bit word hash from md5 hex nibbles (portable integer arithmetic:
    * nibble value × 16^position over the first 15 hex chars — reproducible
    * nibble-by-nibble in any engine with md5 + instr). */
  private def wordHash60(w: Column): Column = {
    val hex = md5(w)
    (0 until 15).map { j =>
      (instr(lit("0123456789abcdef"), substring(hex, j + 1, 1)) - 1)
        .cast("long") * (1L << (4 * (14 - j)))
    }.reduce(_ + _)
  }

  /** SimHash-60 signature: per-bit majority vote over word hashes. */
  def simhash(text: Column): Column = {
    val ws = TextAnalysis.words(text)
    val nWords = size(ws)
    val bitCounts = aggregate(
      ws,
      array_repeat(lit(0), SimhashBits),
      (acc, w) => {
        val h = wordHash60(w)
        val bits = array((0 until SimhashBits).map(b =>
          shiftright(h, b).bitwiseAND(1).cast("int")): _*)
        zip_with(acc, bits, (c, x) => c + x)
      })
    (0 until SimhashBits).map { b =>
      when(element_at(bitCounts, b + 1) * 2 > nWords, lit(1L << b)).otherwise(0L)
    }.reduce(_ + _)
  }

  /** SimHash near-dup pairs: block on the top `prefixBits` bits (cheap LSH
    * on the signature prefix), verify hamming distance ≤ maxHamming. */
  def simhashNearDups(
      df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 12, prefixBits: Int = 8): DataFrame = {
    val base = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sh"))
      .withColumn("blk", shiftright(col("sh"), 60 - prefixBits))
    base.as("x").join(base.as("y"),
        col("x.blk") === col("y.blk") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        bit_count(col("x.sh").bitwiseXOR(col("y.sh"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  // ------------------------------------------------------------- embeddings

  /** Embedding near-dup: pairs with cosine ≥ threshold (brute force — the
    * correctness baseline; see [[Similarity]] for the bucketed scale path).
    */
  def embeddingNearDups(
      df: DataFrame, vecCol: String, idCol: String,
      threshold: Double): DataFrame = {
    val base = df.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
    base.as("x").join(base.as("y"), col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        Similarity.cosine(col("x.v"), col("y.v")).as("cos"))
      .where(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"))
  }
}
