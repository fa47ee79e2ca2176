package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus REAL decode / feature-extract / resize /
  * frame-sample operators built on the JDK's own codecs — `javax.imageio`
  * (BMP, 24-bit uncompressed) for images and video frames,
  * `javax.sound.sampled` (WAVE, PCM16 mono) for audio, and a tiny
  * length-prefixed frame container for video. No external dependency; the
  * bytes on the wire are genuine BMP/WAV files any other tool can open.
  *
  * Test substrate: [[mediaFromDocuments]] SYNTHESIZES payloads
  * deterministically from `doc_id % 192` — every dimension, frame count and
  * duration is an arithmetic function of the id, so a SQL oracle can verify
  * the real decode round-trip analytically (encode in Spark, decode with the
  * JDK codec, compare against the closed-form size/shape formulas).
  * Distinct seeds embed the seed in the pixel/sample content, so seed ↔
  * payload is bijective: exact-dedup semantics stay testable (ids sharing a
  * seed are byte-identical duplicates).
  *
  * Scale: decode is a narrow mapPartitions — no shuffle; bytes never leave
  * their partition; codec state is initialized once per partition. Feature
  * extraction should run *after* any dedup (cheap filter first) and project
  * away the bytes as early as possible.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRecord(
      media_id: Long,
      media_type: String, // "image" | "audio" | "video"
      bytes: Array[Byte],
      source: String)

  /** Extracted features — every numeric field is read back out of the
    * payload by a real decoder, never echoed from metadata. */
  final case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Int,
      width: Int,
      height: Int,
      duration_ms: Long,
      digest: String)

  /** Fallible decode: `ok=false` rows carry the failure in `error` with
    * zeroed features (digest is still computed — it only needs bytes). */
  final case class MediaDecodeResult(
      media_id: Long,
      media_type: String,
      ok: Boolean,
      error: String,
      n_bytes: Int,
      width: Int,
      height: Int,
      duration_ms: Long,
      digest: String)

  /** One sampled frame of a video payload: a standalone BMP image. */
  final case class Frame(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** Decoder boundary: one instance per partition (models an expensive
    * codec/JNI handle initialized once and reused across the batch). */
  trait MediaDecoder extends Serializable {
    def decode(r: MediaRecord): MediaFeatures
  }

  object MediaDecoder {
    /** The JDK codec: ImageIO for images and video frames, the sampled
      * audio stack for WAV. Throws `IllegalArgumentException` naming the
      * media_id on undecodable bytes — use [[extractFeaturesSafe]] for a
      * non-throwing error channel. */
    object Jdk extends MediaDecoder {
      def decode(r: MediaRecord): MediaFeatures =
        try {
          val (w, h, d) = r.media_type match {
            case "image" =>
              val (iw, ih) = MediaCodec.decodeImage(r.bytes)
              (iw, ih, 0L)
            case "audio" =>
              (0, 0, MediaCodec.decodeAudioDurationMs(r.bytes))
            case "video" =>
              val v = MediaCodec.decodeVideoHeader(r.bytes)
              (v.width, v.height, v.frameCount.toLong * v.intervalMs)
            case other =>
              throw new IllegalArgumentException(s"unknown media_type $other")
          }
          MediaFeatures(r.media_id, r.media_type, r.bytes.length, w, h, d,
            MediaCodec.md5Hex(r.bytes))
        } catch {
          case e: Exception => throw new IllegalArgumentException(
            s"media_id ${r.media_id} (${r.media_type}): undecodable payload" +
              s" — ${e.getClass.getSimpleName}: ${e.getMessage}", e)
        }
    }
  }

  /** Synthesize a REAL media table from the documents table: every payload
    * is a decodable BMP / WAV / frame-container whose shape parameters
    * derive from `seed = doc_id mod 192` (192 = lcm(3, 64): ids sharing a
    * seed share a media_type AND a byte-identical payload — the duplicate
    * structure exact dedup tests ride on).
    *
    * Closed-form contract (what a SQL oracle can recompute per id):
    *  - type:  seed%3 → 0 image, 1 audio, 2 video
    *  - image: w = 16+seed%32, h = 16+(seed/2)%32, bytes = 54+h·⌈3w/4⌉·4
    *  - audio: frames = 800+(seed%100)·8 @8 kHz → ms = 100+seed%100,
    *           bytes = 44+2·frames
    *  - video: n = 2+seed%4 frames @40 ms, fw = 16+seed%16,
    *           fh = 16+(seed/2)%16, bytes = 12+n·(4+bmp(fw,fh))
    */
  /** Minimum rows a synthesis/decode slice should carry. Sizing slices
    * to cores alone OVERSPLITS a small corpus: at 32 cores and 5 k docs
    * each slice held ~150 rows, and the 32-way fragmentation followed
    * the persisted media into all three hash paths — per-task overhead
    * and concurrent decode-allocation spikes made 32 cores SLOWER than 8
    * (measured 5.2–8.4 s vs 3.1–4.1 warm on `mm_media_clusters`; the
    * round-9 verdict's variance band). At corpus scale (rows ≫
    * cores·floor) the count clamps to `defaultParallelism` either way —
    * the floor only changes the small end.
    *
    * r17 adjudication (the r16-VERDICT slice-floor item): PINNED at
    * 1000. The AbProbeR17 interleaved A/B (8 reps, sf0.1/32,
    * plans/r17/ab_adjudications.json) read floor 250/100 better on min
    * AND median for `mm_frame_match` (1.10/1.12 vs 1.47 min) with the
    * full-corpus `slice2` guard arm neutral — but the bands overlap
    * wall-to-wall (readings 1.1–4.7 s within single arms), and a
    * floor-250 build REGRESSED both mm queries in clean WarmBench
    * context (frame_match 1.35 → 2.65 warm-min with 2.6–5.2 s variance,
    * media_clusters 1.89 → 2.20–3.26) on a session whose control read
    * BETTER than the floor-1000 baseline's — the r9 concurrent-decode
    * allocation-spike mechanism, visible only under the bench's
    * sustained load, not in an isolated probe. Overlapping bands ⇒ the
    * current value stands (the adjudication rule). */
  val MinRowsPerSlice = 1000L

  def mediaFromDocuments(docs: DataFrame, parallelism: Int = 0): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val slices =
      if (parallelism > 0) parallelism
      else {
        // one column-less count (parquet metadata-cheap) sizes the slices
        val n = docs.count()
        math.max(1L, math.min(spark.sparkContext.defaultParallelism.toLong,
          (n + MinRowsPerSlice - 1) / MinRowsPerSlice)).toInt
      }
    // repartition BEFORE synthesis: what shuffles is 16-byte id rows, and
    // what it buys is codec parallelism — a small parquet source arrives
    // as ONE partition, which would serialize all encode work onto one
    // core (measured 3x on the phash query at sf0.1)
    docs.select(col("doc_id"), col("source"))
      .repartition(slices)
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, source) =>
          val seed = (((id % 192) + 192) % 192).toInt
          seed % 3 match {
            case 0 =>
              val w = 16 + seed % 32
              val h = 16 + (seed / 2) % 32
              MediaRecord(id, "image", MediaCodec.encodeBmp(w, h, seed), source)
            case 1 =>
              val frames = 800 + (seed % 100) * 8
              MediaRecord(id, "audio", MediaCodec.encodeWav(frames, seed), source)
            case _ =>
              val n = 2 + seed % 4
              val fw = 16 + seed % 16
              val fh = 16 + (seed / 2) % 16
              MediaRecord(id, "video",
                MediaCodec.encodeVideo(n, 40, fw, fh, seed), source)
          }
        }
      }
      .toDF()
  }

  /** Batch feature extraction through a real decoder: decoder constructed
    * once per partition, applied across the partition's rows. Throws on
    * undecodable bytes — the strict path for pipelines that treat corrupt
    * media upstream; see [[extractFeaturesSafe]] for the tolerant one. */
  def extractFeatures(media: Dataset[MediaRecord],
      decoder: MediaDecoder = MediaDecoder.Jdk)(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      val d = decoder // per-partition init point for codec handles
      it.map(d.decode)
    }
  }

  /** Tolerant feature extraction: corrupt payloads become `ok=false` rows
    * carrying the decode error instead of failing the job — at corpus scale
    * some fraction of scraped media is always undecodable, and one bad blob
    * must not kill a 100 TB pass. Same narrow, partition-local shape. */
  def extractFeaturesSafe(media: Dataset[MediaRecord],
      decoder: MediaDecoder = MediaDecoder.Jdk)(
      implicit spark: SparkSession): Dataset[MediaDecodeResult] = {
    import spark.implicits._
    media.mapPartitions { it =>
      val d = decoder
      it.map { r =>
        try {
          val f = d.decode(r)
          MediaDecodeResult(f.media_id, f.media_type, ok = true, error = "",
            f.n_bytes, f.width, f.height, f.duration_ms, f.digest)
        } catch {
          case e: Exception =>
            MediaDecodeResult(r.media_id, r.media_type, ok = false,
              error = s"${e.getClass.getSimpleName}: ${e.getMessage}",
              r.bytes.length, 0, 0, 0L, MediaCodec.md5Hex(r.bytes))
        }
      }
    }
  }

  /** Frame sampling for video payloads: parse the container, keep every
    * `everyN`-th frame. Each emitted frame is a standalone, decodable BMP —
    * the input to a downstream embed/caption stage. Narrow flatMap. */
  def sampleFrames(media: Dataset[MediaRecord], everyN: Int)(
      implicit spark: SparkSession): Dataset[Frame] = {
    require(everyN >= 1, s"everyN must be >= 1, got $everyN")
    import spark.implicits._
    media.filter(_.media_type == "video").flatMap { r =>
      MediaCodec.videoFrames(r.bytes).zipWithIndex.collect {
        case (bs, i) if i % everyN == 0 => Frame(r.media_id, i, bs)
      }
    }
  }

  /** Per-image 64-bit perceptual hash: images only, narrow mapPartitions
    * over the decoded payloads (see [[MediaCodec.phash]]). The 8-byte
    * hash is what shuffles downstream — bytes never leave the partition. */
  def imagePhash(media: Dataset[MediaRecord])(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.filter(_.media_type == "image")
      .mapPartitions(it => it.map(r =>
        (r.media_id, attributed(r)(MediaCodec.phash(r.bytes)))))
      .toDF("media_id", "phash")
  }

  /** Re-raise a decode failure with the owning row named — the same
    * attribution contract as [[MediaDecoder.Jdk]]. Hash operators are
    * strict by design: run [[extractFeaturesSafe]] FIRST on scraped
    * corpora and feed only `ok` rows to the near-dup passes. */
  private def attributed[A](r: MediaRecord)(body: => A): A =
    try body catch {
      case e: Exception => throw new IllegalArgumentException(
        s"media_id ${r.media_id} (${r.media_type}): undecodable payload" +
          s" — ${e.getClass.getSimpleName}: ${e.getMessage}", e)
    }

  /** Per-audio 64-bit spectral fingerprint: audio only, narrow
    * mapPartitions over the decoded PCM (see
    * [[MediaCodec.audioFingerprint]]). */
  def audioFingerprints(media: Dataset[MediaRecord])(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.filter(_.media_type == "audio")
      .mapPartitions(it => it.map(r =>
        (r.media_id, attributed(r)(MediaCodec.audioFingerprint(r.bytes)))))
      .toDF("media_id", "fp")
  }

  /** Exact-recall Hamming banding core, shared by [[phashNearDups]] /
    * [[audioNearDups]] / [[videoNearDups]] (pair identity = one id) and
    * [[frameMatches]] (pair identity = (video id, frame idx)): the 64-bit
    * hash splits into `bands` equal slices; a pair differing in
    * ≤ bands−1 bits leaves at least one slice untouched (pigeonhole), so
    * candidates = pairs sharing (band index, band value[, extraKeys]) —
    * EXACT recall at `maxHamming` ≤ bands−1, no probabilistic misses.
    * One band-key shuffle of 8-byte hashes; the distinct dedups
    * multi-band meetings. `bands` is the smallest power of two >
    * `maxHamming` (band width divides 64), so tighter thresholds shuffle
    * fewer, longer bands.
    *
    * Hot-bucket guard (`maxBucket > 0`): at maxHamming=7 the bucket key
    * space is only bands × 2^bandBits = 2,048 buckets, so a large corpus
    * puts millions of rows in one (band, value) bucket and the plain
    * self-join makes ONE task emit m² candidates — the skew degeneration
    * the text SimHash path already engineered away. With a cap, each
    * oversized bucket sub-splits into ⌈m/maxBucket⌉ groups and every
    * upper-triangle group cell becomes its own join key (the same exact
    * block-grid as [[Dedup.simhashNearDups]]); per-task candidate output
    * is bounded by maxBucket² and the pair set is IDENTICAL to the
    * uncapped join (MultimodalSpec asserts identity on a skewed corpus).
    * Bucket sizes join back on the bucket key, never broadcast — at
    * bands=1 (maxHamming=0) the value space is the full 64-bit hash, so
    * the size frame is data-sized, unlike simhash's ≤2^prefixBits.
    *
    * Eager contract: the returned PAIR frame is persisted and counted
    * here so the banded-hash frame (corpus-hash-sized, fed by the whole
    * DECODE pipeline) can be unpersisted before returning — a library
    * caller accumulates at most pair-list-sized caches, and owns the
    * single returned handle (unpersist it after consumption; the session
    * loop's clearCache also drops it). Emits `a_<c>`/`b_<c>` per pair
    * column (ordered a < b on the first) plus `hamming`. */
  private[graft] def bandedHammingPairs(hashes: DataFrame, hashCol: String,
      maxHamming: Int, pairCols: Seq[String], extraKeys: Seq[String],
      maxBucket: Int,
      shape: DataFrame => DataFrame = identity,
      eager: Boolean = true): DataFrame = {
    val (shaped, release) = bandedHammingPairsDeferred(hashes, hashCol,
      maxHamming, pairCols, extraKeys, maxBucket, shape)
    if (!eager) { release(); shaped } // plan-inspection path (specs)
    else {
      val out = shaped.persist()
      // if materialization fails the caller never receives the handle, so
      // release `out` here — only a successful count transfers ownership
      try { out.count(); out }
      catch { case e: Throwable => out.unpersist(); throw e }
      finally release()
    }
  }

  /** [[bandedHammingPairs]] with the materialization barrier handed to
    * the CALLER: returns the lazy shaped pair frame plus a release thunk
    * for the banded-hash cache. A composition unioning several banding
    * paths materializes them all under ONE action (independent subtrees
    * schedule concurrently inside one job) instead of paying one eager
    * `count()` barrier per path — the caller MUST materialize the pair
    * frame before invoking release, or the self-join recomputes the
    * decode pipeline uncached (the round-7 scale-killer). */
  private[graft] def bandedHammingPairsDeferred(hashes: DataFrame,
      hashCol: String, maxHamming: Int, pairCols: Seq[String],
      extraKeys: Seq[String], maxBucket: Int,
      shape: DataFrame => DataFrame = identity)
      : (DataFrame, () => Unit) = {
    require(maxHamming >= 0 && maxHamming < 32, s"bad maxHamming $maxHamming")
    val bands = Seq(1, 2, 4, 8, 16, 32).find(_ > maxHamming).get
    val bandBits = 64 / bands
    val mask = if (bandBits == 64) -1L else (1L << bandBits) - 1L
    val ord = pairCols.head
    val keep = (pairCols ++ extraKeys :+ hashCol).map(col)
    // persist: the self-join reads both sides of this frame, and upstream
    // is the DECODE+hash pipeline — without the cache every banding call
    // would decode the corpus twice (simhashNearDups precedent)
    val h = hashes
      .withColumn("_bands", array((0 until bands).map(j =>
        shiftrightunsigned(col(hashCol), j * bandBits)
          .bitwiseAND(lit(mask))): _*))
      .select(keep :+ posexplode(col("_bands")).as(Seq("_b", "_v")): _*)
      .persist()
    val bucketKeys = Seq("_b", "_v") ++ extraKeys
    val hamming =
      bit_count(col(s"x.$hashCol").bitwiseXOR(col(s"y.$hashCol")))
        .as("hamming")
    val cand =
      if (maxBucket <= 0) {
        val joinCond = bucketKeys.map(k => col(s"x.$k") === col(s"y.$k"))
          .reduce(_ && _) && col(s"x.$ord") < col(s"y.$ord")
        h.as("x").join(h.as("y"), joinCond)
          .select(pairCols.map(c => col(s"x.$c").as(s"a_$c")) ++
            pairCols.map(c => col(s"y.$c").as(s"b_$c")) :+ hamming: _*)
      } else {
        // sizes are a same-keyed aggregate joined back on the bucket key
        val sizes = h.groupBy(bucketKeys.map(col): _*)
          .agg(count(lit(1)).as("_m"))
          .select(bucketKeys.map(col) :+
            ceil(col("_m") / maxBucket).cast("int").as("_nsub"): _*)
        // type-agnostic sub-group hash over the full pair identity (a
        // frame-level row is (video, frame), not just the video id)
        val sub = h.join(sizes, bucketKeys)
          .withColumn("_g",
            pmod(xxhash64(pairCols.map(col): _*), col("_nsub")).cast("int"))
        // row with sub-group g is the LEFT member of cells (g, j), j ≥ g,
        // and the RIGHT member of cells (i, g), i ≤ g — each unordered
        // pair meets in exactly one cell per shared bucket; the diagonal
        // holds both orientations, dropped to one by the ord filter
        val gridCols = (bucketKeys ++ pairCols ++ Seq(hashCol)).distinct.map(col)
        val xrep = sub.select(gridCols ++ Seq(col("_g").as("_ci"),
          explode(sequence(col("_g"), col("_nsub") - 1)).as("_cj")): _*)
        val yrep = sub.select(gridCols ++ Seq(
          explode(sequence(lit(0), col("_g"))).as("_ci"),
          col("_g").as("_cj")): _*)
        // off-diagonal cells fix orientation by sub-group, not by ord, so
        // pairs arrive in either order — normalize with a per-column swap
        // keyed on the ordering column (all pair columns swap together)
        val fwd = col(s"x.$ord") < col(s"y.$ord")
        val joinCond = (bucketKeys ++ Seq("_ci", "_cj"))
          .map(k => col(s"x.$k") === col(s"y.$k")).reduce(_ && _) &&
          (col("x._ci") < col("x._cj") || col(s"x.$ord") < col(s"y.$ord")) &&
          col(s"x.$ord") =!= col(s"y.$ord")
        xrep.as("x").join(yrep.as("y"), joinCond)
          .select(pairCols.map(c =>
            when(fwd, col(s"x.$c")).otherwise(col(s"y.$c")).as(s"a_$c")) ++
            pairCols.map(c =>
              when(fwd, col(s"y.$c")).otherwise(col(s"x.$c")).as(s"b_$c")) :+
            hamming: _*)
      }
    val shaped = shape(cand.where(col("hamming") <= maxHamming).distinct())
    (shaped, () => { h.unpersist(); () })
  }

  /** [[bandedHammingPairs]] specialized to one-id pair identity, emitting
    * the (id_a, id_b, hamming) near-dup shape. */
  private def hammingNearDups(hashes: DataFrame, hashCol: String,
      maxHamming: Int, extraKeys: Seq[String] = Nil,
      maxBucket: Int = 0): DataFrame =
    bandedHammingPairs(hashes, hashCol, maxHamming,
      pairCols = Seq("media_id"), extraKeys = extraKeys,
      maxBucket = maxBucket,
      shape = _.select(col("a_media_id").as("id_a"),
        col("b_media_id").as("id_b"), col("hamming")))

  /** Perceptual near-duplicate pairs over the image subset: the visual
    * analog of SimHash dedup — re-encoded/re-scaled copies of an image
    * land within a few pHash bits, found WITHOUT the all-pairs join
    * (see [[hammingNearDups]] for the exact-recall banding). */
  def phashNearDups(media: Dataset[MediaRecord], maxHamming: Int,
      maxBucket: Int = 0)(
      implicit spark: SparkSession): DataFrame =
    hammingNearDups(imagePhash(media)(spark), "phash", maxHamming,
      maxBucket = maxBucket)

  /** Spectral near-duplicate pairs over the audio subset: re-encoded or
    * volume-rescaled copies of a recording share the fingerprint
    * (uniform gain is EXACTLY invariant), unrelated recordings differ in
    * ~half the bits. Same exact-recall banding as the image path. */
  def audioNearDups(media: Dataset[MediaRecord], maxHamming: Int,
      maxBucket: Int = 0)(
      implicit spark: SparkSession): DataFrame =
    hammingNearDups(audioFingerprints(media)(spark), "fp", maxHamming,
      maxBucket = maxBucket)

  /** Per-video folded signature: videos only, narrow mapPartitions (see
    * [[MediaCodec.videoSignature]]). */
  def videoSignatures(media: Dataset[MediaRecord])(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.filter(_.media_type == "video")
      .mapPartitions(it => it.map { r =>
        val (n, h) = attributed(r)(MediaCodec.videoSignature(r.bytes))
        (r.media_id, n, h)
      })
      .toDF("media_id", "n_frames", "vsig")
  }

  /** Near-duplicate pairs over the video subset: frame-count equality is
    * a hard pre-filter (an extra banding key), then the folded
    * per-frame-pHash signature pairs within `maxHamming` — videos whose
    * every frame is a visual near-dup of its counterpart stay close
    * (XOR linearity bounds the folded distance by the summed per-frame
    * drift), unrelated videos land ~32 bits apart. */
  def videoNearDups(media: Dataset[MediaRecord], maxHamming: Int,
      maxBucket: Int = 0)(
      implicit spark: SparkSession): DataFrame =
    hammingNearDups(videoSignatures(media)(spark), "vsig", maxHamming,
      extraKeys = Seq("n_frames"), maxBucket = maxBucket)

  /** All three modality near-dup pair lists ([[phashNearDups]] ∪
    * [[audioNearDups]] ∪ [[videoNearDups]]) materialized under ONE
    * action: the banding paths are independent subtrees of a single
    * union plan, so their decode/hash/join stages schedule CONCURRENTLY
    * inside one job instead of paying three serial eager `count()`
    * barriers — at high core counts the serial barriers are pure
    * per-stage scheduling overhead (the r8 `mm_media_clusters` 32-cpu
    * inversion). Pair set identical to the three separate calls; the
    * returned frame is persisted + counted and the caller owns the
    * single pair-sized handle (banded-hash caches released here). */
  def mediaNearDupPairs(media: Dataset[MediaRecord], maxHamming: Int,
      maxBucket: Int = 0)(
      implicit spark: SparkSession): DataFrame = {
    // ONE banding pass over all three modalities (r16 optimization,
    // guide §2.4 — remove shuffles outright): the three per-type hash
    // frames union into a single (media_id, h) frame keyed by a type
    // ordinal, and the type joins the banding's bucket key — pairs only
    // ever form within a modality, exactly as the three separate
    // passes produced (ids are type-disjoint, so the union's pair set
    // is the same set; MultimodalSpec pins equality). Replaces three
    // banded self-joins + three hash-frame persists + a union of three
    // pair frames with one self-join over one persisted hash frame:
    // 3 banding exchanges → 1 (same bytes shuffled in total), ~half the
    // scheduler barriers. `n_frames` stays a real banding key for
    // videos and is a constant 0 for image/audio (no extra constraint).
    val hashes = imagePhash(media)(spark)
      .select(col("media_id"), col("phash").as("h"),
        lit(0).as("mt"), lit(0).as("n_frames"))
      .unionByName(audioFingerprints(media)(spark)
        .select(col("media_id"), col("fp").as("h"),
          lit(1).as("mt"), lit(0).as("n_frames")))
      .unionByName(videoSignatures(media)(spark)
        .select(col("media_id"), col("vsig").as("h"),
          lit(2).as("mt"), col("n_frames")))
    bandedHammingPairs(hashes, "h", maxHamming,
      pairCols = Seq("media_id"), extraKeys = Seq("mt", "n_frames"),
      maxBucket = maxBucket,
      shape = _.select(col("a_media_id").as("id_a"),
        col("b_media_id").as("id_b"), col("hamming")))
  }

  /** Per-image channel statistics from the DECODED raster: exact integer
    * sums of the R/G/B bytes (24-bit BMP is lossless, so every pixel
    * byte round-trips) — the per-channel brightness profile a curation
    * pass filters on, and the deepest codec check available: an oracle
    * that recomputes the sums from the generation formulas verifies
    * EVERY pixel through encode→decode, not just the dimensions. */
  def imageStats(media: Dataset[MediaRecord])(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.filter(_.media_type == "image")
      .mapPartitions(it => it.map { r =>
        attributed(r) {
          val img = MediaCodec.readImage(r.bytes)
          // bulk conversion: one getRGB(0,0,w,h,..) call instead of a
          // per-pixel ColorModel round trip
          val w = img.getWidth; val h = img.getHeight
          val px = img.getRGB(0, 0, w, h, null, 0, w)
          var sr = 0L; var sg = 0L; var sb = 0L
          var i = 0
          while (i < px.length) {
            val rgb = px(i)
            sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
            i += 1
          }
          (r.media_id, w.toLong * h, sr, sg, sb)
        }
      })
      .toDF("media_id", "n_px", "sum_r", "sum_g", "sum_b")
  }

  /** Per-audio sample statistics from the DECODED PCM: exact integer
    * count/sum/abs-sum — the clipping/DC-offset profile, and the audio
    * twin of [[imageStats]]'s every-byte round-trip check. */
  def pcmStats(media: Dataset[MediaRecord])(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.filter(_.media_type == "audio")
      .mapPartitions(it => it.map { r =>
        attributed(r) {
          val s = MediaCodec.decodePcm16(r.bytes)
          var sum = 0L; var sabs = 0L
          var i = 0
          while (i < s.length) {
            val v = s(i).toLong; sum += v; sabs += math.abs(v); i += 1
          }
          (r.media_id, s.length.toLong, sum, sabs)
        }
      })
      .toDF("media_id", "n_samples", "sum_amp", "sum_abs")
  }

  /** Per-frame perceptual hashes of every video: the substrate for
    * frame-level copy detection. Narrow flatMap; only (id, idx, hash)
    * rows leave the partition. */
  def videoFramePhashes(media: Dataset[MediaRecord])(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.filter(_.media_type == "video")
      .flatMap(r => attributed(r) {
        MediaCodec.videoFrames(r.bytes).zipWithIndex.map {
          case (f, k) => (r.media_id, k, MediaCodec.phash(f))
        }
      })
      .toDF("media_id", "frame_idx", "fhash")
  }

  /** Frame-level video copy detection (sub-clip matching): for each
    * video pair, the number of cross-video frame pairs whose perceptual
    * hashes sit within `maxHamming` — finds videos sharing material even
    * when lengths differ or shared frames sit at different offsets
    * (unlike [[videoNearDups]], which matches whole videos). Same
    * exact-recall pigeonhole banding, applied at frame granularity; the
    * distinct() collapses multi-band meetings of one frame pair before
    * counting. At `maxHamming = 0` this is clean-copy detection: frames
    * match iff their 64-bit pHashes are identical. */
  def frameMatches(media: Dataset[MediaRecord], maxHamming: Int,
      maxBucket: Int = 0)(
      implicit spark: SparkSession): DataFrame =
    bandedHammingPairs(videoFramePhashes(media)(spark), "fhash", maxHamming,
      pairCols = Seq("media_id", "frame_idx"), extraKeys = Nil,
      maxBucket = maxBucket,
      shape = _.groupBy(col("a_media_id").as("id_a"),
          col("b_media_id").as("id_b"))
        .agg(count(lit(1)).as("n_matched_frames")))

  /** Image resize: images exceeding `maxW`×`maxH` are decoded, scaled to
    * the clamped box (min(w,maxW), min(h,maxH)) with Graphics2D, and
    * re-encoded as BMP; conforming images and non-image rows pass through
    * byte-identical. Narrow map; bytes stay in their partition. */
  def resize(media: Dataset[MediaRecord], maxW: Int, maxH: Int)(
      implicit spark: SparkSession): Dataset[MediaRecord] = {
    require(maxW >= 1 && maxH >= 1, s"bad box ${maxW}x$maxH")
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        if (r.media_type != "image") r
        else {
          val (w, h) = MediaCodec.decodeImage(r.bytes)
          if (w <= maxW && h <= maxH) r
          else r.copy(bytes =
            MediaCodec.resizeBmp(r.bytes, math.min(w, maxW), math.min(h, maxH)))
        }
      }
    }
  }
}

/** The JDK-backed codec behind [[Multimodal]]: encode/decode helpers that
  * produce genuine BMP / WAV / frame-container bytes with size formulas a
  * SQL oracle can recompute (24-bit uncompressed BMP = 54 + h·⌈3w/4⌉·4;
  * PCM16-mono WAV = 44 + 2·frames; container = 12 + Σ(4 + frame)).
  *
  * Deterministic by construction: pixel and sample content is an integer
  * function of (seed, position), the writers emit fixed headers, and the
  * probe round-trips (verified in MultimodalSpec against the formulas). */
object MediaCodec {
  import java.awt.image.BufferedImage
  import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
  import javax.imageio.ImageIO
  import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

  private val Magic: Array[Byte] = "GFV1".getBytes("US-ASCII")
  private val SampleRate = 8000

  def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString

  /** 24-bit BMP size: 54-byte header + rows padded to 4-byte multiples. */
  def bmpSize(w: Int, h: Int): Int = 54 + h * ((3 * w + 3) / 4 * 4)

  /** WAVE PCM16 mono size: 44-byte header + 2 bytes per frame. */
  def wavSize(frames: Int): Int = 44 + 2 * frames

  /** Encode a deterministic w×h 24-bit BMP (content keyed by `seed` so
    * distinct seeds give distinct bytes). */
  def encodeBmp(w: Int, h: Int, seed: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = (seed * 31 + x * 7 + y * 13) % 251
        val g = (seed * 17 + x * 11 + y * 3) % 251
        val b = (seed * 7 + x * 5 + y * 19) % 251
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream(bmpSize(w, h))
    ImageIO.write(img, "bmp", bos)
    bos.toByteArray
  }

  /** Decode any ImageIO-supported image to (width, height). */
  def decodeImage(bytes: Array[Byte]): (Int, Int) = {
    val img = readImage(bytes)
    (img.getWidth, img.getHeight)
  }

  /** Decode + scale + re-encode an image as `w`×`h` BMP. */
  def resizeBmp(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val src = readImage(bytes)
    val dst = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    val g = dst.createGraphics()
    try g.drawImage(src, 0, 0, w, h, null) finally g.dispose()
    val bos = new ByteArrayOutputStream(bmpSize(w, h))
    ImageIO.write(dst, "bmp", bos)
    bos.toByteArray
  }

  /** Encode `frames` PCM16 samples at 8 kHz mono as a WAV file (content
    * keyed by `seed`). `frames` divisible by 8 ⇒ integral milliseconds.
    *
    * The waveform is a square-wave CHIRP: the half-period starts at a
    * seed-keyed base and sweeps over a seed-keyed range every 200
    * samples. Distinct seeds get distinct (base, sweep) pairs — distinct
    * trajectories of frequency content over time — which is what a
    * spectral fingerprint keys on: a phase-only difference (the naive
    * `a + i·k mod m` ramp) is invisible to band energies, and a
    * STATIONARY tone zeroes every time-delta bit. Integer arithmetic
    * only, so payload bytes are platform-exact. */
  def encodeWav(frames: Int, seed: Int): Array[Byte] = {
    val base = 3 + seed % 29 // swept half-period 3..38 → ~105..1333 Hz
    val sweep = 1 + (seed / 29) % 7
    val data = new Array[Byte](frames * 2)
    var i = 0
    while (i < frames) {
      val half = base + (i / 200) % (sweep + 1)
      val s: Short = if ((i / half) % 2 == 0) 12000 else -12000
      data(2 * i) = (s & 0xff).toByte // little-endian PCM
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(SampleRate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(data), fmt, frames)
    val bos = new ByteArrayOutputStream(wavSize(frames))
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Decode a WAV payload to its exact duration in ms (frames·1000/rate). */
  def decodeAudioDurationMs(bytes: Array[Byte]): Long = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    try ais.getFrameLength * 1000L / ais.getFormat.getSampleRate.toLong
    finally ais.close()
  }

  /** Decode a PCM16-mono WAV payload to raw samples. */
  def decodePcm16(bytes: Array[Byte]): Array[Double] = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    try {
      val f = ais.getFormat
      if (f.getSampleSizeInBits != 16 || f.getChannels != 1)
        throw new IllegalArgumentException(
          s"expected PCM16 mono, got ${f.getSampleSizeInBits}-bit " +
            s"${f.getChannels}-channel")
      val raw = ais.readAllBytes()
      val out = new Array[Double](raw.length / 2)
      var i = 0
      while (i < out.length) {
        out(i) = ((raw(2 * i) & 0xff) | (raw(2 * i + 1) << 8)).toShort.toDouble
        i += 1
      }
      out
    } finally ais.close()
  }

  /** 64-bit spectral audio fingerprint (the Haitsma–Kalker 2002
    * sign-of-band-energy-differences construction, folded to one word):
    * decode → 17 time slices → per-slice Goertzel energy in 5 frequency
    * bands (250..1250 Hz at 8 kHz) → bit(t,b) = sign of the band-delta's
    * time-delta, 16×4 = 64 bits. Uniform volume scaling multiplies every
    * energy by the same factor, so the sign pattern — and the hash — is
    * EXACTLY invariant; unrelated signals differ in ~half the bits. */
  def audioFingerprint(bytes: Array[Byte]): Long = {
    val s = decodePcm16(bytes)
    if (s.length < 34)
      throw new IllegalArgumentException(s"too short for fingerprint: ${s.length}")
    val T = 17; val B = 5
    val slice = s.length / T
    val e = Array.ofDim[Double](T, B)
    var t = 0
    while (t < T) {
      var b = 0
      while (b < B) {
        // Goertzel at normalized frequency (b+1)/32 cycles per sample
        val w = 2.0 * math.Pi * (b + 1) / 32.0
        val coef = 2.0 * math.cos(w)
        var s1 = 0.0; var s2 = 0.0
        var i = t * slice
        val end = i + slice
        while (i < end) {
          val s0 = s(i) + coef * s1 - s2
          s2 = s1; s1 = s0; i += 1
        }
        e(t)(b) = s1 * s1 + s2 * s2 - coef * s1 * s2
        b += 1
      }
      t += 1
    }
    var h = 0L
    var bit = 0
    t = 1
    while (t < T) {
      var b = 0
      while (b < B - 1) {
        val d = (e(t)(b) - e(t)(b + 1)) - (e(t - 1)(b) - e(t - 1)(b + 1))
        if (d > 0) h |= (1L << bit)
        bit += 1; b += 1
      }
      t += 1
    }
    h
  }

  /** Decode any ImageIO-supported image, with the module's uniform
    * failure contract (null result → IllegalArgumentException). Every
    * image-decoding site routes through here so decode hardening lands
    * once. */
  def readImage(bytes: Array[Byte]): BufferedImage = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    if (img == null)
      throw new IllegalArgumentException("not a decodable image")
    img
  }

  /** pHash raster size; the DCT basis below derives from it. */
  private val PhashN = 32
  // DCT basis for [[phash]], hoisted: N*N cos() calls amortize across
  // every image and video frame instead of re-running per invocation
  private val phashCosTable: Array[Array[Double]] =
    Array.tabulate(PhashN, PhashN)((k, n) =>
      math.cos((2 * n + 1) * k * math.Pi / (2.0 * PhashN)))

  /** 64-bit DCT perceptual hash (classic pHash, Zauner 2010 construction):
    * decode → 32×32 grayscale → 2-D DCT-II → 8×8 low-frequency block →
    * bit i set iff coefficient i exceeds the block median. Two visually
    * similar images (same content re-scaled/re-encoded) land within a few
    * bits; unrelated images differ in ~32. Pure JVM double arithmetic on
    * the decoded raster — deterministic for a given payload. */
  def phash(bytes: Array[Byte]): Long = {
    val src = readImage(bytes)
    val N = PhashN
    val gray = new BufferedImage(N, N, BufferedImage.TYPE_BYTE_GRAY)
    val g = gray.createGraphics()
    try g.drawImage(src, 0, 0, N, N, null) finally g.dispose()
    val raster = gray.getRaster
    val px = Array.ofDim[Double](N, N)
    var y = 0
    while (y < N) {
      var x = 0
      while (x < N) { px(y)(x) = raster.getSample(x, y, 0).toDouble; x += 1 }
      y += 1
    }
    // separable DCT-II: rows then columns. The column pass reads only
    // the 8 low-frequency row outputs, so the row transform stops at 8 —
    // 3/4 of the row multiply-adds would be dead work.
    val cosT = phashCosTable
    val tmp = Array.ofDim[Double](N, 8)
    var k = 0
    while (k < 8) {
      var r = 0
      while (r < N) {
        var s = 0.0; var n = 0
        while (n < N) { s += px(r)(n) * cosT(k)(n); n += 1 }
        tmp(r)(k) = s; r += 1
      }
      k += 1
    }
    val coeff = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0; var n = 0
        while (n < N) { s += tmp(n)(u) * cosT(v)(n); n += 1 }
        coeff(v * 8 + u) = s; u += 1
      }
      v += 1
    }
    val med = { val srt = coeff.sorted; (srt(31) + srt(32)) / 2.0 }
    var h = 0L
    var i = 0
    while (i < 64) { if (coeff(i) > med) h |= (1L << i); i += 1 }
    h
  }

  /** 64-bit video signature: per-frame DCT pHashes folded by
    * XOR-of-rotations (frame k rotated left 13k mod 64 bits — rotation
    * makes the fold order-sensitive, so re-sequenced frames do NOT
    * collide). XOR is linear over GF(2), so the folded Hamming distance
    * is bounded by the SUM of per-frame pHash drifts: videos whose every
    * frame is a near-dup of its counterpart stay near; unrelated videos
    * land ~32 bits apart. Videos with different frame counts never pair
    * (the count is compared outside the hash). */
  def videoSignature(bytes: Array[Byte]): (Int, Long) = {
    val frames = videoFrames(bytes)
    var h = 0L
    var k = 0
    while (k < frames.length) {
      h ^= java.lang.Long.rotateLeft(phash(frames(k)), (13 * k) % 64)
      k += 1
    }
    (frames.length, h)
  }

  /** Video container header as decoded from the payload. `width`/`height`
    * come from REALLY decoding the first frame, not from the header. */
  final case class VideoMeta(frameCount: Int, intervalMs: Int,
      width: Int, height: Int)

  /** Encode `frameCount` deterministic BMP frames into the GFV1 container:
    * magic ++ int32 frameCount ++ int32 intervalMs ++
    * frameCount × (int32 length ++ BMP bytes), all big-endian. */
  def encodeVideo(frameCount: Int, intervalMs: Int, w: Int, h: Int,
      seed: Int): Array[Byte] = {
    val frames = (0 until frameCount).map(i => encodeBmp(w, h, seed + 997 * i))
    val size = 12 + frames.map(4 + _.length).sum
    val bb = java.nio.ByteBuffer.allocate(size)
    bb.put(Magic).putInt(frameCount).putInt(intervalMs)
    frames.foreach { f => bb.putInt(f.length); bb.put(f) }
    bb.array()
  }

  private def checkMagic(bytes: Array[Byte]): java.nio.ByteBuffer = {
    if (bytes.length < 12 || bytes(0) != Magic(0) || bytes(1) != Magic(1) ||
        bytes(2) != Magic(2) || bytes(3) != Magic(3))
      throw new IllegalArgumentException("not a GFV1 video container")
    java.nio.ByteBuffer.wrap(bytes, 4, bytes.length - 4)
  }

  /** Bounds-checked frame read: a corrupt length field must surface as a
    * catchable IllegalArgumentException, NOT a multi-GB allocation — an
    * OutOfMemoryError would blow straight through the safe decode path's
    * error channel and kill the pass one bad blob is not allowed to kill. */
  private def readFrame(bb: java.nio.ByteBuffer): Array[Byte] = {
    if (bb.remaining() < 4)
      throw new IllegalArgumentException("truncated container: no frame length")
    val len = bb.getInt()
    if (len < 0 || len > bb.remaining())
      throw new IllegalArgumentException(
        s"corrupt frame length $len (remaining ${bb.remaining()})")
    val f = new Array[Byte](len); bb.get(f)
    f
  }

  private def readCount(bb: java.nio.ByteBuffer, totalLen: Int): (Int, Int) = {
    val n = bb.getInt(); val interval = bb.getInt()
    // each frame needs at least its 4 length bytes
    if (n < 1 || n > (totalLen - 12) / 4)
      throw new IllegalArgumentException(s"corrupt frame count $n")
    (n, interval)
  }

  /** Parse the container and decode frame 0 for dimensions. */
  def decodeVideoHeader(bytes: Array[Byte]): VideoMeta = {
    val bb = checkMagic(bytes)
    val (n, interval) = readCount(bb, bytes.length)
    val (w, h) = decodeImage(readFrame(bb))
    VideoMeta(n, interval, w, h)
  }

  /** All frames of a container, in order, as standalone BMP byte arrays. */
  def videoFrames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val bb = checkMagic(bytes)
    val (n, _) = readCount(bb, bytes.length)
    (0 until n).map(_ => readFrame(bb))
  }
}
