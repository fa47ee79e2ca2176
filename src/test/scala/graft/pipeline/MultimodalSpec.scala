package graft.pipeline

import graft.SparkSpec
import graft.pipeline.Multimodal._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  // docs rows covering each media type and a duplicate-seed pair
  // (7 and 199 share seed 7; types: 6→image, 7→audio, 14→video)
  lazy val docs = Seq(6L, 7L, 14L, 199L, 200L)
    .map(id => (id, s"src$id")).toDF("doc_id", "source")
  lazy val media = mediaFromDocuments(docs).as[MediaRecord]

  test("synthesized payloads decode to the closed-form contract") {
    implicit val s = spark
    val f = extractFeatures(media).collect().map(x => x.media_id -> x).toMap
    // seed 6 image: w=16+6%32=22, h=16+3%32=19, bytes=54+19*((66+3)/4*4)
    assert(f(6L).media_type == "image")
    assert((f(6L).width, f(6L).height) == ((22, 19)))
    assert(f(6L).n_bytes == MediaCodec.bmpSize(22, 19) && f(6L).duration_ms == 0L)
    // seed 7 audio: frames=800+7*8=856 @8kHz → 107 ms, 44+2*856 bytes
    assert(f(7L).media_type == "audio")
    assert(f(7L).duration_ms == 107L && f(7L).n_bytes == MediaCodec.wavSize(856))
    assert((f(7L).width, f(7L).height) == ((0, 0)))
    // seed 14 video: n=2+14%4=4 frames @40ms → 160 ms; fw=16+14%16=30, fh=16+7%16=23
    assert(f(14L).media_type == "video")
    assert((f(14L).width, f(14L).height, f(14L).duration_ms) == ((30, 23, 160L)))
    assert(f(14L).n_bytes == 12 + 4 * (4 + MediaCodec.bmpSize(30, 23)))
    // the features really came from decoding: digest is the payload md5
    assert(f(6L).digest.length == 32)
  }

  test("seed-sharing ids are byte-identical duplicates; others differ") {
    val byId = media.collect().map(r => r.media_id -> r.bytes).toMap
    assert(java.util.Arrays.equals(byId(7L), byId(199L)),
      "doc 7 and 199 share seed 7 → exact duplicates")
    assert(!java.util.Arrays.equals(byId(7L), byId(200L)))
  }

  test("wav and bmp bytes are real files the JDK decodes independently") {
    val byId = media.collect().map(r => r.media_id -> r).toMap
    val (w, h) = MediaCodec.decodeImage(byId(6L).bytes)
    assert((w, h) == ((22, 19)))
    assert(MediaCodec.decodeAudioDurationMs(byId(7L).bytes) == 107L)
    val meta = MediaCodec.decodeVideoHeader(byId(14L).bytes)
    assert(meta == MediaCodec.VideoMeta(4, 40, 30, 23))
  }

  test("sampleFrames: every Nth container frame, each a decodable BMP") {
    implicit val s = spark
    val frames = sampleFrames(media, 2).collect()
    // two videos: 14 (seed 14: 4 frames, 30x23) and 200 (seed 8: 2 frames, 24x20)
    assert(frames.map(_.media_id).toSet == Set(14L, 200L), "videos only")
    val f14 = frames.filter(_.media_id == 14L).sortBy(_.frame_idx)
    assert(f14.map(_.frame_idx).toSeq == Seq(0, 2))
    f14.foreach { fr =>
      assert(MediaCodec.decodeImage(fr.frame_bytes) == ((30, 23)))
      assert(fr.frame_bytes.length == MediaCodec.bmpSize(30, 23))
    }
    val f200 = frames.filter(_.media_id == 200L)
    assert(f200.map(_.frame_idx).toSeq == Seq(0))
    assert(MediaCodec.decodeImage(f200.head.frame_bytes) == ((24, 20)))
    // frames differ (content is keyed by frame index)
    assert(!java.util.Arrays.equals(f14(0).frame_bytes, f14(1).frame_bytes))
  }

  test("resize clamps oversized images, passes the rest byte-identical") {
    implicit val s = spark
    val before = media.collect().map(r => r.media_id -> r.bytes).toMap
    val after = resize(media, maxW = 20, maxH = 64).collect()
      .map(r => r.media_id -> r.bytes).toMap
    // image 6 is 22x19 → clamped to 20x19 and still a real BMP
    assert(MediaCodec.decodeImage(after(6L)) == ((20, 19)))
    assert(after(6L).length == MediaCodec.bmpSize(20, 19))
    // audio/video untouched
    assert(java.util.Arrays.equals(after(7L), before(7L)))
    assert(java.util.Arrays.equals(after(14L), before(14L)))
  }

  test("decode is format-agnostic: PNG and JPEG payloads work unchanged") {
    implicit val s = spark
    // the synthesis side standardizes on BMP for its closed-form sizes,
    // but the DECODE side is plain ImageIO — scraped corpora arrive as
    // PNG/JPEG and must flow through the same operator
    def enc(fmt: String, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      img.setRGB(0, 0, 0x336699)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val mixed = Seq(
      MediaRecord(1L, "image", enc("png", 33, 21), "s"),
      MediaRecord(2L, "image", enc("jpg", 48, 12), "s")).toDS()
    val f = extractFeatures(mixed).collect().map(x => x.media_id -> x).toMap
    assert((f(1L).width, f(1L).height) == ((33, 21)))
    assert((f(2L).width, f(2L).height) == ((48, 12)))
    // and resize re-encodes them as BMP at the clamped box
    val r = resize(mixed, maxW = 16, maxH = 16)(s).collect()
      .map(x => x.media_id -> x.bytes).toMap
    assert(MediaCodec.decodeImage(r(1L)) == ((16, 16)))
    assert(r(1L).length == MediaCodec.bmpSize(16, 16))
  }

  test("phash: identical bytes collide, rescales stay near, others far") {
    // identical payloads → identical hash, trivially
    val a = MediaCodec.phash(MediaCodec.encodeBmp(40, 28, 9))
    val a2 = MediaCodec.phash(MediaCodec.encodeBmp(40, 28, 9))
    assert(a == a2)
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    // a rescaled copy of the SAME image stays within a few bits
    val orig = MediaCodec.encodeBmp(40, 28, 9)
    val small = MediaCodec.resizeBmp(orig, 24, 17)
    assert(ham(a, MediaCodec.phash(small)) <= 18,
      "rescale must not move the hash far")
    // a different image is far away (measured cross-seed floor is 14)
    val other = MediaCodec.phash(MediaCodec.encodeBmp(40, 28, 57))
    assert(ham(a, other) >= 14, s"got ${ham(a, other)}")
  }

  test("phashNearDups: banding finds exactly the brute-force pair set") {
    implicit val s = spark
    // corpus: 2 copies of seed 9, a rescaled seed-9 variant, 2 unrelated
    val recs = Seq(
      MediaRecord(1L, "image", MediaCodec.encodeBmp(40, 28, 9), "s"),
      MediaRecord(2L, "image", MediaCodec.encodeBmp(40, 28, 9), "s"),
      MediaRecord(3L, "image",
        MediaCodec.resizeBmp(MediaCodec.encodeBmp(40, 28, 9), 24, 17), "s"),
      MediaRecord(4L, "image", MediaCodec.encodeBmp(33, 21, 57), "s"),
      MediaRecord(5L, "image", MediaCodec.encodeBmp(20, 20, 114), "s"),
      MediaRecord(6L, "audio", MediaCodec.encodeWav(800, 1), "s")).toDS()
    val maxH = 18
    val got = phashNearDups(recs, maxH).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute force over the same hashes
    val hs = recs.collect().filter(_.media_type == "image")
      .map(r => r.media_id -> MediaCodec.phash(r.bytes))
    val brute = (for {
      (i, hi) <- hs; (j, hj) <- hs if i < j
      d = java.lang.Long.bitCount(hi ^ hj) if d <= maxH
    } yield (i, j, d)).toSet
    assert(got == brute, s"banding=$got brute=$brute")
    // and the dup structure is the expected one: 1-2 identical, 3 near
    assert(got.contains((1L, 2L, 0)))
    assert(got.exists(p => p._1 == 1L && p._2 == 3L))
    assert(!got.exists(p => p._2 == 4L || p._2 == 5L),
      "unrelated images must not pair at this threshold")
  }

  test("mediaNearDupPairs: one-pass banding equals the three per-type passes") {
    implicit val s = spark
    // ids 192.. duplicate seeds 0..19, so every modality holds dup pairs
    val corpus = ((0L until 40L) ++ (192L until 212L))
      .map(id => (id, s"src$id")).toDF("doc_id", "source")
    val m = mediaFromDocuments(corpus).as[MediaRecord].persist()
    try {
      val got = mediaNearDupPairs(m, maxHamming = 7)
      val expected = Seq(
        phashNearDups(m, 7), audioNearDups(m, 7), videoNearDups(m, 7))
      try {
        val gotSet = got.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
        val expSet = expected.flatMap(_.collect())
          .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
        assert(gotSet == expSet,
          s"one-pass=${gotSet.size} pairs, per-type=${expSet.size}")
        assert(gotSet.nonEmpty, "dup seeds must produce pairs")
      } finally { got.unpersist(); expected.foreach(_.unpersist()) }
    } finally m.unpersist()
  }

  test("audioFingerprint: gain-invariant, seed-separated, banding exact") {
    implicit val s = spark
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    val orig = MediaCodec.encodeWav(856, 7)
    // uniform volume scaling multiplies every band energy by the same
    // factor → the sign pattern is EXACTLY invariant, not just close
    val half = {
      val smp = MediaCodec.decodePcm16(orig)
      val data = new Array[Byte](smp.length * 2)
      for (i <- smp.indices) {
        val v = (smp(i) / 2).toInt.toShort
        data(2 * i) = (v & 0xff).toByte
        data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(data), fmt, smp.length),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val f0 = MediaCodec.audioFingerprint(orig)
    assert(ham(f0, MediaCodec.audioFingerprint(half)) == 0,
      "uniform gain must not move a single bit")
    // a different chirp is far away (measured cross-seed floor is 16)
    val f1 = MediaCodec.audioFingerprint(MediaCodec.encodeWav(856, 10))
    assert(ham(f0, f1) >= 16, s"got ${ham(f0, f1)}")
    // banding == brute force over a mixed corpus incl. the gain variant
    val recs = Seq(
      MediaRecord(1L, "audio", orig, "s"),
      MediaRecord(2L, "audio", orig, "s"),
      MediaRecord(3L, "audio", half, "s"),
      MediaRecord(4L, "audio", MediaCodec.encodeWav(856, 10), "s"),
      MediaRecord(5L, "image", MediaCodec.encodeBmp(8, 8, 1), "s")).toDS()
    val got = audioNearDups(recs, 7).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((1L, 2L, 0), (1L, 3L, 0), (2L, 3L, 0)),
      s"identical + gain-scaled pair up; the other chirp stays out: $got")
  }

  test("videoSignature: order-sensitive fold; near-dups respect frame count") {
    implicit val s = spark
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val v = MediaCodec.encodeVideo(4, 40, 24, 20, 8)
    val (n, sig) = MediaCodec.videoSignature(v)
    assert(n == 4 && MediaCodec.videoSignature(v) == ((4, sig)))
    // re-sequenced frames must NOT collide: build a container with the
    // same frames in reverse order
    val frames = MediaCodec.videoFrames(v).reverse
    val rev = {
      val size = 12 + frames.map(4 + _.length).sum
      val bb = java.nio.ByteBuffer.allocate(size)
      bb.put("GFV1".getBytes("US-ASCII")).putInt(frames.length).putInt(40)
      frames.foreach { f => bb.putInt(f.length); bb.put(f) }
      bb.array()
    }
    assert(ham(sig, MediaCodec.videoSignature(rev)._2) > 7,
      "rotation makes the fold order-sensitive")
    // banding: identical videos pair; a same-count different video and a
    // different-count video stay out
    val recs = Seq(
      MediaRecord(1L, "video", v, "s"),
      MediaRecord(2L, "video", v, "s"),
      MediaRecord(3L, "video", MediaCodec.encodeVideo(4, 40, 24, 20, 122), "s"),
      MediaRecord(4L, "video", MediaCodec.encodeVideo(3, 40, 24, 20, 8), "s"),
      MediaRecord(5L, "image", MediaCodec.encodeBmp(8, 8, 1), "s")).toDS()
    val got = videoNearDups(recs, 7).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((1L, 2L, 0)), s"got $got")
  }

  test("imageStats/pcmStats: decoded sums equal the generation formulas") {
    implicit val s = spark
    // seed 6 image, 22x19: recompute the channel sums from the formula
    val istats = imageStats(media).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    val (w, h, seed) = (22, 19, 6)
    var sr = 0L; var sg = 0L; var sb = 0L
    for (y <- 0 until h; x <- 0 until w) {
      sr += (seed * 31 + x * 7 + y * 13) % 251
      sg += (seed * 17 + x * 11 + y * 3) % 251
      sb += (seed * 7 + x * 5 + y * 19) % 251
    }
    assert(istats(6L) == ((w.toLong * h, sr, sg, sb)),
      s"every pixel byte must round-trip: ${istats(6L)} vs ($sr,$sg,$sb)")
    // audio seed 7: square chirp → |sample| is always 12000
    val astats = pcmStats(media).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(astats(7L) == ((856L, 856L * 12000L)))
    assert(astats(199L) == astats(7L), "seed duplicates share stats")
  }

  test("frameMatches: sub-clip detection counts shared frames per pair") {
    implicit val s = spark
    def container(frames: Seq[Array[Byte]]): Array[Byte] = {
      val size = 12 + frames.map(4 + _.length).sum
      val bb = java.nio.ByteBuffer.allocate(size)
      bb.put("GFV1".getBytes("US-ASCII")).putInt(frames.length).putInt(40)
      frames.foreach { f => bb.putInt(f.length); bb.put(f) }
      bb.array()
    }
    def fr(contentSeed: Int) = MediaCodec.encodeBmp(24, 20, contentSeed)
    val (a, b, c, d, e) = (fr(10), fr(20), fr(30), fr(40), fr(50))
    val recs = Seq(
      // X = [a,b,c]; Y = [b,c,d] at DIFFERENT offsets; Z = [e] unrelated
      MediaRecord(1L, "video", container(Seq(a, b, c)), "s"),
      MediaRecord(2L, "video", container(Seq(b, c, d)), "s"),
      MediaRecord(3L, "video", container(Seq(e)), "s"),
      MediaRecord(4L, "audio", MediaCodec.encodeWav(800, 1), "s")).toDS()
    val got = frameMatches(recs, maxHamming = 0).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // X and Y share frames b and c despite different positions/lengths —
    // the case whole-video signatures cannot see
    assert(got == Map((1L, 2L) -> 2L), s"got $got")
  }

  test("hot-bucket cap: capped pair set identical to uncapped on skew") {
    implicit val s = spark
    // skewed corpus: 12 byte-identical copies of one image put 12 rows in
    // ONE (band, value) bucket per band — the shape that degenerates the
    // plain self-join at corpus scale; plus a 3-copy group and a single
    val recs = ((1L to 12L).map(i =>
        MediaRecord(i, "image", MediaCodec.encodeBmp(40, 28, 9), "s")) ++
      (13L to 15L).map(i =>
        MediaRecord(i, "image", MediaCodec.encodeBmp(33, 21, 57), "s")) :+
      MediaRecord(16L, "image", MediaCodec.encodeBmp(20, 20, 114), "s")).toDS()
    def pairs(mb: Int) = phashNearDups(recs, maxHamming = 7, maxBucket = mb)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val uncapped = pairs(0)
    assert(uncapped.size == 12 * 11 / 2 + 3,
      s"both dup groups fully paired: ${uncapped.size}")
    // sub-split caps far below the hot-bucket size, incl. the degenerate
    // one-row-per-sub-group cap — pair set must be EXACTLY the plain join
    for (mb <- Seq(1, 2, 5)) assert(pairs(mb) == uncapped, s"maxBucket=$mb")
    // video path: extraKeys (n_frames) ride through the capped grid too
    val vids = ((1L to 9L).map(i =>
        MediaRecord(i, "video", MediaCodec.encodeVideo(4, 40, 24, 20, 8), "s")) :+
      MediaRecord(10L, "video", MediaCodec.encodeVideo(3, 40, 24, 20, 8), "s")).toDS()
    val vUncapped = videoNearDups(vids, 7).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(vUncapped.size == 9 * 8 / 2)
    assert(videoNearDups(vids, 7, maxBucket = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet == vUncapped)
  }

  test("hot-bucket cap: frameMatches identical at bands=1 (full-hash key)") {
    implicit val s = spark
    def container(frames: Seq[Array[Byte]]): Array[Byte] = {
      val size = 12 + frames.map(4 + _.length).sum
      val bb = java.nio.ByteBuffer.allocate(size)
      bb.put("GFV1".getBytes("US-ASCII")).putInt(frames.length).putInt(40)
      frames.foreach { f => bb.putInt(f.length); bb.put(f) }
      bb.array()
    }
    def fr(contentSeed: Int) = MediaCodec.encodeBmp(24, 20, contentSeed)
    val (a, b, c, d) = (fr(10), fr(20), fr(30), fr(40))
    // frame `a` appears in 6 videos → a 6-row hot bucket keyed by the FULL
    // 64-bit hash (maxHamming=0 ⇒ bands=1 — the data-sized key space the
    // size frame must never broadcast)
    val recs = (Seq(
      MediaRecord(1L, "video", container(Seq(a, b, c)), "s"),
      MediaRecord(2L, "video", container(Seq(b, c, d)), "s"),
      MediaRecord(3L, "video", container(Seq(a, a, d)), "s")) ++
      (4L to 6L).map(i => MediaRecord(i, "video", container(Seq(a)), "s"))).toDS()
    def matches(mb: Int) = frameMatches(recs, maxHamming = 0, maxBucket = mb)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val uncapped = matches(0)
    // spot-check the double-frame case: video 3 holds `a` TWICE → two
    // frame pairs against each single-`a` video
    assert(uncapped((3L, 4L)) == 2L && uncapped((1L, 2L)) == 2L)
    for (mb <- Seq(1, 2)) assert(matches(mb) == uncapped, s"maxBucket=$mb")
  }

  test("banding ops own exactly one cache handle — the returned frame") {
    implicit val s = spark
    spark.catalog.clearCache()
    def nCached = spark.sparkContext.getPersistentRDDs.size
    assert(nCached == 0)
    // eager contract: the heavy banded-hash frame is released inside the
    // operator; the only surviving cache is the pair frame the caller
    // holds — unpersisting it leaves the session clean
    val out = phashNearDups(media, maxHamming = 7)
    assert(nCached == 1, "exactly the returned pair frame")
    out.unpersist()
    assert(nCached == 0, "no net persisted RDDs after release")
    val fm = frameMatches(media, maxHamming = 0, maxBucket = 2)
    assert(nCached == 1)
    fm.unpersist()
    assert(nCached == 0)
  }

  test("corrupt payloads: strict path names the id, safe path flags the row") {
    implicit val s = spark
    // id 5: VALID magic but a poisoned frame-length field (0x7FFFFFFF) —
    // must surface as a catchable decode error, never a 2 GB allocation
    // (an OutOfMemoryError would blow through the safe path entirely)
    val poisoned = java.nio.ByteBuffer.allocate(16)
      .put("GFV1".getBytes("US-ASCII")).putInt(1).putInt(40)
      .putInt(Int.MaxValue).array()
    val bad = Seq(
      MediaRecord(1L, "image", Array[Byte](1, 2, 3), "s"),
      MediaRecord(2L, "audio", "nope".getBytes, "s"),
      MediaRecord(3L, "video", "GFV0junk1234".getBytes, "s"),
      MediaRecord(4L, "image", MediaCodec.encodeBmp(8, 8, 1), "s"),
      MediaRecord(5L, "video", poisoned, "s")).toDS()
    val ex = intercept[org.apache.spark.SparkException] {
      extractFeatures(bad).collect()
    }
    assert(ex.getCause.getMessage.contains("media_id"))
    val safe = extractFeaturesSafe(bad).collect().map(r => r.media_id -> r).toMap
    assert(!safe(1L).ok && safe(1L).error.nonEmpty)
    assert(!safe(2L).ok && !safe(3L).ok)
    assert(safe(4L).ok && safe(4L).width == 8 && safe(4L).error.isEmpty)
    assert(!safe(5L).ok && safe(5L).error.contains("corrupt frame length"))
    // the hash extractors carry the same attribution contract
    val hex = intercept[org.apache.spark.SparkException] {
      imagePhash(bad.filter(_.media_id == 1L)).collect()
    }
    assert(hex.getCause.getMessage.contains("media_id 1"))
  }
}
