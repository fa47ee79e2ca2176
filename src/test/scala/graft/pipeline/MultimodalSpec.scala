package graft.pipeline

import graft.SparkSpec
import graft.pipeline.Multimodal._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  lazy val media = Seq(
    MediaRecord(0L, "image", Array.fill[Byte](600)(1), "s"),
    MediaRecord(1L, "audio", Array.fill[Byte](100)(2), "s"),
    MediaRecord(2L, "video", Array.fill[Byte](1000)(3), "s")
  ).toDS()

  test("stub decode is deterministic and type-aware") {
    implicit val s = spark
    val f = extractFeatures(media).collect().map(x => x.media_id -> x).toMap
    assert(f(0L).width == 16 + 600 % 1024 && f(0L).duration_ms == 0L)
    assert(f(1L).width == 0 && f(1L).duration_ms == 1000L)
    assert(f(2L).duration_ms == 10000L)
    assert(f(0L).digest.length == 32)
    // decode twice → identical
    val f2 = extractFeatures(media).collect().map(x => x.media_id -> x).toMap
    assert(f(2L) == f2(2L))
  }

  test("frame sampling takes every Nth 256-byte slice of videos only") {
    implicit val s = spark
    val frames = sampleFrames(media, 2).collect()
    assert(frames.forall(_.media_id == 2L))
    // 1000 bytes → 4 slices (256,256,256,232) → idx 0,2 sampled
    assert(frames.map(_.frame_idx).sorted.toSeq == Seq(0, 2))
    assert(frames.find(_.frame_idx == 2).get.frame_bytes.length == 256)
  }

  test("resize truncates oversized payloads only") {
    implicit val s = spark
    val r = resize(media, 512).collect().map(x => x.media_id -> x.bytes.length).toMap
    assert(r(0L) == 512 && r(1L) == 100 && r(2L) == 512)
  }
}
