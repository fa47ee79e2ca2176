package graft.pipeline

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Fuzz totality for the codec decode surface: ARBITRARY bytes — pure
  * garbage, truncated real payloads, real payloads with flipped bytes —
  * must either decode or raise a catchable IllegalArgumentException /
  * codec exception. Never an Error (OOM from a poisoned length field),
  * never a hang: this is the property [[Multimodal.extractFeaturesSafe]]'s
  * one-bad-blob-must-not-kill-the-pass contract stands on. */
object MediaCodecPropertySpec extends Properties("MediaCodec") {

  private val garbageGen: Gen[Array[Byte]] =
    Gen.choose(0, 300).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray))

  // real payloads with one byte flipped at an arbitrary offset — the
  // hardest corruption class: headers mostly valid, one field poisoned
  private val flippedGen: Gen[Array[Byte]] = for {
    seed <- Gen.choose(0, 191)
    payload <- Gen.oneOf(
      MediaCodec.encodeBmp(16 + seed % 32, 16 + (seed / 2) % 32, seed),
      MediaCodec.encodeWav(800 + (seed % 100) * 8, seed),
      MediaCodec.encodeVideo(2 + seed % 4, 40, 16 + seed % 16,
        16 + (seed / 2) % 16, seed))
    pos <- Gen.choose(0, payload.length - 1)
    bit <- Gen.choose(0, 7)
  } yield {
    val b = payload.clone()
    b(pos) = (b(pos) ^ (1 << bit)).toByte
    b
  }

  private def totallyFails(body: => Any): Boolean =
    try { body; true } catch {
      case _: IllegalArgumentException => true
      case _: javax.sound.sampled.UnsupportedAudioFileException => true
      case _: java.io.IOException => true
      case _: java.nio.BufferUnderflowException => true
      case _: ArrayIndexOutOfBoundsException => true
      // anything else — in particular any java.lang.Error — fails the prop
    }

  property("garbage bytes never crash the video parser") =
    forAll(garbageGen) { bytes =>
      totallyFails(MediaCodec.decodeVideoHeader(bytes)) &&
      totallyFails(MediaCodec.videoFrames(bytes))
    }

  property("garbage bytes never crash image/audio decode") =
    forAll(garbageGen) { bytes =>
      totallyFails(MediaCodec.decodeImage(bytes)) &&
      totallyFails(MediaCodec.decodeAudioDurationMs(bytes)) &&
      totallyFails(MediaCodec.decodePcm16(bytes))
    }

  property("bit-flipped real payloads decode or fail cleanly, never crash") =
    forAll(flippedGen) { bytes =>
      totallyFails(MediaCodec.decodeImage(bytes)) &&
      totallyFails(MediaCodec.decodeAudioDurationMs(bytes)) &&
      totallyFails(MediaCodec.decodeVideoHeader(bytes)) &&
      totallyFails(MediaCodec.videoFrames(bytes)) &&
      totallyFails(MediaCodec.phash(bytes)) &&
      totallyFails(MediaCodec.audioFingerprint(bytes)) &&
      totallyFails(MediaCodec.videoSignature(bytes))
    }
}
