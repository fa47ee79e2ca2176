package graft.api

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

/** Independent byte fixtures for the V2 frame codec: every frame here is
  * hand-assembled to the reference's binary layouts
  * (/root/reference/lib/realtime_web/socket/v2_serializer.ex) — encoder
  * and decoder are each checked against the literal wire bytes, not just
  * against each other, so a systematic layout disagreement with the
  * reference serializer cannot round-trip its way to green. */
class V2FramesSpec extends AnyFunSuite {

  private def bytes(parts: Any*): Array[Byte] =
    parts.flatMap {
      case i: Int => Array(i.toByte)
      case s: String => s.getBytes(UTF_8)
      case b: Array[Byte] => b
    }.toArray

  private val payload = """{"n":1}""".getBytes(UTF_8)

  // ------------------------------------------------ hand-assembled fixtures

  test("push (outbound, v2_serializer.ex:110-128): op,jr,t,e sizes then data") {
    // <<0, jr_size, topic_size, event_size, jr, topic, event, data>>
    val fix = bytes(0, 1, 9, 9, "7", "topic:abc", "new_event", payload)
    assert(V2Frames.encodePush("7", "topic:abc", "new_event", payload)
      .sameElements(fix))
    val f = V2Frames.decode(fix)
    assert(f.opcode == 0 && f.join_ref == "7" && f.ref == null &&
      f.topic == "topic:abc" && f.event == "new_event" &&
      f.payload.sameElements(payload))
  }

  test("push (inbound, v2_serializer.ex:158-177): carries a ref") {
    // <<0, jr_size, ref_size, topic_size, event_size, jr, ref, t, e, data>>
    val fix = bytes(0, 1, 2, 9, 9, "7", "12", "topic:abc", "new_event", payload)
    val f = V2Frames.decode(fix, inbound = true)
    assert(f.join_ref == "7" && f.ref == "12" && f.topic == "topic:abc" &&
      f.event == "new_event" && f.payload.sameElements(payload))
  }

  test("reply (v2_serializer.ex:73-96): op,jr,ref,t,status sizes") {
    // <<1, jr_size, ref_size, topic_size, status_size, jr, ref, t, s, data>>
    val fix = bytes(1, 1, 2, 9, 2, "7", "12", "topic:abc", "ok", payload)
    assert(V2Frames.encodeReply("7", "12", "topic:abc", "ok", payload)
      .sameElements(fix))
    val f = V2Frames.decode(fix)
    assert(f.opcode == 1 && f.join_ref == "7" && f.ref == "12" &&
      f.topic == "topic:abc" && f.status == "ok" &&
      f.payload.sameElements(payload))
  }

  test("broadcast (v2_serializer.ex:47-61): op,t,e sizes then data") {
    // <<2, topic_size, event_size, topic, event, data>>
    val fix = bytes(2, 9, 5, "topic:abc", "hello", payload)
    assert(V2Frames.encodeBroadcast("topic:abc", "hello", payload)
      .sameElements(fix))
    val f = V2Frames.decode(fix)
    assert(f.opcode == 2 && f.topic == "topic:abc" && f.event == "hello" &&
      f.join_ref == null && f.metadata == null &&
      f.payload.sameElements(payload))
  }

  test("user_broadcast_push (v2_serializer.ex:179-212): six sizes + enc") {
    // <<3, jr, ref, t, ue, m sizes, enc, jr, ref, t, ue, metadata, data>>
    val meta = """{"k":"v"}"""
    val fix = bytes(3, 1, 2, 9, 4, 9, 1, "7", "12", "topic:abc", "myev",
      meta, payload)
    assert(V2Frames.encodeUserBroadcastPush("7", "12", "topic:abc", "myev",
      Some(meta), payloadIsJson = true, payload).sameElements(fix))
    val f = V2Frames.decode(fix)
    assert(f.opcode == 3 && f.join_ref == "7" && f.ref == "12" &&
      f.topic == "topic:abc" && f.event == "myev" && f.metadata == meta &&
      f.payload_is_json && f.payload.sameElements(payload))
  }

  test("user_broadcast (v2_serializer.ex:19-44): three sizes + enc") {
    // <<4, topic_size, user_event_size, metadata_size, enc, t, ue, m, data>>
    val meta = """{"k":"v"}"""
    val fix = bytes(4, 9, 4, 9, 0, "topic:abc", "myev", meta, payload)
    assert(V2Frames.encodeUserBroadcast("topic:abc", "myev", Some(meta),
      payloadIsJson = false, payload).sameElements(fix))
    val f = V2Frames.decode(fix)
    assert(f.opcode == 4 && f.topic == "topic:abc" && f.event == "myev" &&
      f.metadata == meta && !f.payload_is_json &&
      f.payload.sameElements(payload))
  }

  test("user_broadcast_push enc=0 carries raw non-UTF8 bytes verbatim") {
    // the binary arm of the client push (s9_push_e2e's <'8' leg): enc
    // byte 0, payload bytes opaque — invalid UTF-8 must survive intact
    val raw = Array[Byte](0, -1, -2, 127, -128)
    val fix = bytes(3, 1, 1, 1, 2, 0, 0, "7", "9", "t", "ev", raw)
    assert(V2Frames.encodeUserBroadcastPush("7", "9", "t", "ev", None,
      payloadIsJson = false, raw).sameElements(fix))
    val f = V2Frames.decode(fix)
    assert(f.opcode == 3 && f.join_ref == "7" && f.ref == "9" &&
      f.topic == "t" && f.event == "ev" && !f.payload_is_json &&
      f.metadata == "{}" && f.payload.sameElements(raw))
  }

  // ------------------------------------------------------- metadata semantics

  test("zero-length metadata decodes to {} (reference %{}, :196-201)") {
    val fix3 = bytes(3, 1, 2, 1, 2, 0, 1, "7", "12", "t", "ev", payload)
    assert(V2Frames.decode(fix3).metadata == "{}")
    val fix4 = bytes(4, 1, 2, 0, 0, "t", "ev", payload)
    assert(V2Frames.decode(fix4).metadata == "{}")
    // absent metadata encodes as size 0 (byte_size!(nil) = 0, :214)
    assert(V2Frames.encodeUserBroadcast("t", "ev", None,
      payloadIsJson = false, payload).sameElements(fix4))
  }

  // --------------------------------------------------------- size-cap errors

  test("fields over 255 bytes raise naming the field (:216-227)") {
    val big = "x" * 256
    val e1 = intercept[IllegalArgumentException] {
      V2Frames.encodeBroadcast(big, "ev", payload)
    }
    assert(e1.getMessage.contains("topic"))
    val e2 = intercept[IllegalArgumentException] {
      V2Frames.encodeUserBroadcast("t", "ev", Some(big),
        payloadIsJson = true, payload)
    }
    assert(e2.getMessage.contains("metadata"))
    // a multi-byte UTF-8 field is capped by BYTE size, not char count
    val utf = "é" * 130 // 260 bytes, 130 chars
    assert(intercept[IllegalArgumentException] {
      V2Frames.encodeBroadcast(utf, "ev", payload)
    }.getMessage.contains("topic"))
  }

  test("UTF-8 sizes are byte sizes on the wire") {
    val topic = "héllo" // 6 bytes, 5 chars
    val enc = V2Frames.encodeBroadcast(topic, "e", payload)
    assert((enc(1) & 0xff) == 6)
    assert(V2Frames.decode(enc).topic == topic)
  }

  // -------------------------------------------------------- truncated frames

  test("truncated frames throw IllegalArgumentException, never AIOOBE") {
    val full = bytes(4, 9, 4, 9, 1, "topic:abc", "myev", """{"k":"v"}""")
    // cut at every prefix length: header bytes, mid-field, everywhere
    (0 until full.length).foreach { n =>
      val cut = java.util.Arrays.copyOf(full, n)
      if (n <= 4 + 9 + 4 + 9) { // missing header or sized field bytes
        val e = intercept[IllegalArgumentException](V2Frames.decode(cut))
        assert(e.getMessage.contains("truncated V2 frame"), s"cut=$n")
      } else V2Frames.decode(cut) // only payload missing → empty tail, fine
    }
    val reply = bytes(1, 1, 2, 9) // reply header cut before status_size
    assert(intercept[IllegalArgumentException](V2Frames.decode(reply))
      .getMessage.contains("truncated"))
    assert(intercept[IllegalArgumentException](
      V2Frames.decode(Array.emptyByteArray))
      .getMessage.contains("truncated"))
  }

  test("unknown opcode raises with the opcode value") {
    val e = intercept[IllegalArgumentException](
      V2Frames.decode(bytes(9, 1, 1, "a", "b")))
    assert(e.getMessage.contains("9"))
  }

  // -------------------------------------------------------------- round-trip

  test("all five opcodes round-trip both directions") {
    val p = Array[Byte](1, 2, 3, -1)
    val cases = Seq(
      (V2Frames.encodePush("1", "t", "e", p), false),
      (V2Frames.encodeReply("1", "2", "t", "ok", p), false),
      (V2Frames.encodeBroadcast("t", "e", p), false),
      (V2Frames.encodeUserBroadcastPush("1", "2", "t", "ue", Some("{}"),
        payloadIsJson = true, p), false),
      (V2Frames.encodeUserBroadcast("t", "ue", None,
        payloadIsJson = false, p), false))
    cases.foreach { case (enc, inb) =>
      val f = V2Frames.decode(enc, inb)
      assert(f.payload.sameElements(p))
      assert(f.topic == "t")
    }
  }
}
