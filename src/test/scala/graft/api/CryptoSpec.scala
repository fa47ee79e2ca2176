package graft.api

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets.UTF_8

/** Byte parity with the reference's Realtime.Crypto: AES-128-ECB with
  * PKCS#7 padding (full pad block on aligned input — crypto.ex:30-33),
  * base64-armored. The javax.crypto reference implementation here IS
  * the reference semantics (Erlang :crypto and the JCA compute the same
  * AES-128-ECB; PKCS5Padding == PKCS#7 for 16-byte blocks). */
class CryptoSpec extends SparkSpec {
  import spark.implicits._

  private val key = "0123456789abcdef" // 16 bytes

  private def jcaEncrypt(text: String): String = {
    val c = javax.crypto.Cipher.getInstance("AES/ECB/PKCS5Padding")
    c.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key.getBytes(UTF_8), "AES"))
    java.util.Base64.getEncoder.encodeToString(
      c.doFinal(text.getBytes(UTF_8)))
  }

  private val cases = Seq(
    "", // empty: pads to one full block
    "short",
    "exactly sixteen!", // 16 bytes: PKCS#7 adds a FULL extra block
    "a longer secret spanning multiple aes blocks with unicode: é世",
    "x" * 255)

  test("encrypt matches the javax.crypto reference byte-for-byte " +
      "(incl. the full-pad-block aligned case)") {
    val got = cases.toDF("t")
      .select(Crypto.encrypt(col("t"), lit(key)).as("ct"))
      .as[String].collect()
    cases.zip(got).foreach { case (t, ct) =>
      assert(ct == jcaEncrypt(t), s"ciphertext mismatch for <$t>")
    }
  }

  test("decrypt inverts encrypt; ciphertext length follows the PKCS#7 " +
      "block law") {
    val rows = cases.toDF("t")
      .select(col("t"),
        Crypto.decrypt(Crypto.encrypt(col("t"), lit(key)), lit(key)).as("rt"),
        length(Crypto.encrypt(col("t"), lit(key))).as("n"))
      .collect()
    rows.foreach { r =>
      val t = r.getString(0)
      assert(r.getString(1) == t, s"round-trip broke for <$t>")
      val padded = (t.getBytes(UTF_8).length / 16 + 1) * 16
      val b64 = 4 * ((padded + 2) / 3)
      assert(r.getInt(2) == b64, s"length law broke for <$t>")
    }
  }

  test("determinism (the property the reference relies on): equal " +
      "plaintext and key produce equal ciphertext") {
    val ct = Seq("s", "s").toDF("t")
      .select(Crypto.encrypt(col("t"), lit(key))).as[String].collect()
    assert(ct(0) == ct(1))
  }
}
