package graft.api

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's at-rest credential codec — AES-128-ECB + PKCS#7 pad,
  * base64-armored (/root/reference/lib/realtime/crypto.ex:9-39: `pad`
  * appends `16 - rem(size, 16)` bytes of that value, i.e. PKCS#7
  * including the full pad block on aligned input) — mapped onto Spark's
  * BUILT-IN `aes_encrypt`/`aes_decrypt` with mode `ECB`, padding `PKCS`:
  * byte-identical output (spec-pinned against a javax.crypto reference
  * implementation), zero custom code in the data path, codegen'd.
  *
  * Used where the reference uses it: the tenant dimension's encrypted
  * connection fields (`db_password`, jwt secrets) decrypt as a column
  * projection while reading the tenant table — a broadcast-dimension
  * transform, never a per-row RPC. ECB's determinism is load-bearing
  * for the reference (equal secrets encrypt equal — and it is what the
  * reference ships), so this mirrors it rather than upgrading the mode.
  */
object Crypto {

  /** `Realtime.Crypto.encrypt!`: AES-128-ECB + PKCS#7, base64 text.
    * Spark's `base64` MIME-chunks at 76 chars on THIS runtime (measured:
    * a 108-char armored text gained a CRLF — the `chunkBase64String`
    * legacy behavior is active in the deployed Spark 4.1.2 build; do not
    * remove the strip on the strength of upstream default-flag docs
    * alone, CryptoSpec's byte-parity case is the arbiter) — `translate`
    * strips it so the armored text is byte-identical to Elixir's
    * unchunked `Base.encode64`, and is a no-op if a future runtime stops
    * chunking. */
  def encrypt(text: Column, key: Column): Column =
    translate(base64(aes_encrypt(text.cast("binary"), key.cast("binary"),
      lit("ECB"), lit("PKCS"))), "\r\n", "")

  /** `Realtime.Crypto.decrypt!`: base64 → AES-128-ECB + PKCS#7 strip. */
  def decrypt(b64: Column, key: Column): Column =
    aes_decrypt(unbase64(b64), key.cast("binary"),
      lit("ECB"), lit("PKCS")).cast("string")
}
