package graft.functions

import java.security.MessageDigest

/** THE cross-engine hash primitive: the top 60 bits of md5(s), i.e. the
  * first 15 hex characters as an integer — byte-for-byte
  * `CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)` in DuckDB and
  * `conv(substring(md5(s), 1, 15), 16, 10)` in Spark SQL. Every sketch,
  * LSH weight, and shingle hash derives from this one fold so a change
  * here is a change to ORACLE PARITY everywhere — which is exactly why
  * there is one definition.
  */
object Md5Hash {

  def newDigest(): MessageDigest = MessageDigest.getInstance("MD5")

  /** Top-60-bit fold over a caller-owned digest (reset + reuse it across
    * calls — `getInstance` per call is provider-lookup overhead in per-row
    * hot paths).
    */
  def top60(md: MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    top60OfDigest(d)
  }

  /** The same fold over an already-computed 16-byte md5 digest. */
  def top60OfDigest(d: Array[Byte]): Long = {
    var v = 0L
    var b = 0
    while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
    v >>> 4
  }
}
