package graft.core

import java.math.BigInteger
import java.time.Instant

/** KSUID codec — 20-byte id: 4-byte big-endian seconds since the KSUID
  * epoch (2014-05-13, unix 1400000000) followed by a 16-byte random
  * payload, canonically rendered as a fixed-length 27-char base62
  * string. Because the rendering is fixed-length over an ASCII-ordered
  * alphabet, lexicographic order of the base62 form equals numeric
  * order of the 20 bytes, i.e. chronological order — the property the
  * whole partition layout exploits (reference:
  * src/ingest/partition.py:439-442, src/ingest/utils.py:53-72).
  */
object Ksuid {
  val Epoch: Long = 1400000000L
  val EncodedLength: Int = 27
  val PayloadBytes: Int = 16

  private val Alphabet = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
  private val Radix = BigInteger.valueOf(62)
  // char → digit value, -1 for invalid
  private val DigitOf: Array[Int] = {
    val a = Array.fill(128)(-1)
    Alphabet.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }
  private val MaxValue = BigInteger.ONE.shiftLeft(160)

  /** Decode a 27-char base62 KSUID to its 20 raw bytes. */
  def decodeBytes(s: String): Option[Array[Byte]] = {
    if (s == null || s.length != EncodedLength) return None
    var acc = BigInteger.ZERO
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c >= 128 || DigitOf(c.toInt) < 0) return None
      acc = acc.multiply(Radix).add(BigInteger.valueOf(DigitOf(c.toInt).toLong))
      i += 1
    }
    if (acc.compareTo(MaxValue) >= 0) return None
    val raw = acc.toByteArray // may be shorter than 20 or carry a sign byte
    val out = new Array[Byte](20)
    val src = if (raw.length > 20) raw.drop(raw.length - 20) else raw
    System.arraycopy(src, 0, out, 20 - src.length, src.length)
    Some(out)
  }

  /** Seconds since the unix epoch encoded in the KSUID's first 4 bytes. */
  def timestampSeconds(s: String): Option[Long] =
    decodeBytes(s).map(timestampSeconds)

  def timestampSeconds(bytes: Array[Byte]): Long = {
    val raw = ((bytes(0) & 0xffL) << 24) | ((bytes(1) & 0xffL) << 16) |
      ((bytes(2) & 0xffL) << 8) | (bytes(3) & 0xffL)
    raw + Epoch
  }

  def instant(s: String): Option[Instant] =
    timestampSeconds(s).map(Instant.ofEpochSecond)

  /** Valid = 27 chars, base62-decodable, and not from the future
    * (future ids would open a partition every new record merges into;
    * reference src/ingest/utils.py:60-72).
    */
  def isValid(s: String, nowEpochSeconds: Long): Boolean =
    timestampSeconds(s).exists(_ <= nowEpochSeconds)

  /** Encode (seconds, 16-byte payload) as canonical 27-char base62. */
  def encode(epochSeconds: Long, payload: Array[Byte]): String = {
    require(payload.length == PayloadBytes, s"payload must be 16 bytes, got ${payload.length}")
    val ts = epochSeconds - Epoch
    require(ts >= 0 && ts <= 0xffffffffL, s"timestamp out of KSUID range: $epochSeconds")
    val bytes = new Array[Byte](20)
    bytes(0) = (ts >>> 24).toByte
    bytes(1) = (ts >>> 16).toByte
    bytes(2) = (ts >>> 8).toByte
    bytes(3) = ts.toByte
    System.arraycopy(payload, 0, bytes, 4, PayloadBytes)
    var acc = new BigInteger(1, bytes)
    val sb = new StringBuilder
    while (acc.signum() > 0) {
      val Array(q, r) = acc.divideAndRemainder(Radix)
      sb.append(Alphabet.charAt(r.intValue()))
      acc = q
    }
    while (sb.length < EncodedLength) sb.append('0')
    sb.reverseContents().toString
  }

  /** Deterministic KSUID from a seed — for tests and synthetic data. */
  def deterministic(epochSeconds: Long, seed: Long): String = {
    val rnd = new java.util.Random(seed)
    val payload = new Array[Byte](PayloadBytes)
    rnd.nextBytes(payload)
    encode(epochSeconds, payload)
  }
}
