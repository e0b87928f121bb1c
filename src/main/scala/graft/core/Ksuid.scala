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

  /** Epoch seconds decoded with fixed 5×32-bit limb arithmetic over the
    * raw ASCII bytes — no BigInteger, no String, zero allocation: the
    * hot path for native expressions reading UTF8String columns.
    * Returns -1 for anything `decodeBytes` would reject (wrong length,
    * invalid character, value ≥ 2¹⁶⁰); -1 is unambiguous because valid
    * timestamps are ≥ Epoch. Spec-proven equal to `timestampSeconds`.
    */
  def timestampSecondsFast(ascii: Array[Byte]): Long = {
    if (ascii == null || ascii.length != EncodedLength) return -1L
    // acc = Σ digit·62^i as five base-2³² limbs; the KSUID timestamp is
    // the TOP 32 bits, i.e. limb 4 once all 27 digits are folded in
    var l0 = 0L; var l1 = 0L; var l2 = 0L; var l3 = 0L; var l4 = 0L
    var i = 0
    while (i < EncodedLength) {
      val c = ascii(i) & 0xff
      if (c >= 128) return -1L
      val d = DigitOf(c)
      if (d < 0) return -1L
      var t = l0 * 62 + d
      l0 = t & 0xffffffffL
      t = l1 * 62 + (t >>> 32); l1 = t & 0xffffffffL
      t = l2 * 62 + (t >>> 32); l2 = t & 0xffffffffL
      t = l3 * 62 + (t >>> 32); l3 = t & 0xffffffffL
      t = l4 * 62 + (t >>> 32); l4 = t & 0xffffffffL
      if ((t >>> 32) != 0) return -1L // ≥ 2¹⁶⁰: not a canonical KSUID
      i += 1
    }
    l4 + Epoch
  }

  /** `yyyyMMdd'T'HHmmss'Z'` rendering of an epoch-seconds instant in
    * UTC with pure integer math (civil-from-days, Howard Hinnant's
    * public-domain algorithm) — allocation-free except the result,
    * bit-identical to `DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'")`
    * for the 4-digit-year range KSUIDs can encode (2014–2150).
    */
  def basicIsoUtc(epochSeconds: Long): String = {
    val days = Math.floorDiv(epochSeconds, 86400L)
    val secOfDay = Math.floorMod(epochSeconds, 86400L).toInt
    val z = days + 719468L
    val era = Math.floorDiv(z, 146097L)
    val doe = (z - era * 146097L).toInt
    val yoe = (doe - doe / 1460 + doe / 36524 - doe / 146096) / 365
    val doy = doe - (365 * yoe + yoe / 4 - yoe / 100)
    val mp = (5 * doy + 2) / 153
    val d = doy - (153 * mp + 2) / 5 + 1
    val m = if (mp < 10) mp + 3 else mp - 9
    val y = (yoe + era * 400 + (if (m <= 2) 1 else 0)).toInt
    val hh = secOfDay / 3600
    val mi = (secOfDay / 60) % 60
    val ss = secOfDay % 60
    val out = new Array[Char](16)
    out(0) = ('0' + y / 1000).toChar
    out(1) = ('0' + (y / 100) % 10).toChar
    out(2) = ('0' + (y / 10) % 10).toChar
    out(3) = ('0' + y % 10).toChar
    out(4) = ('0' + m / 10).toChar
    out(5) = ('0' + m % 10).toChar
    out(6) = ('0' + d / 10).toChar
    out(7) = ('0' + d % 10).toChar
    out(8) = 'T'
    out(9) = ('0' + hh / 10).toChar
    out(10) = ('0' + hh % 10).toChar
    out(11) = ('0' + mi / 10).toChar
    out(12) = ('0' + mi % 10).toChar
    out(13) = ('0' + ss / 10).toChar
    out(14) = ('0' + ss % 10).toChar
    out(15) = 'Z'
    new String(out)
  }

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
    sb.reverseInPlace().toString
  }

  /** Deterministic KSUID from a seed — for tests and synthetic data. */
  def deterministic(epochSeconds: Long, seed: Long): String = {
    val rnd = new java.util.Random(seed)
    val payload = new Array[Byte](PayloadBytes)
    rnd.nextBytes(payload)
    encode(epochSeconds, payload)
  }
}
