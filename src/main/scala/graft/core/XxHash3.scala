package graft.core

import java.lang.Long.rotateLeft
import java.nio.charset.StandardCharsets

/** XXH3-64 (seeded), implemented from the published xxHash
  * specification (github.com/Cyan4973/xxHash, BSD-2). This is NOT the
  * same algorithm as Spark's built-in `xxhash64` (that is classic
  * XXH64) — the reference's string-table encoding is keyed on
  * `xxh3_64_intdigest` (reference: src/trainer/code/feature_encoder.py:7,
  * string_encoder.py:96-101), so we need XXH3 proper.
  *
  * Scalar (non-SIMD) implementation; all three size classes
  * (≤16, 17–240, >240 with per-seed derived secret) are covered.
  */
object XxHash3 {

  private final val P32_1 = 0x9E3779B1L
  private final val P32_2 = 0x85EBCA77L
  private final val P32_3 = 0xC2B2AE3DL
  private final val P64_1 = 0x9E3779B185EBCA87L
  private final val P64_2 = 0xC2B2AE3D27D4EB4FL
  private final val P64_3 = 0x165667B19E3779F9L
  private final val P64_4 = 0x85EBCA77C2B2AE63L
  private final val P64_5 = 0x27D4EB2F165667C5L
  private final val MX1 = 0x9FB21C651E98DF25L // rrmxmx multiplier
  private final val AVAL3 = 0x165667919E3779F9L // XXH3 avalanche multiplier

  /** The 192-byte default secret from the xxHash spec. */
  private val Secret: Array[Byte] = Array(
    0xb8, 0xfe, 0x6c, 0x39, 0x23, 0xa4, 0x4b, 0xbe, 0x7c, 0x01, 0x81, 0x2c, 0xf7, 0x21, 0xad, 0x1c,
    0xde, 0xd4, 0x6d, 0xe9, 0x83, 0x90, 0x97, 0xdb, 0x72, 0x40, 0xa4, 0xa4, 0xb7, 0xb3, 0x67, 0x1f,
    0xcb, 0x79, 0xe6, 0x4e, 0xcc, 0xc0, 0xe5, 0x78, 0x82, 0x5a, 0xd0, 0x7d, 0xcc, 0xff, 0x72, 0x21,
    0xb8, 0x08, 0x46, 0x74, 0xf7, 0x43, 0x24, 0x8e, 0xe0, 0x35, 0x90, 0xe6, 0x81, 0x3a, 0x26, 0x4c,
    0x3c, 0x28, 0x52, 0xbb, 0x91, 0xc3, 0x00, 0xcb, 0x88, 0xd0, 0x65, 0x8b, 0x1b, 0x53, 0x2e, 0xa3,
    0x71, 0x64, 0x48, 0x97, 0xa2, 0x0d, 0xf9, 0x4e, 0x38, 0x19, 0xef, 0x46, 0xa9, 0xde, 0xac, 0xd8,
    0xa8, 0xfa, 0x76, 0x3f, 0xe3, 0x9c, 0x34, 0x3f, 0xf9, 0xdc, 0xbb, 0xc7, 0xc7, 0x0b, 0x4f, 0x1d,
    0x8a, 0x51, 0xe0, 0x4b, 0xcd, 0xb4, 0x59, 0x31, 0xc8, 0x9f, 0x7e, 0xc9, 0xd9, 0x78, 0x73, 0x64,
    0xea, 0xc5, 0xac, 0x83, 0x34, 0xd3, 0xeb, 0xc3, 0xc5, 0x81, 0xa0, 0xff, 0xfa, 0x13, 0x63, 0xeb,
    0x17, 0x0d, 0xdd, 0x51, 0xb7, 0xf0, 0xda, 0x49, 0xd3, 0x16, 0x55, 0x26, 0x29, 0xd4, 0x68, 0x9e,
    0x2b, 0x16, 0xbe, 0x58, 0x7d, 0x47, 0xa1, 0xfc, 0x8f, 0xf8, 0xb8, 0xd1, 0x7a, 0xd0, 0x31, 0xce,
    0x45, 0xcb, 0x3a, 0x8f, 0x95, 0x16, 0x04, 0x28, 0xaf, 0xd7, 0xfb, 0xca, 0xbb, 0x4b, 0x40, 0x7e,
  ).map(_.toByte)

  def hash(s: String, seed: Long = 0L): Long =
    hash(s.getBytes(StandardCharsets.UTF_8), seed)

  def hash(input: Array[Byte], seed: Long): Long = {
    val len = input.length
    if (len <= 16) len0to16(input, len, seed)
    else if (len <= 128) len17to128(input, len, seed)
    else if (len <= 240) len129to240(input, len, seed)
    else hashLong(input, len, seed)
  }

  // ---- helpers -----------------------------------------------------------

  private def readLE64(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) | ((b(off + 2) & 0xffL) << 16) |
      ((b(off + 3) & 0xffL) << 24) | ((b(off + 4) & 0xffL) << 32) |
      ((b(off + 5) & 0xffL) << 40) | ((b(off + 6) & 0xffL) << 48) |
      ((b(off + 7) & 0xffL) << 56)

  private def readLE32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) | ((b(off + 2) & 0xffL) << 16) |
      ((b(off + 3) & 0xffL) << 24)

  private def swap32(x: Long): Long = Integer.reverseBytes(x.toInt) & 0xffffffffL
  private def swap64(x: Long): Long = java.lang.Long.reverseBytes(x)

  /** unsigned 128-bit multiply, fold high^low. */
  private def mul128Fold64(a: Long, b: Long): Long = {
    val lo = a * b
    val hi = Math.multiplyHigh(a, b) + ((a >> 63) & b) + ((b >> 63) & a)
    lo ^ hi
  }

  private def avalanche(h0: Long): Long = {
    var h = h0
    h ^= h >>> 37
    h *= AVAL3
    h ^ (h >>> 32)
  }

  private def avalanche64(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33
    h *= P64_2
    h ^= h >>> 29
    h *= P64_3
    h ^ (h >>> 32)
  }

  private def rrmxmx(h0: Long, len: Long): Long = {
    var h = h0
    h ^= rotateLeft(h, 49) ^ rotateLeft(h, 24)
    h *= MX1
    h ^= (h >>> 35) + len
    h *= MX1
    h ^ (h >>> 28)
  }

  private def mix16B(in: Array[Byte], inOff: Int, secOff: Int, seed: Long): Long =
    mul128Fold64(
      readLE64(in, inOff) ^ (readLE64(Secret, secOff) + seed),
      readLE64(in, inOff + 8) ^ (readLE64(Secret, secOff + 8) - seed))

  // ---- size classes ------------------------------------------------------

  private def len0to16(in: Array[Byte], len: Int, seed: Long): Long = {
    if (len > 8) { // 9..16
      val bitflip1 = (readLE64(Secret, 24) ^ readLE64(Secret, 32)) + seed
      val bitflip2 = (readLE64(Secret, 40) ^ readLE64(Secret, 48)) - seed
      val inputLo = readLE64(in, 0) ^ bitflip1
      val inputHi = readLE64(in, len - 8) ^ bitflip2
      val acc = len + swap64(inputLo) + inputHi + mul128Fold64(inputLo, inputHi)
      avalanche(acc)
    } else if (len >= 4) { // 4..8
      val s = seed ^ (swap32(seed & 0xffffffffL) << 32)
      val input1 = readLE32(in, 0)
      val input2 = readLE32(in, len - 4)
      val bitflip = (readLE64(Secret, 8) ^ readLE64(Secret, 16)) - s
      val input64 = input2 + (input1 << 32)
      rrmxmx(input64 ^ bitflip, len.toLong)
    } else if (len > 0) { // 1..3
      val c1 = in(0) & 0xffL
      val c2 = in(len >> 1) & 0xffL
      val c3 = in(len - 1) & 0xffL
      val combined = (c1 << 16) | (c2 << 24) | c3 | (len.toLong << 8)
      val bitflip = (readLE32(Secret, 0) ^ readLE32(Secret, 4)) + seed
      avalanche64(combined ^ bitflip)
    } else { // 0
      avalanche64(seed ^ readLE64(Secret, 56) ^ readLE64(Secret, 64))
    }
  }

  private def len17to128(in: Array[Byte], len: Int, seed: Long): Long = {
    var acc = len * P64_1
    if (len > 32) {
      if (len > 64) {
        if (len > 96) {
          acc += mix16B(in, 48, 96, seed)
          acc += mix16B(in, len - 64, 112, seed)
        }
        acc += mix16B(in, 32, 64, seed)
        acc += mix16B(in, len - 48, 80, seed)
      }
      acc += mix16B(in, 16, 32, seed)
      acc += mix16B(in, len - 32, 48, seed)
    }
    acc += mix16B(in, 0, 0, seed)
    acc += mix16B(in, len - 16, 16, seed)
    avalanche(acc)
  }

  private final val MidsizeStartOffset = 3
  private final val MidsizeLastOffset = 17

  private def len129to240(in: Array[Byte], len: Int, seed: Long): Long = {
    var acc = len * P64_1
    val nbRounds = len / 16
    var i = 0
    while (i < 8) { acc += mix16B(in, 16 * i, 16 * i, seed); i += 1 }
    acc = avalanche(acc)
    while (i < nbRounds) {
      acc += mix16B(in, 16 * i, 16 * (i - 8) + MidsizeStartOffset, seed)
      i += 1
    }
    acc += mix16B(in, len - 16, 136 - MidsizeLastOffset, seed)
    avalanche(acc)
  }

  // ---- long-input path (> 240 bytes) -------------------------------------

  private final val StripeLen = 64
  private final val SecretConsumeRate = 8
  private final val SecretSize = 192

  /** Per-seed secret: 64-bit lanes of the default secret alternately
    * +seed / -seed (spec: XXH3_initCustomSecret). seed==0 yields the
    * default secret, so one code path serves both.
    */
  private def deriveSecret(seed: Long): Array[Byte] = {
    val out = new Array[Byte](SecretSize)
    var i = 0
    while (i < SecretSize / 16) {
      writeLE64(out, 16 * i, readLE64(Secret, 16 * i) + seed)
      writeLE64(out, 16 * i + 8, readLE64(Secret, 16 * i + 8) - seed)
      i += 1
    }
    out
  }

  private def writeLE64(b: Array[Byte], off: Int, v: Long): Unit = {
    var i = 0
    while (i < 8) { b(off + i) = (v >>> (8 * i)).toByte; i += 1 }
  }

  private def accumulate512(acc: Array[Long], in: Array[Byte], inOff: Int,
      secret: Array[Byte], secOff: Int): Unit = {
    var i = 0
    while (i < 8) {
      val dataVal = readLE64(in, inOff + 8 * i)
      val dataKey = dataVal ^ readLE64(secret, secOff + 8 * i)
      acc(i ^ 1) += dataVal
      acc(i) += (dataKey & 0xffffffffL) * (dataKey >>> 32)
      i += 1
    }
  }

  private def scramble(acc: Array[Long], secret: Array[Byte]): Unit = {
    var i = 0
    while (i < 8) {
      var a = acc(i)
      a ^= a >>> 47
      a ^= readLE64(secret, SecretSize - StripeLen + 8 * i)
      acc(i) = a * P32_1
      i += 1
    }
  }

  private def hashLong(in: Array[Byte], len: Int, seed: Long): Long = {
    val secret = if (seed == 0L) Secret else deriveSecret(seed)
    val acc = Array(P32_3, P64_1, P64_2, P64_3, P64_4, P32_2, P64_5, P32_1)
    val stripesPerBlock = (SecretSize - StripeLen) / SecretConsumeRate // 16
    val blockLen = StripeLen * stripesPerBlock
    val nbBlocks = (len - 1) / blockLen

    var n = 0
    while (n < nbBlocks) {
      var s = 0
      while (s < stripesPerBlock) {
        accumulate512(acc, in, n * blockLen + s * StripeLen, secret, s * SecretConsumeRate)
        s += 1
      }
      scramble(acc, secret)
      n += 1
    }

    val nbStripes = ((len - 1) - blockLen * nbBlocks) / StripeLen
    var s = 0
    while (s < nbStripes) {
      accumulate512(acc, in, nbBlocks * blockLen + s * StripeLen, secret, s * SecretConsumeRate)
      s += 1
    }
    // last stripe: final 64 bytes of input (may overlap previous stripes)
    accumulate512(acc, in, len - StripeLen, secret, SecretSize - StripeLen - 7)

    var result = len * P64_1
    var i = 0
    while (i < 4) {
      result += mul128Fold64(
        acc(2 * i) ^ readLE64(secret, 11 + 16 * i),
        acc(2 * i + 1) ^ readLE64(secret, 11 + 16 * i + 8))
      i += 1
    }
    avalanche(result)
  }
}
