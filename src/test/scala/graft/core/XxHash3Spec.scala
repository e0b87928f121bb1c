package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Bit-exactness tests against the xxHash project's published sanity
  * vectors (xsum_sanity_check.c): the test buffer is the documented
  * PRIME32/PRIME64 byte generator, digests are the published expected
  * values for XXH3_64bits / XXH3_64bits_withSeed.
  */
class XxHash3Spec extends AnyFunSuite {

  private val Prime32 = 2654435761L
  private val Prime64 = 0x9E3779B185EBCA8DL

  /** The sanity buffer from the spec: b[i] = high byte of a PRIME64
    * multiplicative generator seeded with PRIME32.
    */
  private def sanityBuffer(len: Int): Array[Byte] = {
    val out = new Array[Byte](len)
    var gen = Prime32
    var i = 0
    while (i < len) {
      out(i) = (gen >>> 56).toByte
      gen *= Prime64
      i += 1
    }
    out
  }

  private val vectors: Seq[(Int, Long, Long)] = Seq(
    (0, 0L, 0x2D06800538D394C2L),
    (1, 0L, 0xC44BDFF4074EECDBL),
    (6, 0L, 0x27B56A84CD2D7325L),
    (12, 0L, 0xA713DAF0DFBB77E7L),
    (24, 0L, 0xA3FE70BF9D3510EBL),
    (48, 0L, 0x397DA259ECBA1F11L),
    (80, 0L, 0xBCDEFBBB2C47C90AL),
    (195, 0L, 0xCD94217EE362EC3AL),
    (403, 0L, 0xCDEB804D65C6DEA4L),
    (512, 0L, 0x617E49599013CB6BL),
    (2048, 0L, 0xDD59E2C3A5F038E0L),
    (0, Prime64, 0xA8A6B918B2F0364AL),
    (1, Prime64, 0x032BE332DD766EF8L),
    (6, Prime64, 0x84589C116AB59AB9L),
    (12, Prime64, 0xE7303E1B2336DE0EL),
    (24, Prime64, 0x850E80FC35BDD690L),
    (48, Prime64, 0xADC2CBAA44ACC616L),
    (80, Prime64, 0xC6DD0CB699532E73L),
    (195, Prime64, 0xBA68003D370CB3D9L),
    (403, Prime64, 0x6259F6ECFD6443FDL),
    (512, Prime64, 0x3CE457DE14C27708L),
    (2048, Prime64, 0x66F81670669ABABCL),
  )

  test("matches published XXH3-64 sanity vectors across all size classes") {
    val buf = sanityBuffer(2048)
    val failures = vectors.flatMap { case (len, seed, expected) =>
      val got = XxHash3.hash(buf.take(len), seed)
      if (got != expected)
        Some(f"len=$len%4d seed=$seed%d: got 0x$got%016X expected 0x$expected%016X")
      else None
    }
    assert(failures.isEmpty, "\n" + failures.mkString("\n"))
  }

  test("string hashing is UTF-8 byte hashing") {
    assert(XxHash3.hash("", 0L) == 0x2D06800538D394C2L)
    assert(XxHash3.hash("abc", 0L) == XxHash3.hash("abc".getBytes("UTF-8"), 0L))
    // non-ASCII goes through UTF-8
    assert(XxHash3.hash("héllo", 0L) == XxHash3.hash("héllo".getBytes("UTF-8"), 0L))
  }

  test("seed changes the digest in every size class") {
    val buf = sanityBuffer(2048)
    for (len <- Seq(3, 7, 13, 60, 200, 1000))
      assert(XxHash3.hash(buf.take(len), 0L) != XxHash3.hash(buf.take(len), 42L))
  }
}
