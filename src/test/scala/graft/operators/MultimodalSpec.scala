package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class MultimodalSpec extends AnyFunSuite with SparkTestBase {

  test("resizeStub: nearest-neighbor indices, identity at same length, empty in = empty out") {
    val bytes = Array.tabulate(8)(i => (i * 10).toByte)
    // downsample 8 → 4: indices (i*8)/4 = 0,2,4,6
    assert(Multimodal.resizeStub(bytes, 4).toSeq == Seq(0, 20, 40, 60))
    // identity when outLen == n
    assert(Multimodal.resizeStub(bytes, 8).toSeq == bytes.map(_ & 0xff).toSeq)
    // upsample repeats neighbors: 2 → 4 gives indices 0,0,1,1
    assert(Multimodal.resizeStub(Array[Byte](1, 2), 4).toSeq == Seq(1, 1, 2, 2))
    assert(Multimodal.resizeStub(Array.empty[Byte], 4).isEmpty)
    // high bytes are unsigned
    assert(Multimodal.resizeStub(Array[Byte](-1), 2).toSeq == Seq(255, 255))
  }

  test("resize Dataset path: schema, means, and empty payloads") {
    import spark.implicits._
    val docs = Seq((1L, "abcd"), (2L, "")).toDF("doc_id", "text")
    val media = Multimodal.withBinaryColumn(docs, "text", "doc_id")
    val out = Multimodal.resize(media, outLen = 2).collect()
      .map(r => r.id -> r).toMap
    assert(out(1L).resized == Seq('a'.toInt, 'c'.toInt))
    assert(out(1L).resized_mean == ('a'.toInt + 'c'.toInt) / 2.0)
    assert(out(2L).resized.isEmpty && out(2L).resized_mean == 0.0)
    intercept[IllegalArgumentException](Multimodal.resize(media, 0))
  }

  /** PNG fixture built in-memory with the same javax.imageio the
    * decoder uses — a real compressed image payload, not a byte blob.
    */
  private def pngBytes(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    bos.toByteArray
  }

  test("decodeImage: real PNG decodes to the Rec.601 luminance plane") {
    // left half pure red, right half pure white
    val bytes = pngBytes(8, 4)((x, _) => if (x < 4) 0xff0000 else 0xffffff)
    val img = Multimodal.decodeImage(bytes).get
    assert(img.width == 8 && img.height == 4)
    val lum = img.luminance
    // red: 299*255/1000 = 76 (integer division); white: 255
    assert((0 until 4).forall(y => (0 until 4).forall(x => lum(y * 8 + x) == 76)), lum.toSeq)
    assert((0 until 4).forall(y => (4 until 8).forall(x => lum(y * 8 + x) == 255)), lum.toSeq)
    // non-image bytes and corrupt sniffed payloads both decline
    assert(Multimodal.decodeImage("just text".getBytes).isEmpty)
    val corrupt = bytes.take(12) // valid PNG magic, truncated body
    assert(Multimodal.sniffImage(corrupt) && Multimodal.decodeImage(corrupt).isEmpty)
  }

  test("decodeImage declines a decompression bomb by header dimensions") {
    // take a real 8x8 PNG and patch its IHDR to DECLARE 50000x50000
    // (2.5 G pixels) with a recomputed CRC, so readers accept the
    // header — the dimension cap must decline before any pixel
    // allocation happens
    val png = pngBytes(8, 8)((_, _) => 0xffffff)
    val bomb = png.clone()
    def putInt(off: Int, v: Int): Unit = {
      bomb(off) = (v >>> 24).toByte; bomb(off + 1) = (v >>> 16).toByte
      bomb(off + 2) = (v >>> 8).toByte; bomb(off + 3) = v.toByte
    }
    putInt(16, 50000) // IHDR width
    putInt(20, 50000) // IHDR height
    val crc = new java.util.zip.CRC32()
    crc.update(bomb, 12, 17) // chunk type "IHDR" + 13 data bytes
    putInt(29, crc.getValue.toInt)
    assert(Multimodal.sniffImage(bomb))
    assert(Multimodal.decodeImage(bomb).isEmpty)
    // the unpatched image still decodes
    assert(Multimodal.decodeImage(png).nonEmpty)
  }

  test("decodeImage honors a caller-supplied pixel cap") {
    val png = pngBytes(8, 8)((_, _) => 0xffffff) // 64 px
    assert(Multimodal.decodeImage(png, maxPixels = 16L).isEmpty)
    assert(Multimodal.decodeImage(png, maxPixels = 64L).nonEmpty)
  }

  test("resizeArea: exact-partition box filter, hand-computed cells") {
    // 4x2 gradient: luminance = x*10 + y*100 (construct directly)
    val img = Multimodal.DecodedImage(4, 2,
      Array.tabulate(8)(i => (i % 4) * 10 + (i / 4) * 100))
    // to 2x1: each cell averages a 2x2 block
    //   cell 0: {0,10,100,110} -> 55 ; cell 1: {20,30,120,130} -> 75
    assert(Multimodal.resizeArea(img, 2, 1).toSeq == Seq(55, 75))
    // identity at source resolution
    assert(Multimodal.resizeArea(img, 4, 2).toSeq == img.luminance.toSeq)
    // upscale: uncovered cells are 0 by contract (source pixel maps to
    // the floor cell; 1x1 -> 2x2 covers only cell (0,0))
    val one = Multimodal.DecodedImage(1, 1, Array(200))
    assert(Multimodal.resizeArea(one, 2, 2).toSeq == Seq(200, 0, 0, 0))
  }

  test("resize Dataset path routes image payloads through the real codec") {
    import spark.implicits._
    val png = pngBytes(16, 16)((x, y) => if ((x / 8 + y / 8) % 2 == 0) 0x000000 else 0xffffff)
    val rows = Seq(
      (10L, png),
      (11L, "plain text payload".getBytes("UTF-8")))
    val media = rows.toDF("id", "bytes")
      .withColumn("media_meta", struct(
        octet_length(col("bytes")).as("n_bytes"),
        lit("application/octet-stream").as("mime"),
        lit(1).as("channels")))
    val out = Multimodal.resize(media, outLen = 2).collect().map(r => r.id -> r).toMap
    // checkerboard 16x16 -> 2x2 luminance thumbnail: 0,255,255,0
    assert(out(10L).resized == Seq(0, 255, 255, 0), out(10L).resized)
    assert(out(10L).n_bytes == png.length)
    // non-image payload keeps the outLen-sample byte stub exactly
    val expectStub = Multimodal.resizeStub("plain text payload".getBytes("UTF-8"), 2).toSeq
    assert(out(11L).resized == expectStub)
  }

  test("decode drops are counted by cause, not silently stubbed") {
    import spark.implicits._
    // mixed fixture: 2 real images, 1 corrupt (PNG magic + garbage),
    // 2 non-image text payloads
    val png1 = pngBytes(4, 4)((_, _) => 0xffffff)
    val png2 = pngBytes(8, 8)((_, _) => 0x000000)
    val corrupt = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10, 42, 42, 42)
    val rows = Seq(
      (1L, png1), (2L, png2), (3L, corrupt),
      (4L, "some text".getBytes("UTF-8")), (5L, "more text".getBytes("UTF-8")))
    val media = rows.toDF("id", "bytes")
      .withColumn("media_meta", struct(
        octet_length(col("bytes")).as("n_bytes"),
        lit("application/octet-stream").as("mime"),
        lit(1).as("channels")))
    // the corpus-wide census: one groupBy over resize's status column
    val counts = Multimodal.resize(media, outLen = 2).toDF()
      .groupBy("decode_status").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map(
      Multimodal.StatusDecoded -> 2L,
      Multimodal.StatusCorrupt -> 1L,
      Multimodal.StatusNonImage -> 2L), counts.toString)

    // oversize is classified from the DECLARED header dims against the
    // cap — distinguishable from corrupt even though both decline
    val (none, status) = Multimodal.decodeImageWithStatus(png2, maxPixels = 16L)
    assert(none.isEmpty && status == Multimodal.StatusOversize)
    val (ok, st2) = Multimodal.decodeImageWithStatus(png2)
    assert(ok.nonEmpty && st2 == Multimodal.StatusDecoded)
    assert(Multimodal.decodeImageWithStatus(corrupt)._2 == Multimodal.StatusCorrupt)
    assert(Multimodal.decodeImageWithStatus("txt".getBytes)._2 == Multimodal.StatusNonImage)
  }

  test("planted payload fixtures classify exactly as declared") {
    assert(Multimodal.decodeImageWithStatus(Multimodal.tinyPngBytes)._2
      == Multimodal.StatusDecoded)
    // 10^10 declared pixels in a ~33-byte payload: header-only decline
    assert(Multimodal.decodeImageWithStatus(Multimodal.pngDeclaring(100000, 100000))._2
      == Multimodal.StatusOversize)
    assert(Multimodal.decodeImageWithStatus(Multimodal.corruptPngBytes)._2
      == Multimodal.StatusCorrupt)
    // a small DECLARED canvas passes the header check (truncated body
    // then fails the actual decode as corrupt, not oversize)
    assert(Multimodal.decodeImageWithStatus(Multimodal.pngDeclaring(4, 4))._2
      == Multimodal.StatusCorrupt)
  }

  test("sampleFrames: uniform offsets, exact sums, short payloads skipped") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x" * 200),  // 200 bytes -> frames at offsets j*(200-64)/7
      (2L, "ab"),       // shorter than one frame -> skipped
      (3L, "y" * 64)    // exactly one frame wide -> all offsets 0
    ).toDF("doc_id", "text")
    val media = Multimodal.withBinaryColumn(docs, "text", "doc_id")
    val got = Multimodal.sampleFrames(media, frameLen = 64, k = 8)
      .collect().sortBy(f => (f.id, f.frame_idx))
    assert(got.map(_.id).distinct.toSeq === Seq(1L, 3L))
    val f1 = got.filter(_.id == 1L)
    assert(f1.map(_.offset).toSeq ===
      (0 until 8).map(j => j.toLong * (200 - 64) / 7))
    // homogeneous payloads: every frame sum = 64 * byte value
    assert(f1.map(_.frame_sum).distinct.toSeq === Seq(64L * 'x'.toLong))
    val f3 = got.filter(_.id == 3L)
    assert(f3.map(_.offset).distinct.toSeq === Seq(0L))
    assert(f3.map(_.frame_sum).distinct.toSeq === Seq(64L * 'y'.toLong))
    // first and last frames pin the stream ends
    assert(f1.head.offset === 0L && f1.last.offset === (200 - 64).toLong)
  }
}
