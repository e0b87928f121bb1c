package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media ride as opaque `binary` columns
  * with a typed metadata struct; decode / feature-extract run as
  * typed mapPartitions batches (the JVM analogue of a Pandas UDF over
  * mapInPandas — per-partition batching, columnar in, columnar out).
  *
  * IMAGE payloads (PNG/JPEG/GIF/BMP by magic-number sniff) get a REAL
  * decode via `javax.imageio` — no extra dependency, it ships with
  * every JVM — and an exact-partition area-average resize over the
  * Rec.601 luminance plane. Non-image payloads (and image-lookalike
  * bytes ImageIO rejects) fall back to the deterministic byte-algebra
  * stubs, so text-derived test corpora keep their oracle hashes and
  * audio/video remain stub-decoded (those codecs are genuinely not in
  * the JVM; the drop-in point is `decodeStub`).
  */
object Multimodal {

  final case class MediaRow(id: Long, bytes: Array[Byte], mime: String)
  final case class MediaFeatures(id: Long, n_bytes: Int, entropy: Double,
      frame_mean: Double, n_frames: Int)

  /** Attach binary + metadata columns derived from a text column (the
    * testdata has no real media; bytes are the UTF-8 payload).
    */
  def withBinaryColumn(df: DataFrame, textCol: String, idCol: String,
      carryCols: Seq[String] = Nil): DataFrame =
    // carryCols ride along in the projection — re-joining the source
    // table later just to recover a metadata column would be a
    // corpus-sized shuffle for something the scan gives for free
    df.select(
      col(idCol).cast("long").as("id") +:
      encode(col(textCol), "UTF-8").as("bytes") +:
      struct(
        octet_length(encode(col(textCol), "UTF-8")).as("n_bytes"),
        lit("application/octet-stream").as("mime"),
        lit(1).as("channels")).as("media_meta") +:
      carryCols.map(col): _*)

  /** STUB decode: replace with a real codec (e.g. image decode +
    * resize) — signature and batching stay identical. Deterministic:
    * byte-histogram entropy + every-Nth-byte "frames".
    */
  def decodeStub(bytes: Array[Byte], frameStride: Int = 16): (Double, Double, Int) = {
    if (bytes.isEmpty) return (0.0, 0.0, 0)
    val hist = new Array[Long](256)
    bytes.foreach(b => hist(b & 0xff) += 1)
    val n = bytes.length.toDouble
    var entropy = 0.0
    hist.foreach { c =>
      if (c > 0) { val p = c / n; entropy -= p * math.log(p) / math.log(2) }
    }
    val frames = bytes.indices.by(frameStride).map(i => bytes(i) & 0xff)
    val frameMean = if (frames.isEmpty) 0.0 else frames.sum.toDouble / frames.size
    (entropy, frameMean, frames.size)
  }

  final case class MediaResized(id: Long, n_bytes: Int, resized: Seq[Int],
      resized_mean: Double, decode_status: String)

  /** Per-row decode outcome — the attributable census of why a payload
    * took (or fell back to) the stub path. A corpus where every image
    * silently stubbed out (e.g. a cap set too low for the incoming
    * resolution) must be a countable fact, not an invisible drop.
    */
  val StatusDecoded  = "decoded"   // real image decode succeeded
  val StatusNonImage = "non_image" // magic-number sniff: not an image payload
  val StatusOversize = "oversize"  // DECLARED dims exceed the pixel cap
  val StatusCorrupt  = "corrupt"   // sniffed as image but ImageIO rejects it

  // ---- real image codec (javax.imageio) ---------------------------------

  /** Decoded image as a Rec.601 luminance plane (0–255 per pixel). */
  final case class DecodedImage(width: Int, height: Int, luminance: Array[Int])

  /** Magic-number sniff for the formats the JVM's ImageIO decodes.
    * Cheap rejection first: ImageIO.read on arbitrary bytes costs
    * reader discovery per call, and most payloads are not images.
    */
  def sniffImage(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && (
      ((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G') ||
      ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8 && (bytes(2) & 0xff) == 0xff) ||
      (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == '8') ||
      (bytes(0) == 'B' && bytes(1) == 'M'))

  /** Default decode ceiling: a ~100-byte payload can DECLARE an
    * arbitrarily large canvas (decompression bomb), and the resulting
    * allocation failure would be an Error no catch-Exception guard
    * sees. 2^22 pixels (≈ 4 MP, a ~16 MB ARGB + 16 MB luminance
    * allocation per decode) is ample for curation thumbnails while
    * keeping the worst case bounded even at 8–16 concurrent decode
    * tasks per executor; callers with bigger inputs (and the executor
    * memory to match) pass their own cap to [[decodeImage]].
    */
  val MaxDecodePixels: Long = 1L << 22

  /** Real image decode: PNG/JPEG/GIF/BMP bytes → luminance plane.
    * None for non-image payloads, truncated/corrupt image bytes,
    * anything ImageIO cannot parse, or images whose DECLARED
    * dimensions exceed [[MaxDecodePixels]] (checked from the header
    * via ImageReader BEFORE any pixel allocation — a decompression
    * bomb must be declined, not OOM the executor) — callers fall back
    * to the byte stubs, never fail the job (a poisoned media batch
    * must not kill a 100 TB pass; count the Nones downstream if
    * signal is needed).
    */
  def decodeImage(bytes: Array[Byte],
      maxPixels: Long = MaxDecodePixels): Option[DecodedImage] =
    decodeImageWithStatus(bytes, maxPixels)._1

  /** [[decodeImage]] plus the outcome classification ([[StatusDecoded]]
    * / [[StatusNonImage]] / [[StatusOversize]] / [[StatusCorrupt]]) —
    * the per-row signal that makes a corpus-wide silent drop (every
    * 4–32 MP image stubbed out by the cap, a batch of truncated files)
    * attributable by cause instead of invisible.
    */
  def decodeImageWithStatus(bytes: Array[Byte],
      maxPixels: Long = MaxDecodePixels): (Option[DecodedImage], String) = {
    if (!sniffImage(bytes)) return (None, StatusNonImage)
    try {
      // ONE reader does both the header-only dimension check (no
      // pixel allocation yet) and, when the check passes, the actual
      // decode — reader discovery and header parse are paid once per
      // row, not twice
      var declinedAs = StatusCorrupt
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val decoded: Option[java.awt.image.BufferedImage] = try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis, true, true)
            val dw = reader.getWidth(0).toLong
            val dh = reader.getHeight(0).toLong
            if (dw <= 0 || dh <= 0) None
            else if (dw * dh > maxPixels) { declinedAs = StatusOversize; None }
            else Option(reader.read(0))
          } finally reader.dispose()
        }
      } finally iis.close()
      decoded match {
        case Some(img) =>
          val w = img.getWidth
          val h = img.getHeight
          val lum = new Array[Int](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              // integer Rec.601 luma — deterministic across JVMs
              lum(y * w + x) =
                (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)) / 1000
              x += 1
            }
            y += 1
          }
          (Some(DecodedImage(w, h, lum)), StatusDecoded)
        case None => (None, declinedAs)
      }
    } catch { case _: Exception => (None, StatusCorrupt) }
  }

  /** Exact-partition area-average resize: every source pixel belongs
    * to exactly one output cell (floor(y·outH/H), floor(x·outW/W)),
    * cell value = round(mean luminance) — pure integer/long
    * arithmetic, deterministic, single pass. Upscaling past the
    * source resolution leaves the uncovered cells 0 (use a real
    * interpolating scaler if upscale matters; curation thumbnails
    * only ever downscale).
    */
  def resizeArea(img: DecodedImage, outW: Int, outH: Int): Array[Int] = {
    require(outW > 0 && outH > 0, s"resize dims must be positive, got ${outW}x$outH")
    val sums = new Array[Long](outW * outH)
    val counts = new Array[Long](outW * outH)
    var y = 0
    while (y < img.height) {
      val ty = (y.toLong * outH / img.height).toInt
      var x = 0
      while (x < img.width) {
        val tx = (x.toLong * outW / img.width).toInt
        val t = ty * outW + tx
        sums(t) += img.luminance(y * img.width + x)
        counts(t) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(outW * outH)(i =>
      if (counts(i) == 0) 0 else math.round(sums(i).toDouble / counts(i)).toInt)
  }

  /** STUB resize: nearest-neighbor downsample of the byte stream to
    * `outLen` samples — the stand-in for image resize (replace with a
    * real scaler; the batching, schema, and determinism contract stay).
    * out(i) = bytes((i·n)/outLen), pure byte algebra ⇒ oracle-able.
    */
  def resizeStub(bytes: Array[Byte], outLen: Int): Array[Int] = {
    val n = bytes.length
    // long arithmetic: (outLen-1)·n overflows Int for ~70 MB payloads
    // at the default outLen, flipping the index negative — and the
    // oracle's DuckDB arithmetic is 64-bit
    if (n == 0) Array.empty
    else Array.tabulate(outLen)(i => bytes(((i.toLong * n) / outLen).toInt) & 0xff)
  }

  /** Batched resize over the binary column (typed mapPartitions — the
    * codec state initializes once per partition). Image payloads
    * (PNG/JPEG/GIF/BMP) get the REAL decode + outLen×outLen
    * area-average luminance thumbnail (outLen² samples); everything
    * else keeps the outLen-sample byte-stream stub, so non-image
    * corpora hash identically to the pre-codec implementation.
    */
  def resize(df: DataFrame, outLen: Int = 32): Dataset[MediaResized] = {
    require(outLen > 0, s"outLen must be positive, got $outLen")
    import df.sparkSession.implicits._
    df.select(col("id"), col("bytes"), col("media_meta.mime"))
      .as[MediaRow]
      .mapPartitions { it =>
        it.map { row =>
          val (img, status) = decodeImageWithStatus(row.bytes)
          val r = img match {
            case Some(d) => resizeArea(d, outLen, outLen)
            case None => resizeStub(row.bytes, outLen)
          }
          val mean = if (r.isEmpty) 0.0 else r.sum.toDouble / r.length
          MediaResized(row.id, row.bytes.length, r.toSeq, mean, status)
        }
      }
  }

  final case class MediaFrame(id: Long, frame_idx: Int, offset: Long,
      frame_sum: Long)

  /** Uniform FRAME SAMPLING over a binary "video" payload: k frames
    * of `frameLen` bytes at offsets spread evenly across the stream
    * (offset_j = floor(j·(n − frameLen)/(k − 1)), pure integer
    * algebra — reproducible in any engine that can slice the bytes),
    * each summarized by its exact byte sum. Payloads shorter than one
    * frame are skipped. A real video stack would replace the
    * byte-slice with codec frame extraction; the Spark-side shape —
    * typed flatMap, k-row fan-out per payload, per-partition batch —
    * is the real plumbing and is what the gate pins.
    */
  def sampleFrames(df: DataFrame, frameLen: Int, k: Int): Dataset[MediaFrame] = {
    require(frameLen > 0 && k >= 2, s"bad frame spec: len=$frameLen k=$k")
    import df.sparkSession.implicits._
    df.select(col("id"), col("bytes"), col("media_meta.mime"))
      .as[MediaRow]
      .flatMap { row =>
        val n = row.bytes.length
        if (n < frameLen) Iterator.empty
        else (0 until k).iterator.map { j =>
          val off = j.toLong * (n - frameLen) / (k - 1)
          var s = 0L
          var i = 0
          while (i < frameLen) {
            s += row.bytes(off.toInt + i) & 0xff
            i += 1
          }
          MediaFrame(row.id, j, off, s)
        }
      }
  }

  /** Batched feature extraction over the binary column. */
  def extractFeatures(df: DataFrame): Dataset[MediaFeatures] = {
    import df.sparkSession.implicits._
    df.select(col("id"), col("bytes"), col("media_meta.mime"))
      .as[MediaRow]
      .mapPartitions { it =>
        // per-partition batch: a real decoder would init its codec here once
        it.map { row =>
          val (entropy, frameMean, nFrames) = decodeStub(row.bytes)
          MediaFeatures(row.id, row.bytes.length, entropy, frameMean, nFrames)
        }
      }
  }

  // ---- deterministic planted payloads (fixtures for status gates) -------

  /** A tiny REAL PNG, encoded in-JVM — exercises the full
    * sniff → header check → decode path ([[StatusDecoded]]).
    * Stable within a JVM run (gate plant and oracle constant derive
    * from the same array in the same run).
    */
  lazy val tinyPngBytes: Array[Byte] = {
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 4)
      img.setRGB(x, y, ((x * 64) << 16) | ((y * 64) << 8) | 128)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** A syntactically valid PNG signature + IHDR DECLARING `w`×`h`
    * pixels (correct chunk CRC, no pixel data) — the decompression-
    * bomb shape: a ~33-byte payload claiming an arbitrarily large
    * canvas. The header-only dimension check must classify it
    * [[StatusOversize]] without allocating. */
  def pngDeclaring(w: Int, h: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    val ihdr = new java.io.ByteArrayOutputStream()
    ihdr.write("IHDR".getBytes("US-ASCII"))
    def be32(v: Int): Unit =
      ihdr.write(Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte))
    be32(w); be32(h)
    ihdr.write(Array[Byte](8, 2, 0, 0, 0)) // depth 8, truecolor, no interlace
    val body = ihdr.toByteArray
    bos.write(Array[Byte](0, 0, 0, (body.length - 4).toByte)) // chunk data length
    bos.write(body)
    val crc = new java.util.zip.CRC32()
    crc.update(body)
    val c = crc.getValue
    bos.write(Array((c >>> 24).toByte, (c >>> 16).toByte, (c >>> 8).toByte, c.toByte))
    bos.toByteArray
  }

  /** PNG magic followed by garbage — sniffs as image, rejected by the
    * reader ([[StatusCorrupt]]). */
  lazy val corruptPngBytes: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      Array.tabulate[Byte](24)(i => (i * 37 + 5).toByte)
}
