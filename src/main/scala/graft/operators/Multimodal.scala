package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media ride as opaque `binary` columns
  * with a typed metadata struct; decode / feature-extract run as
  * typed mapPartitions batches (the JVM analogue of a Pandas UDF over
  * mapInPandas — per-partition batching, columnar in, columnar out).
  *
  * The actual media decode is STUBBED (no image/audio libraries in
  * this container): `decodeStub` derives deterministic pseudo-features
  * (byte histogram entropy, stride "frame samples") from the raw
  * bytes, so every piece of Spark-side plumbing — schema, metadata,
  * batch shape, partitioning — is real and testable, and a real codec
  * drops in by replacing ONE function.
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
      resized_mean: Double)

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

  /** Batched resize over the binary column (typed mapPartitions — a
    * real scaler would init once per partition, like extractFeatures).
    */
  def resize(df: DataFrame, outLen: Int = 32): Dataset[MediaResized] = {
    require(outLen > 0, s"outLen must be positive, got $outLen")
    import df.sparkSession.implicits._
    df.select(col("id"), col("bytes"), col("media_meta.mime"))
      .as[MediaRow]
      .mapPartitions { it =>
        it.map { row =>
          val r = resizeStub(row.bytes, outLen)
          val mean = if (r.isEmpty) 0.0 else r.sum.toDouble / r.length
          MediaResized(row.id, row.bytes.length, r.toSeq, mean)
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
}
