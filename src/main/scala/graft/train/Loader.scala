package graft.train

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.{Groom, PartitionStore}
import graft.schema.Schema

/** Training-data loader (reference: src/trainer/code/parquet_io.py):
  * file selection happens on the LISTING (name-encoded row counts),
  * newest first, so a 100 TB store is never scanned to decide what to
  * read:
  *
  *   - walk keys in reverse-chronological order, stop when
  *     Σ rowcount · sample ≥ maxRows (O3 early stop);
  *   - when > fileSamplingMinRows rows across > fileSamplingMinFiles
  *     files, sample FILES (cheap) instead of rows (S4);
  *   - read only the selected files with column pruning + the
  *     orphaned-reward filter (item/context NOT NULL — P3) pushed to
  *     parquet, reward null-filled to 0.0 (P4);
  *   - final row-level sample trims to ~maxRows.
  */
object Loader {

  val FileSamplingMinRows = 1000000L
  val FileSamplingMinFiles = 100

  final case class Selection(keys: Seq[String], listedRows: Long, rowSampleFraction: Double)

  def selectFiles(keys: Seq[String], maxRows: Long, minRows: Long, sample: Double,
      seed: Long): Selection = {
    // newest first = reverse lexicographic (maxTs leads the filename)
    val desc = keys.reverse
    val counts = desc.map(Groom.rowCount)
    val total = counts.sum

    // effective sample honors minRows: if sampling would drop below
    // minRows, raise it back (propensities.py:73-76 semantics)
    val effSample =
      if (total * sample < minRows) math.min(1.0, minRows.toDouble / math.max(total, 1)) else sample

    // early stop: take newest files until Σ rows · sample ≥ maxRows
    var acc = 0L
    val taken = Seq.newBuilder[(String, Long)]
    desc.iterator.zip(counts.iterator).takeWhile { _ => acc < math.ceil(maxRows / effSample).toLong }
      .foreach { case (k, c) => taken += (k -> c); acc += c }
    var selected = taken.result()

    // file-level sampling for large selections
    val fileSampled =
      effSample < 1.0 && acc > FileSamplingMinRows && selected.length > FileSamplingMinFiles
    if (fileSampled) {
      val rnd = new scala.util.Random(seed)
      selected = selected.filter(_ => rnd.nextDouble() < effSample)
    }

    val listedRows = selected.map(_._2).sum
    // the sample applies ONCE: row-wise (reference parquet_io.py
    // ddf.sample(adjusted_sample)) — unless file-level sampling already
    // realized it, in which case rows are only trimmed to the maxRows
    // cap (composing both would sample at effSample² and break the
    // explore bootstrap's survival-rate contract)
    val capFraction = if (listedRows > maxRows) maxRows.toDouble / listedRows else 1.0
    val rowFraction =
      if (fileSampled) capFraction else math.min(effSample, capFraction)
    Selection(selected.map(_._1), listedRows, rowFraction)
  }

  /** Load ≈maxRows newest rewarded decisions from the store. */
  def load(spark: SparkSession, baseDir: String, model: String,
      maxRows: Long, minRows: Long = 0L, sample: Double = 1.0,
      seed: Long = 0L, filterOrphans: Boolean = true): DataFrame = {
    val keys = PartitionStore.listKeys(spark, baseDir, model)
    val sel = selectFiles(keys, maxRows, minRows, sample, seed)
    if (sel.keys.isEmpty) return spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Schema.rewardedDecision)
    // S5: per-file corruption tolerance — a bad partition file yields
    // an empty scan for that file instead of failing the job
    var df = spark.read.schema(Schema.rewardedDecision)
      .option("ignoreCorruptFiles", "true")
      .parquet(sel.keys.map(k => s"$baseDir/$k"): _*)
    if (filterOrphans)
      df = df.filter(col(Schema.Item).isNotNull && col(Schema.Context).isNotNull)
    if (sel.rowSampleFraction < 1.0) df = df.sample(sel.rowSampleFraction, seed)
    df.withColumn(Schema.Reward, coalesce(col(Schema.Reward), lit(0.0)))
  }
}
