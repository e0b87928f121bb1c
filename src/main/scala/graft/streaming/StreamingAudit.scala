package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.operators.Expectations
import graft.operators.Expectations.{Expectation, Unique}

/** Streaming data-quality expectations: the [[Expectations]] audit
  * accumulated incrementally over micro-batches — the "data-quality
  * monitor on the ingest stream" shape, where each delivery updates
  * the corpus-lifetime metrics instead of triggering a full rescan.
  *
  * Complete/Satisfies counters are plain mergeable longs: per batch,
  * ONE aggregation over the batch, then a driver-side add onto the
  * running totals (bounded state: one long per constraint). Unique is
  * the non-mergeable one — it rides an incremental SEEN-VALUES ledger
  * per unique constraint: batch-distinct values anti-join the ledger
  * (new ones count, and only they are appended), which is the
  * incremental-dedup-table shape a 100 TB ingest keeps anyway. The
  * ledger stays a distributed keyed relation; only counters reach the
  * driver.
  *
  * Exactly-once across crash/replay: every batch writes its ledger
  * contribution AND its cumulative totals under `batch=<id>`
  * subdirectories (overwrite-by-partition). A replayed batch
  * anti-joins only ledger partitions with `batch < id` and overwrites
  * its own partitions, reproducing the identical state — no
  * double-count, no loss, whatever the crash point. (A long-lived
  * stream would fold old `batch=` partitions into a compacted base
  * periodically; the per-batch layout is the correctness mechanism,
  * not a growth plan.)
  */
object StreamingAudit {

  /** Start an AvailableNow audit stream over JSON files in `dropDir`
    * (explicit `schema`). State lives under `workDir` (`totals/` and
    * `seen_<i>/` ledgers). After termination, read the result with
    * [[result]].
    */
  def auditStream(spark: SparkSession, dropDir: String, workDir: String,
      ckptDir: String, schema: StructType, expectations: Seq[Expectation],
      maxFilesPerTrigger: Int = 1, format: String = "json"): StreamingQuery = {
    Expectations.validate(expectations)
    DropFolder.stream(spark, dropDir, schema, maxFilesPerTrigger, format)
      .writeStream
      .option("checkpointLocation", ckptDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(spark, batch, batchId, workDir, expectations)
      }
      .start()
  }

  private def counterCols(expectations: Seq[Expectation]): Seq[String] =
    "_n" +: expectations.indices.map(i => s"_m$i")

  private[streaming] def applyBatch(spark: SparkSession, batch: DataFrame,
      batchId: Long, workDir: String, expectations: Seq[Expectation]): Unit = {
    // the batch feeds one counter agg plus, per Unique constraint, a
    // distinct + anti-join — pin it so the source files are read once
    batch.persist()
    try {
      // mergeable counters in ONE agg over the batch; Unique slots are
      // placeholders here (their counts come from the ledgers below)
      val aggs = Expectations.counterAggs(expectations, exact = true)
        .zip(None +: expectations.map(Some(_))).map {
          case (_, Some(Unique(_, _, _))) => lit(0L)
          case (a, _) => a
        }
      val plainRow = batch.agg(aggs.head, aggs.tail: _*).head()

      // per-Unique incremental distinct: batch-distinct ∖ prior ledger
      val uniqueCounts = expectations.zipWithIndex.map {
        case (Unique(_, column, _), i) =>
          val ledger = s"$workDir/seen_$i"
          val batchVals = batch.select(col(column).as("v"))
            .filter(col("v").isNotNull).distinct()
          val fresh = ledgerBefore(spark, ledger, batchId) match {
            case Some(p) => batchVals.join(p, Seq("v"), "left_anti")
            case None => batchVals
          }
          // overwrite THIS batch's partition (replay-idempotent), then
          // COUNT THE WRITTEN FILES — one execution of the anti-join,
          // and the count provably matches what the ledger now holds
          fresh.write.mode("overwrite").parquet(s"$ledger/batch=$batchId")
          i -> spark.read.parquet(s"$ledger/batch=$batchId").count()
        case (_, i) => i -> 0L
      }.toMap

      // cumulative totals: previous batch's row + this batch's deltas
      val cols = counterCols(expectations)
      val prevTotals = readTotals(spark, s"$workDir/totals", batchId, cols)
      val totals = cols.zipWithIndex.map { case (c, j) =>
        val plain = Option(plainRow.get(j)).map(_.asInstanceOf[Long]).getOrElse(0L)
        val delta = plain + (if (j == 0) 0L else uniqueCounts.getOrElse(j - 1, 0L))
        c -> (delta + prevTotals.getOrElse(c, 0L))
      }
      spark.range(1)
        .select(totals.map { case (c, v) => lit(v).as(c) }: _*)
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$workDir/totals/batch=$batchId")
    } finally batch.unpersist(blocking = false)
  }

  /** Ledger rows visible to batch `batchId`: partitions with a
    * STRICTLY smaller batch id (a replayed batch must not see its own
    * earlier, possibly partial, contribution). One partitioned read
    * with a filter on the `batch` partition column — native partition
    * pruning, flat plan, whatever the stream's age.
    */
  private def ledgerBefore(spark: SparkSession, dir: String,
      batchId: Long): Option[DataFrame] =
    if (listBatches(spark, dir).isEmpty) None
    else Some(spark.read.parquet(dir)
      .where(col("batch") < batchId).select("v"))

  private def readTotals(spark: SparkSession, dir: String, batchId: Long,
      cols: Seq[String]): Map[String, Long] =
    listBatches(spark, dir).filter(_ < batchId).sorted.lastOption match {
      case None => Map.empty
      case Some(b) =>
        val row = spark.read.parquet(s"$dir/batch=$b").head()
        cols.map(c => c -> row.getAs[Long](c)).toMap
    }

  /** State listing through the Hadoop FileSystem API (repo convention
    * — ModelStore/PartitionStore do the same), so a non-local
    * `workDir` (hdfs://, s3a://) works instead of silently listing
    * nothing via the local filesystem.
    */
  private def listBatches(spark: SparkSession, dir: String): List[Long] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) Nil
    else fs.listStatus(path).toList.map(_.getPath.getName)
      .filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong)
  }

  /** The audit result after the stream terminates: the LAST cumulative
    * totals row projected through the identical
    * [[Expectations.project]] arithmetic the batch audit uses.
    */
  def result(spark: SparkSession, workDir: String,
      expectations: Seq[Expectation]): DataFrame = {
    val ids = listBatches(spark, s"$workDir/totals")
    require(ids.nonEmpty, s"no audit totals under $workDir/totals")
    Expectations.project(
      spark.read.parquet(s"$workDir/totals/batch=${ids.max}"), expectations)
  }
}
