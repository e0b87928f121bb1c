package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Generic incremental ROLLUP over a file stream: any per-batch
  * derivation that produces a keyed relation with ADDITIVE value
  * columns (a Count–Min sketch's (seed, bucket) cells, an AUC score
  * histogram's (score, n_pos, n_neg), any mergeable count table)
  * accumulates by plain per-key addition — so the corpus-lifetime
  * state is maintained micro-batch by micro-batch without ever
  * rescanning history, and querying it is a keyed sum.
  *
  * Exactly-once across crash/replay, with NO driver state: each batch
  * OVERWRITES its own `batch=<id>` subdirectory with its contribution
  * — a replayed batch rewrites identical content, so the merged view
  * (partition-discovery read + one keyed sum) is a pure function of
  * the delivered files whatever the crash point (the
  * [[StreamingAudit]] partition-overwrite contract, minus the ledger:
  * a pure rollup needs no anti-join). A long-lived stream folds old
  * `batch=` partitions into a compacted base on a cadence — the
  * incremental-dedup-table compaction shape; per-batch layout is the
  * correctness mechanism, not a growth plan.
  *
  * Scale shape: per batch ONE map-side-combined aggregation (inside
  * `rollup`) and one bounded write; the merged read shuffles the
  * state relation (Σ per-batch cells), never raw history.
  */
object StreamingRollup {

  /** Start an AvailableNow rollup stream over `format` files in
    * `dropDir` (explicit `schema`; json default / parquet for bulk
    * replays — [[DropFolder]]): per micro-batch, `rollup(batch)`
    * computes the batch's keyed contribution, written to
    * `stateDir/batch=<id>`. Read the accumulated state with
    * [[merged]] after termination (or at any monitoring cadence).
    */
  def rollupStream(spark: SparkSession, dropDir: String, stateDir: String,
      ckptDir: String, schema: StructType, maxFilesPerTrigger: Int = 1,
      format: String = "json")(
      rollup: DataFrame => DataFrame): StreamingQuery =
    DropFolder.stream(spark, dropDir, schema, maxFilesPerTrigger, format)
      .writeStream
      .option("checkpointLocation", ckptDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        rollup(batch).write.mode("overwrite")
          .parquet(s"$stateDir/batch=$batchId")
        ()
      }
      .start()

  /** The corpus-lifetime rollup: per-batch contributions merged by one
    * keyed sum. Identical (by additivity) to running the rollup once
    * over everything delivered so far.
    */
  def merged(spark: SparkSession, stateDir: String, keyCols: Seq[String],
      sumCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && sumCols.nonEmpty,
      "key and sum columns required")
    spark.read.parquet(stateDir)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col(sumCols.head)).as(sumCols.head),
        sumCols.tail.map(c => sum(col(c)).as(c)): _*)
  }

  /** The growth plan: fold every `batch=<id>` partition with
    * id < `keepFromBatch` (plus any previous base) into ONE
    * `batch=-1` base partition, built in a FRESH `outDir` — newer
    * batch partitions are copied through unchanged, and the caller
    * swaps `outDir` into place with a single atomic rename (the
    * staged-build pattern, [[graft.pipeline.RdrPipeline]]): no crash
    * point leaves a half-compacted live state dir.
    *
    * Replay safety: only fold batches the stream's checkpoint has
    * COMMITTED (an AvailableNow/continuous restart replays at most
    * the in-flight batch, whose id is ≥ the last committed + 1 — so
    * `keepFromBatch` = that id keeps every replayable partition
    * overwritable). Folding is by additivity: `merged` over the
    * compacted dir equals `merged` over the original (spec-pinned).
    * The base id −1 can never collide with a real micro-batch id.
    */
  def compact(spark: SparkSession, stateDir: String, outDir: String,
      keyCols: Seq[String], sumCols: Seq[String],
      keepFromBatch: Long): Unit = {
    require(new java.io.File(outDir).toPath.toAbsolutePath !=
      new java.io.File(stateDir).toPath.toAbsolutePath,
      "compact builds a fresh dir; the caller swaps it in atomically")
    val dirs = Option(new java.io.File(stateDir).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
    val (fold, keep) = dirs.partition(
      _.getName.stripPrefix("batch=").toLong < keepFromBatch)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    if (fold.nonEmpty) {
      spark.read.parquet(fold.map(_.getPath).toIndexedSeq: _*)
        .groupBy(keyCols.map(col): _*)
        .agg(sum(col(sumCols.head)).as(sumCols.head),
          sumCols.tail.map(c => sum(col(c)).as(c)): _*)
        .write.mode("overwrite").parquet(s"$outDir/batch=-1")
    }
    keep.foreach { d =>
      val dst = java.nio.file.Paths.get(outDir, d.getName)
      java.nio.file.Files.walk(d.toPath).forEach { p =>
        val t = dst.resolve(d.toPath.relativize(p))
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.createDirectories(t)
        else java.nio.file.Files.copy(p, t,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        ()
      }
    }
  }
}
