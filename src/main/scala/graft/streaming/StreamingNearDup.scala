package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.operators.Winnow

/** Streaming NEAR-duplicate detection at arrival: each micro-batch's
  * documents are winnow-fingerprinted ([[Winnow.fingerprints]] — the
  * MOSS min-per-window selection), matched against the incrementally
  * maintained fingerprint table, and flagged when they share at least
  * `minShared` fingerprints with ANY lower-id document (prior batches
  * or earlier in the same batch). [[StreamingDedup]] catches exact
  * duplicates with bounded watermark state; this catches near-dups
  * and quote inclusion, which no single content hash can key.
  *
  * The flag contract is ID-ORDER, not arrival-order: a document is
  * flagged iff a SMALLER-id document shares ≥ minShared fingerprints.
  * That makes the flag set a pure function of the corpus —
  * independent of file batching — so streaming output is
  * batch-replayable and oracle-checkable bit-for-bit (the parity
  * gate's point). Arrival-order flagging would depend on listing
  * order; id-order costs nothing extra because the fingerprint table
  * carries ids anyway.
  *
  * Scale shape: per batch, ONE fingerprint derivation over the batch
  * (token-sized window, see Winnow), one equi-join against the
  * fingerprint table on `fp` (fan-in per fingerprint = its df —
  * bucket-bounded like the LSH band join), and two parquet appends.
  * The fingerprint table grows with the corpus, but the per-batch
  * cost does NOT: the prior-side scan is pruned to the new batch's
  * fingerprint set by a broadcast semi-join BEFORE the pair join, so
  * each micro-batch shuffles only the colliding slice of the store,
  * never the whole corpus.
  *
  * Delivery semantics are EXACTLY-ONCE by construction (the
  * [[StreamingRollup]] contract): each batch writes its fingerprints
  * and flags to its own `batch=<id>` partition with overwrite, so a
  * crash-replayed batch replaces its own output instead of appending
  * a duplicate — the store is duplicate-free without any per-batch
  * full-pool `distinct()`, and the flag derivation reads the prior
  * store EXCLUDING its own partition, making replay idempotent even
  * when the crash happened after the fingerprint write.
  */
object StreamingNearDup {

  /** Start an AvailableNow flag stream over JSONL documents
    * {doc_id, text} under `dropDir`. Fingerprints accumulate in
    * `workDir/fps`, flagged ids (with the batch id) append to
    * `workDir/flags`.
    */
  def flagStream(spark: SparkSession, dropDir: String, workDir: String,
      checkpointDir: String, k: Int = 5, w: Int = 4, minShared: Int = 2,
      maxFilesPerTrigger: Int = 1, format: String = "json"): StreamingQuery = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    val fpDir = s"$workDir/fps"
    val flagDir = s"$workDir/flags"
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    DropFolder.stream(spark, dropDir, schema, maxFilesPerTrigger, format)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      // no isEmpty pre-check: it costs a full extra decode of the
      // batch, and processBatch is empty-safe (an empty batch writes
      // empty partitions — idempotent under replay like any other)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(spark, batch, fpDir, flagDir, batchId, k, w, minShared)
      }
      .start()
  }

  /** One batch: fingerprint, match against prior + intra-batch
    * lower ids, overwrite this batch's own `batch=<id>` flag and
    * fingerprint partitions. Public for the spec.
    */
  def processBatch(spark: SparkSession, batch: DataFrame, fpDir: String,
      flagDir: String, batchId: Long, k: Int, w: Int, minShared: Int): Unit = {
    val newFps = Winnow.fingerprints(
      batch.filter(col("text").isNotNull), "doc_id", "text", k, w)
      .persist()
    try {
      // prior = every batch EXCEPT this one: on a crash replay the
      // store may already hold this batch's own partition (the fp
      // write committed before the checkpoint did), and re-reading it
      // would pair every new doc with itself-from-last-time. The
      // partition filter prunes it at the scan.
      val prior =
        if (parquetExists(spark, fpDir))
          spark.read.parquet(fpDir)
            .filter(col("batch") =!= batchId)
            .select("doc_id", "fp")
        else spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(Seq(StructField("doc_id", LongType),
            StructField("fp", StringType))))
      val flagged = flagDerivation(prior, newFps, minShared)
      // each write lands in the batch's OWN partition with overwrite:
      // replay replaces, never duplicates, so no ordering between the
      // two writes matters (both are idempotent given the prior
      // partitions, and the derivation above never reads them)
      flagged.write.mode("overwrite").parquet(s"$flagDir/batch=$batchId")
      newFps.write.mode("overwrite").parquet(s"$fpDir/batch=$batchId")
    } finally { newFps.unpersist(blocking = false); () }
  }

  /** The flag derivation for one batch, given the (duplicate-free)
    * prior fingerprint store and the batch's own fingerprints. The
    * flagged id is the LARGER of each qualifying pair — NOT "the new
    * doc": a lower-id doc arriving after its higher-id partner must
    * still flag that partner, or the flag set would depend on arrival
    * order and the id-order contract (and batch replayability) would
    * break.
    *
    * Scale shape: `prior` is corpus-sized but is pruned to the new
    * batch's fingerprint set by a BROADCAST semi-join before anything
    * shuffles — per-batch cost is O(batch + collisions), flat in the
    * store size. The pool distinct that makes pair counting exact
    * runs AFTER that prune, over the collision-sized relation, never
    * the corpus: batch=<id> overwrite already dedups whole-batch
    * crash replays, but the SAME document re-delivered in two
    * DIFFERENT batches (an at-least-once producer re-appending a
    * file) legitimately lands in two store partitions, and without
    * the distinct its duplicated (doc_id, fp) rows would double-count
    * into _n_shared — a pair sharing only one distinct fingerprint
    * could cross minShared and be falsely flagged. Public for the
    * spec's plan assertions.
    */
  def flagDerivation(prior: DataFrame, newFps: DataFrame,
      minShared: Int): DataFrame = {
    val pruned = prior.join(
      broadcast(newFps.select("fp").distinct()), Seq("fp"), "left_semi")
    val pool = pruned.unionByName(newFps.select("doc_id", "fp"))
      .select(col("doc_id").as("_id_old"), col("fp"))
      .distinct()
    newFps
      .select(col("doc_id").as("_id_new"), col("fp"))
      .join(pool, Seq("fp"))
      .filter(col("_id_old") =!= col("_id_new"))
      .groupBy("_id_new", "_id_old")
      .agg(count(lit(1)).as("_n_shared"))
      .filter(col("_n_shared") >= minShared)
      .select(greatest(col("_id_new"), col("_id_old")).as("doc_id"))
      .distinct()
  }

  private def parquetExists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p)
  }
}
