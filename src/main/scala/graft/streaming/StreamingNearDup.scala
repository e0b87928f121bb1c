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
  * The fingerprint table grows with the corpus; a production
  * deployment compacts/buckets it by `fp` on a cadence (the
  * incremental-dedup-table shape, like StreamingAudit's seen-values
  * ledger) so the per-batch join prunes to matching buckets.
  *
  * Delivery semantics are AT-LEAST-ONCE (the [[StreamingIndex]]
  * contract): a crash between the appends and the checkpoint commit
  * replays the batch — duplicated fingerprint/flag rows, never lost
  * ones. Consumers census flags with countDistinct; reconciliation
  * dedups the fingerprint table by (doc_id, fp).
  */
object StreamingNearDup {

  /** Start an AvailableNow flag stream over JSONL documents
    * {doc_id, text} under `dropDir`. Fingerprints accumulate in
    * `workDir/fps`, flagged ids (with the batch id) append to
    * `workDir/flags`.
    */
  def flagStream(spark: SparkSession, dropDir: String, workDir: String,
      checkpointDir: String, k: Int = 5, w: Int = 4, minShared: Int = 2,
      maxFilesPerTrigger: Int = 1): StreamingQuery = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    val fpDir = s"$workDir/fps"
    val flagDir = s"$workDir/flags"
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dropDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          processBatch(spark, batch, fpDir, flagDir, batchId, k, w, minShared)
        }
      }
      .start()
  }

  /** One batch: fingerprint, match against prior + intra-batch
    * lower ids, append flags and fingerprints. Public for the spec.
    */
  def processBatch(spark: SparkSession, batch: DataFrame, fpDir: String,
      flagDir: String, batchId: Long, k: Int, w: Int, minShared: Int): Unit = {
    val newFps = Winnow.fingerprints(
      batch.filter(col("text").isNotNull), "doc_id", "text", k, w)
      .persist()
    try {
      val prior =
        if (parquetExists(spark, fpDir)) spark.read.parquet(fpDir)
        else spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(Seq(StructField("doc_id", LongType),
            StructField("fp", StringType))))
      // pool = everything a new arrival can collide with: prior
      // batches plus the batch itself. The flagged id is the LARGER
      // of each qualifying pair — NOT "the new doc": a lower-id doc
      // arriving after its higher-id partner must still flag that
      // partner, or the flag set would depend on arrival order and
      // the id-order contract (and batch replayability) would break.
      // distinct BEFORE the fp join: the at-least-once contract means
      // a crash-replayed batch re-appends its fingerprints, and a
      // duplicated (doc_id, fp) row would double-count into _n_shared
      // — a pair sharing only 1 distinct fingerprint could then cross
      // minShared and be falsely flagged, breaking the "flag set is a
      // pure function of the corpus" contract. Dedup here (not just at
      // reconciliation) makes the flag derivation itself replay-proof.
      val pool = prior.unionByName(newFps)
        .select(col("doc_id").as("_id_old"), col("fp"))
        .distinct()
      val flagged = newFps
        .select(col("doc_id").as("_id_new"), col("fp"))
        .join(pool, Seq("fp"))
        .filter(col("_id_old") =!= col("_id_new"))
        .groupBy("_id_new", "_id_old")
        .agg(count(lit(1)).as("_n_shared"))
        .filter(col("_n_shared") >= minShared)
        .select(greatest(col("_id_new"), col("_id_old")).as("doc_id"))
        .distinct()
        .withColumn("batch", lit(batchId))
      // flags first: a crash between the writes replays the batch and
      // re-appends BOTH (at-least-once); flags-then-fps never leaves a
      // fingerprinted doc whose flag check was skipped
      flagged.write.mode("append").parquet(flagDir)
      newFps.write.mode("append").parquet(fpDir)
    } finally { newFps.unpersist(blocking = false); () }
  }

  private def parquetExists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p)
  }
}
