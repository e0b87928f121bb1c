package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.operators.IvfIndex

/** Streaming ANN-index maintenance: embedding deliveries land in a
  * drop folder and each micro-batch is appended into the existing IVF
  * index (frozen quantizer — [[IvfIndex.append]]'s contract), so the
  * index trails the corpus by one trigger instead of one rebuild.
  * Pair with the drift ledger (`IvfIndex.driftReport`): when appends
  * degrade the quantizer, the ledger's needsRecluster fires and a
  * batch rebuild resets the baseline.
  *
  * Delivery semantics are AT-LEAST-ONCE into the index: foreachBatch
  * replays a batch whose parquet append already happened if the job
  * crashes between the append and the checkpoint commit — duplicated
  * vec_ids, never lost or corrupted ones (parquet append is atomic
  * per file). Production consumers either dedup by id at probe time
  * or run [[graft.operators.Dedup.deltaPairs]]-style reconciliation
  * after a crash; the parity gate replays crash-free and must match
  * the one-shot batch append bit-for-bit.
  */
object StreamingIndex {

  /** Start an AvailableNow append stream: JSON files under `dropDir`
    * (explicit `schema`; must match the index cells table — the
    * append's schema-drift guard enforces it per batch),
    * `maxFilesPerTrigger` files per micro-batch.
    */
  def appendStream(spark: SparkSession, dropDir: String, ckptDir: String,
      index: IvfIndex.Index, vecCol: String, schema: StructType,
      maxFilesPerTrigger: Int = 1, format: String = "json"): StreamingQuery =
    DropFolder.stream(spark, dropDir, schema, maxFilesPerTrigger, format)
      .writeStream
      .option("checkpointLocation", ckptDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) { IvfIndex.append(index, batch, vecCol); () }
      }
      .start()
}
