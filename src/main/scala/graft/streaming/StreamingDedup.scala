package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming exact deduplication of a document feed — the ingestion
  * guard in front of a training-data lake: drop re-crawled/re-sent
  * duplicates AT ARRIVAL so downstream storage and the (batch)
  * near-dup pipeline see each content fingerprint once.
  *
  * `dropDuplicatesWithinWatermark` keys state by content fingerprint
  * (md5 of normalized text — same fingerprint the batch
  * `q_fingerprint` path uses) and expires state with the watermark, so
  * state is bounded by the dedup horizon × arrival rate instead of
  * growing with the corpus: the streaming analogue of the batch
  * hash-groupBy. Duplicates farther apart than the horizon are left
  * for the batch pipeline (exact groupBy or MinHash) — the split a
  * 100 TB deployment wants anyway, since unbounded streaming state
  * for an append-forever corpus cannot fit any cluster.
  */
object StreamingDedup {

  /** JSONL documents {doc_id, ts: epoch-seconds, text} under
    * `dropDir` → first arrival per content fingerprint within the
    * `horizon` watermark, appended to `outDir` as parquet with the
    * fingerprint column attached.
    */
  def dedupStream(spark: SparkSession, dropDir: String, outDir: String,
      checkpointDir: String, horizon: String = "1 hour",
      format: String = "json"): StreamingQuery =
    dedup(readDocs(spark, dropDir, format), horizon)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", outDir)
      .start()

  /** The transformation alone (testable without a sink): attach the
    * content fingerprint, watermark, and keep each fingerprint's first
    * arrival within the horizon.
    */
  def dedup(docs: DataFrame, horizon: String): DataFrame =
    docs
      // EXACTLY the batch q_fingerprint key (substring(md5, 1, 16)) —
      // the documented handoff ("duplicates farther apart than the
      // horizon are left for the batch pipeline") joins streaming
      // output against batch fingerprints, so the keys must be
      // byte-identical, not merely both md5-derived
      .withColumn("fp", substring(md5(lower(trim(col("text")))), 1, 16))
      .withWatermark("event_time", horizon)
      .dropDuplicatesWithinWatermark("fp")

  private def readDocs(spark: SparkSession, dropDir: String,
      format: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    // null-FIELD rows — including malformed json lines, which
    // PERMISSIVE parsing surfaces as all-null rows — are dropped
    // here: a null event_time/fingerprint row would otherwise be
    // emitted as an all-null record (first one) or silently swallowed
    // as late data once the watermark moves. (The batch ingest path
    // censuses its rejects — FirehoseRecords; here the guard keeps
    // the stream clean and the invalid line count is observable via
    // input-minus-output metrics.)
    DropFolder.lenient(spark, dropDir, schema, format)
      .filter(col("doc_id").isNotNull &&
        col("ts").isNotNull && col("text").isNotNull)
      .select(
        col("doc_id"),
        timestamp_seconds(col("ts")).as("event_time"),
        col("text"))
  }
}
