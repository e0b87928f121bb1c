package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Event-time windowed aggregation over a streaming event source —
  * the standard Structured Streaming shape (watermark + tumbling
  * window + state cleanup) that complements the no-watermark
  * rewarded-decision path: use THIS for metrics/monitoring streams
  * where bounded lateness is acceptable, and the compaction path
  * (StreamingIngest + Groom) where it is not.
  */
object StreamingAggregates {

  /** JSONL events {ts: epoch-seconds, event_type, value} under
    * `dropDir` → per (window, event_type) counts/sums with a
    * `lateness` watermark, appended to `outDir` as parquet.
    */
  def windowedCounts(spark: SparkSession, dropDir: String, outDir: String,
      checkpointDir: String, windowLength: String = "1 hour",
      lateness: String = "30 minutes", format: String = "json"): StreamingQuery = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType)))

    // null ts/event_type rows — including malformed json lines, which
    // PERMISSIVE parsing surfaces as all-null-field rows — would enter
    // the window state under a key the watermark can never close
    // (state grows forever, nothing is emitted for it): this filter is
    // the actual malformed-line guard
    val events = DropFolder.lenient(spark, dropDir, schema, format)
      .filter(col("ts").isNotNull && col("event_type").isNotNull)
      .select(
        timestamp_seconds(col("ts")).as("event_time"),
        col("event_type"), col("value"))

    events
      .withWatermark("event_time", lateness)
      .groupBy(window(col("event_time"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))
      .writeStream
      .outputMode("append") // watermark-closed windows only
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", outDir)
      .start()
  }
}
