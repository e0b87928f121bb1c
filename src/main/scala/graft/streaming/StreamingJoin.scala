package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}

/** Stream-stream watermarked join: the REAL-TIME analogue of the
  * decision↔reward association the batch pipeline does with
  * union + groupBy (Merge.ingest). Decisions and rewards arrive on
  * separate streams; a reward joins its decision iff it lands within
  * `maxRewardDelay` of the decision's event time.
  *
  * State stays bounded on both sides: the event-time range condition
  * plus the two watermarks let Spark expire a decision's join state
  * once the reward-side watermark passes decision_time +
  * maxRewardDelay — nothing accumulates forever, which is what makes
  * this shape survive an unbounded stream. Inner join emits each
  * match as soon as both sides have arrived (no watermark wait on the
  * emit path).
  */
object StreamingJoin {

  private val decisionSchema = StructType(Seq(
    StructField("decision_id", StringType),
    StructField("ts", LongType),
    StructField("item", StringType)))

  private val rewardSchema = StructType(Seq(
    StructField("decision_id", StringType),
    StructField("ts", LongType),
    StructField("reward", DoubleType)))

  // null keys/timestamps — including malformed json lines, which
  // PERMISSIVE parsing surfaces as all-null rows — would pin
  // unexpirable join state: this filter is the malformed-line guard
  private def sideStream(spark: SparkSession, dir: String,
      schema: StructType, format: String) =
    DropFolder.lenient(spark, dir, schema, format)
      .filter(col("decision_id").isNotNull && col("ts").isNotNull)

  /** JSONL decisions {decision_id, ts, item} under `decisionsDir` and
    * rewards {decision_id, ts, reward} under `rewardsDir` →
    * (decision_id, item, reward, delay_sec) appended to `outDir`.
    */
  def rewardJoinStream(spark: SparkSession, decisionsDir: String,
      rewardsDir: String, outDir: String, checkpointDir: String,
      lateness: String = "1 hour",
      maxRewardDelay: String = "2 hours",
      format: String = "json"): StreamingQuery = {
    val decisions = sideStream(spark, decisionsDir, decisionSchema, format)
      .select(col("decision_id"), timestamp_seconds(col("ts")).as("d_time"),
        col("item"))
      .withWatermark("d_time", lateness)
    val rewards = sideStream(spark, rewardsDir, rewardSchema, format)
      .filter(col("reward").isNotNull)
      .select(col("decision_id").as("r_decision_id"),
        timestamp_seconds(col("ts")).as("r_time"), col("reward"))
      .withWatermark("r_time", lateness)

    decisions.join(rewards,
      col("decision_id") === col("r_decision_id") &&
        col("r_time") >= col("d_time") &&
        col("r_time") <= col("d_time") + expr(s"interval $maxRewardDelay"))
      .select(col("decision_id"), col("item"), col("reward"),
        (unix_timestamp(col("r_time")) - unix_timestamp(col("d_time"))).as("delay_sec"))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", outDir)
      .start()
  }
}
