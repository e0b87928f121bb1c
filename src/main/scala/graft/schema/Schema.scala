package graft.schema

import org.apache.spark.sql.types._

import graft.core.Ksuid
import java.time.format.DateTimeFormatter
import java.time.ZoneOffset

/** The rewarded-decision record: one row per decision, the core
  * relational table of the engine (reference:
  * src/ingest/firehose_record.py:32-40). `item`/`context`/`sample`
  * are canonical-JSON strings; `rewards` is a JSON map
  * {reward_message_id: reward}; `reward` is the sum of its values.
  * `sample` null means "absent"; a tracked-but-null sample is the
  * string "null" (absent ≠ null, firehose_record.py:145-149).
  */
final case class RewardedDecisionRow(
    decision_id: String,
    item: Option[String],
    context: Option[String],
    count: Option[Double],
    sample: Option[String],
    rewards: Option[String],
    reward: Option[Double],
    model: String)

object Schema {
  val DecisionId = "decision_id"
  val Item = "item"
  val Context = "context"
  val Count = "count"
  val Sample = "sample"
  val Rewards = "rewards"
  val Reward = "reward"
  val Model = "model"

  val EmptyRewardsJson = "{}"
  val NoRewardsValue = 0.0

  val ModelNameRegex = "^[a-zA-Z0-9][\\w\\-.]{0,63}$".r

  def isValidModelName(name: String): Boolean =
    name != null && name.length <= 64 && ModelNameRegex.matches(name)

  /** Rewarded-decision table schema (without the per-model column). */
  val rewardedDecision: StructType = StructType(Seq(
    StructField(DecisionId, StringType, nullable = false),
    StructField(Item, StringType, nullable = true),
    StructField(Context, StringType, nullable = true),
    StructField(Count, DoubleType, nullable = true),
    StructField(Sample, StringType, nullable = true),
    StructField(Rewards, StringType, nullable = true),
    StructField(Reward, DoubleType, nullable = true),
  ))
}

/** Partition-file naming: `{maxTs}-{minTs}-{count}-{uuid}.parquet`
  * under `rewarded_decisions/{model}/parquet/{yyyy}/{MM}/{dd}/`.
  * The name IS an index: max-timestamp first so a lexicographic
  * listing is ordered by max decision time; min-timestamp so that
  * overlapping decision-id ranges are detectable from the listing
  * alone (reference: src/ingest/partition.py:432-458).
  */
object PartitionFilename {
  private val BasicIso = DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'")
    .withZone(ZoneOffset.UTC)

  val FilenameRegex = """(\d{8}T\d{6}Z)-(\d{8}T\d{6}Z)-(\d+)-(.{36})\.parquet""".r
  val KeyRegex = ("""rewarded_decisions/.+/parquet/\d{4}/\d{2}/\d{2}/""" +
    """\d{8}T\d{6}Z-\d{8}T\d{6}Z-\d+-(.){36}\.parquet""").r

  final case class Parsed(maxTs: String, minTs: String, rowCount: Long, uuid: String)

  def timestampOf(decisionId: String): String =
    BasicIso.format(java.time.Instant.ofEpochSecond(
      Ksuid.timestampSeconds(decisionId).getOrElse(
        throw new IllegalArgumentException(s"invalid ksuid $decisionId"))))

  def filename(minDecisionId: String, maxDecisionId: String, rowCount: Long): String = {
    val maxTs = timestampOf(maxDecisionId)
    val minTs = timestampOf(minDecisionId)
    s"$maxTs-$minTs-$rowCount-${java.util.UUID.randomUUID()}.parquet"
  }

  /** Relative key for a chunk, reference key layout. Delegates the
    * name to filename() — the name IS an index parsed by groom, so
    * there must be exactly one place that renders it.
    */
  def key(model: String, minDecisionId: String, maxDecisionId: String, rowCount: Long): String = {
    val maxTs = timestampOf(maxDecisionId)
    val (yyyy, mm, dd) = (maxTs.substring(0, 4), maxTs.substring(4, 6), maxTs.substring(6, 8))
    s"rewarded_decisions/$model/parquet/$yyyy/$mm/$dd/" +
      filename(minDecisionId, maxDecisionId, rowCount)
  }

  def parse(name: String): Option[Parsed] = name match {
    case FilenameRegex(maxTs, minTs, count, uuid) => Some(Parsed(maxTs, minTs, count.toLong, uuid))
    case _ => None
  }

  def isValidKey(key: String): Boolean = KeyRegex.matches(key)
}
