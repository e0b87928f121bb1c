package graft.ingest

import org.apache.spark.sql.{Dataset, SparkSession}

import com.fasterxml.jackson.databind.JsonNode
import graft.core.{CanonicalJson, Ksuid}
import graft.schema.{RewardedDecisionRow, Schema}

/** One parsed firehose line: either a projected rewarded-decision row
  * or a validation error (the reference counts invalid lines per
  * exception type; firehose_record.py:214-232).
  */
final case class ParsedLine(row: Option[RewardedDecisionRow], error: Option[String])

/** Firehose JSONL scan + per-record validation + projection to the
  * rewarded-decision schema (reference: src/ingest/firehose_record.py).
  *
  * Record subtypes are discriminated by the presence of `count`:
  *   - decision: {message_id, model, count ≥ 1, item?, context?, sample?}
  *     → row keyed by message_id, JSON payloads canonicalized;
  *     `sample` kept only when PRESENT (tracked-null → "null" string).
  *   - reward: {message_id, model, decision_id, reward}
  *     → partial row {decision_id, rewards: {message_id: reward}}.
  *
  * Parsing runs as a typed Dataset map (per-line Jackson) — the one
  * place imperative per-record logic is genuinely needed, because
  * "field present with null value" vs "field absent" cannot be
  * expressed with from_json/get_json_object. Scales linearly: no
  * shuffle, no driver involvement.
  */
object FirehoseRecords {

  /** Parse gzipped/uncompressed JSONL file(s) into rows + errors. */
  def parse(spark: SparkSession, paths: Seq[String],
      nowEpochSeconds: Long = System.currentTimeMillis() / 1000): Dataset[ParsedLine] = {
    import spark.implicits._
    val now = nowEpochSeconds
    spark.read.textFile(paths: _*).map(line => parseLine(line, now))
  }

  def records(spark: SparkSession, paths: Seq[String],
      nowEpochSeconds: Long = System.currentTimeMillis() / 1000): Dataset[RewardedDecisionRow] = {
    import spark.implicits._
    parse(spark, paths, nowEpochSeconds).flatMap(_.row)
  }

  /** Census of parse errors, mirroring the reference's exception
    * counting — returns (error, count) pairs.
    */
  def invalidCensus(parsed: Dataset[ParsedLine]): Map[String, Long] = {
    import parsed.sparkSession.implicits._
    parsed.flatMap(_.error).groupByKey(identity).count().collect().toMap
  }

  def parseLine(line: String, nowEpochSeconds: Long): ParsedLine = {
    def invalid(msg: String) = ParsedLine(None, Some(msg))
    CanonicalJson.tryParse(line) match {
      case None => invalid("invalid json")
      case Some(node) if !node.isObject => invalid("not a json object")
      case Some(node) =>
        try {
          val messageId = requiredText(node, "message_id")
          if (!Ksuid.isValid(messageId, nowEpochSeconds)) return invalid("invalid message_id")
          val model = requiredText(node, "model")
          if (!Schema.isValidModelName(model)) return invalid("invalid model")

          val countNode = node.get("count")
          if (countNode != null && !countNode.isNull) {
            // decision record: count must be an integral number ≥ 1
            if (!countNode.isIntegralNumber || countNode.longValue() < 1)
              return invalid("invalid count")
            val count = countNode.longValue()
            val hasSample = node.has("sample")
            if (hasSample && count == 1) return invalid("invalid count of 1 with sample")
            ParsedLine(Some(RewardedDecisionRow(
              decision_id = messageId,
              item = Some(CanonicalJson.dumps(nodeOrNull(node, "item"))),
              context = Some(CanonicalJson.dumps(nodeOrNull(node, "context"))),
              count = Some(count.toDouble),
              sample = if (hasSample) Some(CanonicalJson.dumps(nodeOrNull(node, "sample"))) else None,
              rewards = None,
              reward = None,
              model = model)), None)
          } else {
            // reward record
            val decisionId = requiredText(node, "decision_id")
            if (!Ksuid.isValid(decisionId, nowEpochSeconds)) return invalid("invalid decision_id")
            val rewardNode = node.get("reward")
            if (rewardNode == null || !rewardNode.isNumber) return invalid("invalid reward")
            val rewards = s"""{"$messageId":${CanonicalJson.dumps(rewardNode)}}"""
            ParsedLine(Some(RewardedDecisionRow(
              decision_id = decisionId,
              item = None, context = None, count = None, sample = None,
              rewards = Some(rewards),
              reward = None,
              model = model)), None)
          }
        } catch {
          case e: IllegalArgumentException => invalid(e.getMessage)
        }
    }
  }

  // "missing" vs "invalid" are DIFFERENT census buckets (the
  // reference counts per exception type): a present-but-non-textual
  // field must not masquerade as an absent one in ingest diagnostics
  private def requiredText(node: JsonNode, field: String): String = {
    val v = node.get(field)
    if (v == null || v.isNull) throw new IllegalArgumentException(s"missing $field")
    if (!v.isTextual) throw new IllegalArgumentException(s"invalid $field")
    v.textValue()
  }

  private def nodeOrNull(node: JsonNode, field: String): JsonNode = {
    val v = node.get(field)
    if (v == null) CanonicalJson.nullNode else v
  }
}
