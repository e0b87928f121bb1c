package graft.encoding

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.core.CanonicalJson
import graft.schema.RewardedDecisionRow

/** Propensity-encoding golden fixtures from the reference
  * (tests/test_cases/trainer_test_cases/encode_for_train_*.json and
  * encode_partition*.json): each rewarded decision must expand to the
  * exact flattened training rows — chosen (y=1, w=1) and sample
  * (y=0, w=count−1) — with the KSUID timestamp as `t`.
  */
class EncodeFixtureSpec extends AnyFunSuite with SparkTestBase {

  private val casesDir = "/root/reference/tests/test_cases/trainer_test_cases"

  private val caseNames = Seq(
    "encode_for_train_full",
    "encode_for_train_null_sample",
    "encode_for_train_empty_context_no_sample",
    "encode_for_train_empty_item_no_context_no_sample",
    "encode_partition",
    "encode_partition_no_sample",
    "encode_partition_none_sample",
    "encode_partition_none_item",
    "encode_partition_empty_context_no_sample",
    "encode_partition_empty_item_no_context_no_sample",
  )

  private def rowFromRecord(rec: com.fasterxml.jackson.databind.JsonNode): RewardedDecisionRow = {
    def dumpsOpt(field: String): Option[String] =
      if (rec.has(field)) Some(CanonicalJson.dumps(rec.get(field))) else None
    RewardedDecisionRow(
      decision_id = rec.get("decision_id").textValue(),
      item = dumpsOpt("item").orElse(Some("null")),
      context = dumpsOpt("context").orElse(Some("null")),
      count = Option(rec.get("count")).filterNot(_.isNull).map(_.doubleValue()),
      sample = dumpsOpt("sample"),
      rewards = None, reward = None, model = "m")
  }

  for (name <- caseNames) test(s"encoding golden fixture: $name") {
    val path = s"$casesDir/$name.json"
    assume(new java.io.File(path).exists())
    import spark.implicits._
    val fixture = CanonicalJson.parse(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))))
    val tc = fixture.get("test_case")
    val records =
      if (tc.has("records")) (0 until tc.get("records").size()).map(tc.get("records").get(_))
      else Seq(tc.get("record"))
    val expected = {
      val arr = fixture.get("test_output")
      (0 until arr.size()).map(arr.get(_))
    }

    val df = records.map(rowFromRecord).toDF()
    val expanded = Encoding.withFlatFeatures(Encoding.expandForPropensity(df))
      .withColumn("nums",
        map_concat(col("nums"), map(lit(Encoding.TimestampFeature), col("_t"))))

    // row identity: (t, y); per (t, y) compare the full feature maps
    val actual = expanded
      .select(col("nums"), col("strs"), col(Encoding.WeightCol), col(Encoding.TargetCol))
      .collect()
      .map { r =>
        val nums = r.getMap[String, Double](0).toMap +
          (Encoding.WeightCol -> r.getDouble(2), Encoding.TargetCol -> r.getDouble(3))
        (nums, r.getMap[String, String](1).toMap)
      }

    assert(actual.length == expected.length, s"$name: row count")
    // multiset comparison: each expected row consumes one actual row
    val pool = scala.collection.mutable.ArrayBuffer.from(actual)
    expected.foreach { exp =>
      import scala.jdk.CollectionConverters._
      val expNums = exp.fields().asScala.filter(_.getValue.isNumber)
        .map(e => e.getKey -> e.getValue.doubleValue()).toMap
      val expStrs = exp.fields().asScala.filter(_.getValue.isTextual)
        .map(e => e.getKey -> e.getValue.textValue()).toMap
      val idx = pool.indexWhere { case (nums, strs) =>
        nums == expNums && strs == expStrs
      }
      assert(idx >= 0,
        s"$name: no expanded row matches expected $expNums / $expStrs; remaining: ${pool.toSeq}")
      pool.remove(idx)
    }
    assert(pool.isEmpty, s"$name: unmatched actual rows: ${pool.toSeq}")
  }
}
