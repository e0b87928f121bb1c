package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.core.CanonicalJson
import graft.schema.Schema

/** End-to-end ingest+merge against the reference's golden merge
  * fixtures (tests/test_cases/tracker_test_cases merge cases plus the
  * data/merge fixture files): gzipped firehose JSONL (optionally
  * unioned with already-merged parquet partitions) must merge to the
  * expected parquet, value-for-value, per model.
  */
class MergeFixtureSpec extends AnyFunSuite with SparkTestBase {

  private val casesDir = "/root/reference/tests/test_cases/tracker_test_cases"
  private val dataDir = "/root/reference/tests/test_cases/data/merge"

  private val caseNames = Seq(
    "single_model_merge_initial_batch",
    "single_model_merge_initial_batch_with_null_variants",
    "single_model_merge_only_additional_rewards_batch",
    "single_model_merge_initial_batch_and_additional_rewards_batch",
    "single_model_merge_initial_batch_and_additional_rewards_with_null_variants",
    "single_model_merge_additional_rewards_and_initial_batch_with_null_variants",
    "single_model_merge_test_json_property",
    "multiple_models_merge_initial_batch",
    "multiple_models_merge_initial_batch_additional_columns",
    "multiple_models_merge_only_additional_rewards_batch",
    "multiple_models_merge_initial_batch_and_additional_rewards_batch",
    "multiple_models_merge_initial_batch_and_additional_rewards_batch_additional_columns",
  )

  private def fixtureTime = 1767225600L // 2026-01-01, after all fixture ksuids

  private def dfColumns = Seq(Schema.DecisionId, Schema.Item, Schema.Context,
    Schema.Count, Schema.Sample, Schema.Rewards, Schema.Reward)

  private def loadCase(name: String) = {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$casesDir/$name.json")))
    CanonicalJson.parse(text)
  }

  private def collectSorted(df: DataFrame): Seq[Seq[Any]] =
    df.select(dfColumns.map(col): _*).orderBy(Schema.DecisionId)
      .collect().toSeq.map(_.toSeq)

  private def assertSameTable(actual: DataFrame, expected: DataFrame, ctx: String): Unit = {
    val a = collectSorted(actual)
    val e = collectSorted(expected)
    assert(a.length == e.length, s"$ctx: row count ${a.length} != ${e.length}")
    a.zip(e).zipWithIndex.foreach { case ((ar, er), i) =>
      ar.zip(er).zip(dfColumns).foreach { case ((av, ev), colName) =>
        (av, ev) match {
          case (x: Double, y: Double) =>
            assert(math.abs(x - y) < 1e-9, s"$ctx row $i col $colName: $x != $y")
          case _ =>
            assert(av == ev, s"$ctx row $i col $colName: $av != $ev")
        }
      }
    }
  }

  test("duplicate reward message_id in one batch resolves identically under any partitioning") {
    import spark.implicits._
    // two rewards carrying the SAME reward message_id but different
    // values, plus a re-tracked decision with a different payload — the
    // merged row must not depend on partition layout or task retry
    val decisionId = "2PjCcQ3KUDvRzJzbS5V4wNX8XyZ"
    val rows = Seq(
      (decisionId, Some("\"itemA\""), Some("{}"), Some(2.0), None: Option[String], None: Option[String], "m"),
      (decisionId, Some("\"itemB\""), Some("{}"), Some(2.0), None: Option[String], None: Option[String], "m"), // duplicate decision
      (decisionId, None: Option[String], None: Option[String], None: Option[Double], None: Option[String], Some("""{"2PjCcQ3KUDvRzJzbS5V4wNXrwd":1.5}"""), "m"),
      (decisionId, None: Option[String], None: Option[String], None: Option[Double], None: Option[String], Some("""{"2PjCcQ3KUDvRzJzbS5V4wNXrwd":2.5}"""), "m"))
      .toDF(Schema.DecisionId, Schema.Item, Schema.Context, Schema.Count,
        Schema.Sample, Schema.Rewards, Schema.Model)

    val results = Seq(1, 8, 3).map { n =>
      Merge.merge(rows.repartition(n)).collect().map(_.toSeq).toSeq
    }
    assert(results(0) == results(1) && results(1) == results(2),
      s"merge result depends on partitioning: $results")
    assert(results(0).length == 1)
  }

  for (name <- caseNames) test(s"golden merge fixture: $name") {
    assume(new java.io.File(s"$casesDir/$name.json").exists())
    val tc = loadCase(name).get("test_case")
    val gz = tc.get("gzipped_records").textValue()
    val models = (0 until tc.get("model_names").size())
      .map(tc.get("model_names").get(_).textValue())
    val expectedFiles = {
      val arr = loadCase(name).get("expected_outputs_files")
      (0 until arr.size()).map(arr.get(_).textValue())
    }
    val mergedKeys = Option(tc.get("merged_s3_keys")).filterNot(_.isNull).map { arr =>
      (0 until arr.size()).map(arr.get(_).textValue())
    }

    // fresh firehose batch (merged AFTER existing partitions, so its
    // reward values win on duplicate keys)
    val fresh = FirehoseRecords.records(spark, Seq(s"$dataDir/$gz"), fixtureTime).toDF()
      .withColumn(Merge.SrcOrder, lit(1))

    // pre-existing merged partitions; fixture file i belongs to model i
    val existing: Option[DataFrame] = mergedKeys.map { keys =>
      keys.zip(models).map { case (key, model) =>
        // project down (additional-columns fixtures) and force the
        // canonical types: pandas writes all-null object columns as
        // un-annotated BINARY, which would coerce the union to binary
        spark.read.parquet(s"$dataDir/$key")
          .select(Schema.rewardedDecision.fields.map(f =>
            col(f.name).cast(f.dataType).as(f.name)): _*)
          .withColumn(Schema.Model, lit(model))
          .withColumn(Merge.SrcOrder, lit(0))
      }.reduce(_.unionByName(_))
    }

    val all = existing.map(fresh.unionByName(_)).getOrElse(fresh)
    val merged = Merge.merge(all)

    models.zip(expectedFiles).foreach { case (model, expectedFile) =>
      val actual = merged.filter(col(Schema.Model) === model)
      val expected = spark.read.parquet(s"$dataDir/$expectedFile")
      assertSameTable(actual, expected, s"$name/$model")
    }
  }
}
