package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.operators.Expectations
import graft.operators.Expectations.{Complete, Satisfies, Unique}

class StreamingAuditSpec extends AnyFunSuite with SparkTestBase {

  private val es = Seq(
    Complete("s_complete", "s"),
    Unique("id_unique", "id"),
    Satisfies("v_small", col("v") <= 20, 500000L))

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("audit_spec").toString

  test("accumulated batches equal the one-shot batch audit") {
    import spark.implicits._
    val b0 = Seq((1L, Some("a"), 10L), (2L, Some("b"), 30L), (2L, None, 40L))
      .toDF("id", "s", "v")
    val b1 = Seq((3L, Some("c"), 5L), (1L, Some("d"), 50L))
      .toDF("id", "s", "v")
    val work = tmp()
    StreamingAudit.applyBatch(spark, b0, 0L, work, es)
    StreamingAudit.applyBatch(spark, b1, 1L, work, es)
    val streamed = StreamingAudit.result(spark, work, es)
      .orderBy("expectation").collect().map(_.toSeq)
    val batch = Expectations.audit(b0.unionByName(b1), es)
      .orderBy("expectation").collect().map(_.toSeq)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("replayed batch (crash between ledger write and commit) is idempotent") {
    import spark.implicits._
    val b0 = Seq((1L, Some("a"), 10L), (2L, Some("b"), 30L)).toDF("id", "s", "v")
    // b1 re-introduces id 2 (must not count as new) and adds id 3
    val b1 = Seq((2L, Some("c"), 5L), (3L, None, 50L)).toDF("id", "s", "v")
    val work = tmp()
    StreamingAudit.applyBatch(spark, b0, 0L, work, es)
    StreamingAudit.applyBatch(spark, b1, 1L, work, es)
    val once = StreamingAudit.result(spark, work, es)
      .orderBy("expectation").collect().map(_.toSeq)
    // crash/replay: the stream re-delivers batch 1 after its ledger
    // and totals partitions were already written
    StreamingAudit.applyBatch(spark, b1, 1L, work, es)
    val twice = StreamingAudit.result(spark, work, es)
      .orderBy("expectation").collect().map(_.toSeq)
    assert(twice.toSeq == once.toSeq)
    // and the replay also equals the batch ground truth
    val batch = Expectations.audit(b0.unionByName(b1), es)
      .orderBy("expectation").collect().map(_.toSeq)
    assert(twice.toSeq == batch.toSeq)
  }

  test("cross-batch duplicate ids are never double-counted as distinct") {
    import spark.implicits._
    val work = tmp()
    // id 7 arrives in THREE batches; distinct count must be 2 (7, 8)
    StreamingAudit.applyBatch(spark,
      Seq((7L, Some("x"), 1L)).toDF("id", "s", "v"), 0L, work, es)
    StreamingAudit.applyBatch(spark,
      Seq((7L, Some("y"), 2L)).toDF("id", "s", "v"), 1L, work, es)
    StreamingAudit.applyBatch(spark,
      Seq((7L, Some("z"), 3L), (8L, Some("w"), 4L)).toDF("id", "s", "v"),
      2L, work, es)
    val m = StreamingAudit.result(spark, work, es)
      .filter(col("expectation") === "id_unique")
      .select("metric_x1e6").head().getLong(0)
    // 2 distinct over 4 rows = 500000 ppm
    assert(m == 500000L)
  }
}
