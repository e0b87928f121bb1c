package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.operators.Expectations.{Complete, Satisfies, Unique}

class ExpectationsSpec extends AnyFunSuite with SparkTestBase {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) ->
      ((Option(r.get(1)).map(_.asInstanceOf[Long]), r.getLong(2),
        r.getBoolean(3)))).toMap

  test("metrics are exact ppm and thresholds decide passed") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a"), 10L), (2L, Some("b"), 20L),
      (3L, None, 30L), (4L, Some("d"), 40L)
    ).toDF("id", "s", "v")
    val out = rows(Expectations.audit(df, Seq(
      Complete("s_complete", "s"),                          // 3/4
      Unique("id_unique", "id"),                            // 4/4
      Satisfies("v_small", col("v") <= 20, 500000L))))      // 2/4
    assert(out("s_complete") == ((Some(750000L), 1000000L, false)))
    assert(out("id_unique") == ((Some(1000000L), 1000000L, true)))
    assert(out("v_small") == ((Some(500000L), 500000L, true)))
  }

  test("duplicate keys fail uniqueness; null predicate rows don't satisfy") {
    import spark.implicits._
    val df = Seq((1L, Some(5L)), (1L, None), (2L, Some(50L)))
      .toDF("id", "v")
    val out = rows(Expectations.audit(df, Seq(
      Unique("id_unique", "id"),
      Satisfies("v_small", col("v") <= 10, 1L))))
    // 2 distinct over 3 rows = 666666 ppm (truncating div)
    assert(out("id_unique") == ((Some(666666L), 1000000L, false)))
    // the null-v row counts as UNsatisfied, like a SQL WHERE
    assert(out("v_small")._1.contains(333333L))
  }

  test("empty input yields null metrics and passed = false") {
    import spark.implicits._
    val df = Seq.empty[(Long, String)].toDF("id", "s")
    val out = rows(Expectations.audit(df, Seq(
      Complete("s_complete", "s"), Unique("id_unique", "id"))))
    assert(out("s_complete") == ((None, 1000000L, false)))
    assert(out("id_unique") == ((None, 1000000L, false)))
  }

  test("approx mode keeps the schema and passes on clean data") {
    import spark.implicits._
    val df = (1L to 200L).map(i => (i, s"s$i")).toDF("id", "s")
    val out = Expectations.audit(df, Seq(
      Complete("s_complete", "s"), Unique("id_unique", "id")),
      exact = false)
    assert(out.columns.toSeq ==
      Seq("expectation", "metric_x1e6", "threshold_x1e6", "passed"))
    // approx_count_distinct's default rsd (5%) can dip the ppm below
    // the strict 10^6 threshold — the metric must still be close
    val m = rows(out)("id_unique")._1.get
    assert(m > 900000L && m < 1100000L)
  }

  test("N constraints still read the input exactly once") {
    import spark.implicits._
    val df = (1L to 50L).map(i => (i, s"s$i", i % 7)).toDF("id", "s", "v")
    val plan = Expectations.audit(df, Seq(
      Complete("s_complete", "s"),
      Unique("id_unique", "id"),
      Satisfies("v_small", col("v") <= 3, 1L),
      Satisfies("v_big", col("v") > 3, 1L))).queryExecution.optimizedPlan
    val leaves = plan.collectLeaves()
    assert(leaves.size == 1,
      s"expected ONE leaf (single scan), got ${leaves.size}:\n$plan")
  }

  test("guards: empty list, duplicate and unsafe names rejected") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("id", "s")
    intercept[IllegalArgumentException](Expectations.audit(df, Seq.empty))
    intercept[IllegalArgumentException](Expectations.audit(df, Seq(
      Complete("x", "s"), Unique("x", "id"))))
    intercept[IllegalArgumentException](Expectations.audit(df, Seq(
      Complete("bad name'", "s"))))
  }
}
