package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class QualitySpec extends AnyFunSuite with SparkTestBase {

  private def fixture = {
    import spark.implicits._
    Seq(
      // (id, grade, score, code, fk)
      (Some(1L), "A", 5.0, "ok1", Some(10L)),
      (Some(1L), "A", 5.0, "ok2", Some(10L)),  // dup id (x2)
      (Some(1L), "B", -1.0, "ok3", Some(11L)), // dup id (x3), score below range
      (Some(2L), "Z", 99.0, "bad word", Some(12L)), // bad grade+range+regex, orphan fk
      (None, "A", 5.0, "ok4", None)            // null id; null fk must be SKIPPED
    ).toDF("id", "grade", "score", "code", "fk").repartition(4)
  }

  private def ref = {
    import spark.implicits._
    // 10 appears twice: the distinct guard must not double-match
    Seq(10L, 10L, 11L).toDF("ref_id")
  }

  test("each rule counts its violations exactly; nulls route to not_null only") {
    val out = Quality.check(fixture, Seq(
      Quality.NotNull("id"),
      Quality.InSet("grade", Seq("A", "B")),
      Quality.InRange("score", 0.0, 10.0),
      Quality.Matches("code", "^[a-z0-9]+$"),
      Quality.Unique(Seq("id")),
      Quality.ForeignKey(Seq("fk"), ref, Seq("ref_id"))
    )).collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap

    assert(out("not_null(id)") == ((1L, 5L, false)))
    assert(out("in_set(grade:{A,B})") == ((1L, 5L, false)))   // only "Z"; null-free col
    assert(out("in_range(score,0.0,10.0)") == ((2L, 5L, false)))
    assert(out("matches(code:^[a-z0-9]+$)") == ((1L, 5L, false)))   // "bad word" has a space
    assert(out("unique(id)") == ((2L, 5L, false)))      // id=1 x3 → 2 excess
    assert(out("fk(fk->ref_id)") == ((1L, 4L, false)))  // null fk skipped, 12 orphan
  }

  test("clean data passes every rule; guard on empty rules") {
    import spark.implicits._
    val clean = Seq((1L, "A"), (2L, "B")).toDF("id", "grade")
    val out = Quality.check(clean, Seq(
      Quality.NotNull("id"), Quality.Unique(Seq("id")),
      Quality.InSet("grade", Seq("A", "B"))))
      .collect()
    assert(out.forall(_.getBoolean(3)), out.mkString(";"))
    assert(out.map(_.getLong(2)).forall(_ == 2L))
    intercept[IllegalArgumentException](Quality.check(clean, Seq.empty))
  }

  test("an empty batch passes trivially (0 violations, not null verdicts)") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("id", "grade")
    val out = Quality.check(empty, Seq(
      Quality.NotNull("id"), Quality.Matches("grade", "[A-Z]"),
      Quality.Unique(Seq("id"))))
      .collect()
    assert(out.length == 3)
    assert(out.forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L && r.getBoolean(3)))
  }

  test("Matches is full-match: a substring hit alone is a violation") {
    import spark.implicits._
    val df = Seq((1L, "ABC-1234"), (2L, "junk ABC-1234 junk")).toDF("id", "sku")
    val out = Quality.check(df, Seq(Quality.Matches("sku", "[A-Z]{3}-[0-9]{4}")))
      .head()
    assert(out.getLong(1) == 1L, s"substring-only value must violate: $out")
  }

  test("row-local rules share one aggregation pass (single scan in the plan)") {
    val plan = Quality.check(fixture, Seq(
      Quality.NotNull("id"), Quality.InSet("grade", Seq("A")),
      Quality.InRange("score", 0, 1), Quality.Matches("code", "x")))
      .queryExecution.optimizedPlan
    // all four rules fold into ONE aggregate over ONE scan
    val scans = plan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
        if l.nodeName == "LocalRelation" || l.nodeName == "LogicalRDD" => l
    }
    assert(scans.size == 1, s"expected a single scan, got ${scans.size}:\n$plan")
  }
}
