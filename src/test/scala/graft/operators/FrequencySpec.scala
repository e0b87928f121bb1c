package graft.operators

import org.apache.spark.sql.{Encoders, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.functions.MisraGries

class FrequencySpec extends AnyFunSuite with SparkTestBase {

  // Zipf-ish skew: two real heavy hitters over a 200-item tail, spread
  // across partitions so the sketch's reduce AND merge paths both prune.
  private def skewed = {
    import spark.implicits._
    val rows = Seq.fill(500)("h1") ++ Seq.fill(300)("h2") ++
      (1 to 200).flatMap(i => Seq.fill(1 + i % 5)(s"t$i"))
    rows.toDF("v").repartition(8)
  }

  test("two-pass heavy hitters equals exact GROUP BY ... HAVING") {
    val df = skewed
    val n = df.count()
    val k = 10
    val exact = df.groupBy(col("v").as("item")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * (k + 1) > n)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Frequency.heavyHitters(df, "v", k)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exact)
    assert(got.keySet == Set("h1", "h2")) // the fixture's true hitters
    assert(got("h1") == 500 && got("h2") == 300) // counts exact, not MG lower bounds
  }

  test("result is partitioning-independent") {
    val k = 10
    val one = Frequency.heavyHitters(skewed.repartition(1), "v", k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val many = Frequency.heavyHitters(skewed.repartition(16), "v", k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(one == many)
  }

  test("sketch state is bounded by k and candidates cover the guarantee") {
    import spark.implicits._
    val df = skewed
    val k = 10
    val mg = udaf(new MisraGries(k), Encoders.STRING)
    val hits = df.agg(mg(col("v"))).head().getSeq[Row](0)
    assert(hits.size <= k, s"sketch kept ${hits.size} > k=$k counters")
    // MG guarantee: every item above n/(k+1) is among the candidates
    val n = df.count()
    val mustHave = df.groupBy("v").count()
      .where(col("count") * (k + 1) > n)
      .select("v").as[String].collect().toSet
    assert(mustHave.subsetOf(hits.map(_.getString(0)).toSet))
  }

  test("minSupport tightens the cut and sub-bound support is rejected") {
    val df = skewed
    val tightened = Frequency.heavyHitters(df, "v", 10, minSupport = Some(400L))
      .collect().map(_.getString(0)).toSet
    assert(tightened == Set("h1"))
    intercept[IllegalArgumentException](
      Frequency.heavyHitters(df, "v", 10, minSupport = Some(2L)))
    intercept[IllegalArgumentException](Frequency.heavyHitters(df, "v", 0))
  }

  test("per-group heavy hitters: exact per-group cuts, no cross-group bleed") {
    import spark.implicits._
    // gA's hitters (x, y) and gB's (z) clear their OWN group's n/(k+1)
    // cut; tails never do. x appears in gB only below its cut — it
    // must not bleed through from gA's candidacy.
    val rows = Seq.fill(300)(("gA", "x")) ++ Seq.fill(200)(("gA", "y")) ++
      (1 to 150).map(i => ("gA", s"a$i")) ++
      Seq.fill(400)(("gB", "z")) ++ Seq.fill(10)(("gB", "x")) ++
      (1 to 90).map(i => ("gB", s"b$i"))
    val df = rows.toDF("g", "v").repartition(8)
    val got = Frequency.heavyHittersByGroup(df, Seq("g"), "v", k = 8)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // nA=650: cut 72.2 → x(300), y(200); nB=500: cut 55.6 → z(400)
    assert(got == Set(("gA", "x", 300L), ("gA", "y", 200L), ("gB", "z", 400L)))
    val reparted = Frequency.heavyHittersByGroup(df.repartition(1), Seq("g"), "v", 8)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(reparted == got)
    intercept[IllegalArgumentException](
      Frequency.heavyHittersByGroup(df, Seq.empty, "v", 8))
  }

  test("nulls are ignored and an empty input yields an empty result") {
    import spark.implicits._
    val withNulls = Seq(Some("a"), None, Some("a"), Some("b"), None)
      .toDF("v")
    val got = Frequency.heavyHitters(withNulls, "v", 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 2L)) // n=3 non-null, k=2: b needs 1·3 > 3 — fails
    assert(Frequency.heavyHitters(Seq.empty[String].toDF("v"), "v", 4).count() == 0)
  }

  test("per-group heavy hitters reports null-key groups (null-safe joins)") {
    import spark.implicits._
    val df = (Seq.fill(5)((Option.empty[String], "x")) ++
      Seq.fill(3)((Option.empty[String], "y")) ++
      Seq.fill(4)((Some("g"), "z")))
      .toDF("grp", "tok")
    val out = Frequency.heavyHittersByGroup(df, Seq("grp"), "tok", k = 4)
      .collect().map(r => (Option(r.getString(0)), r.getString(1), r.getLong(2))).toSet
    // the null group's hitters must be present, exactly counted
    assert(out.contains((None, "x", 5L)) && out.contains((None, "y", 3L)), out)
    assert(out.contains((Some("g"), "z", 4L)), out)
  }
}
