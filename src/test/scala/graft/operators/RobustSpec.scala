package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class RobustSpec extends AnyFunSuite with SparkTestBase {

  /** Scala-side oracle: exact lower median (element at ascending rank
    * (n+1)/2, 1-indexed) of a non-empty sequence.
    */
  private def lowerMedian(xs: Seq[Long]): Long = {
    val s = xs.sorted
    s((s.size + 1) / 2 - 1)
  }

  test("groupMedian is the exact lower median (odd, even, duplicates)") {
    import spark.implicits._
    val df = Seq(
      // odd group: median of (1,2,100) = 2
      ("a", 2L), ("a", 100L), ("a", 1L),
      // even group: LOWER median of (10,20,30,40) = 20 (not 25)
      ("b", 40L), ("b", 10L), ("b", 30L), ("b", 20L),
      // duplicate-heavy group: (5,5,5,9) -> 5
      ("c", 5L), ("c", 9L), ("c", 5L), ("c", 5L),
      // singleton
      ("d", 7L)
    ).toDF("g", "v")
    val got = Robust.groupMedian(df, "g", "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 2L, "b" -> 20L, "c" -> 5L, "d" -> 7L))
  }

  test("groupMedian ignores null values, like SQL aggregates") {
    import spark.implicits._
    val df = Seq(("a", Some(1L)), ("a", None), ("a", Some(3L)), ("a", Some(5L)))
      .toDF("g", "v")
    val got = Robust.groupMedian(df, "g", "v").collect()
    assert(got.length == 1 && got(0).getLong(1) == 3L)
  }

  test("groupMedian matches the Scala oracle on randomized groups") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    val rows = for {
      g <- 0 until 8
      n = 1 + rng.nextInt(40)
      _ <- 0 until n
    } yield (s"g$g", rng.nextInt(50).toLong)
    val expect = rows.groupBy(_._1).map { case (g, vs) =>
      g -> lowerMedian(vs.map(_._2))
    }
    val got = Robust.groupMedian(rows.toDF("g", "v"), "g", "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expect)
  }

  test("madOutliers flags |dev| > k*MAD and keeps every input row") {
    import spark.implicits._
    // group a: values 10,10,12,14,100 -> median 12, devs 2,2,0,2,88,
    // MAD 2; k=3 -> threshold 6 -> only 100 is an outlier
    val df = Seq(("a", 1L, 10L), ("a", 2L, 10L), ("a", 3L, 12L),
      ("a", 4L, 14L), ("a", 5L, 100L)).toDF("g", "id", "v")
    val out = Robust.madOutliers(df, "g", "v", k = 3)
      .select("id", "median", "mad", "dev", "is_outlier")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(out.values.forall { case (m, mad, _, _) => m == 12L && mad == 2L })
    assert(out(5L)._4 && out(5L)._3 == 88L)
    assert(Seq(1L, 2L, 3L, 4L).forall(!out(_)._4))
  }

  test("degenerate MAD = 0 flags exactly the rows with any deviation") {
    import spark.implicits._
    // over half identical -> median 5, MAD 0; k*0 = 0 so dev > 0 flags
    val df = Seq(("a", 1L, 5L), ("a", 2L, 5L), ("a", 3L, 5L), ("a", 4L, 6L))
      .toDF("g", "id", "v")
    val out = Robust.madOutliers(df, "g", "v", k = 3)
      .select("id", "is_outlier").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out == Map(1L -> false, 2L -> false, 3L -> false, 4L -> true))
  }

  test("madOutliers keeps null-valued rows and all-null groups (flag = false)") {
    import spark.implicits._
    val df = Seq(
      // mixed group: the null row must survive with is_outlier = false
      ("a", 1L, Some(5L)), ("a", 2L, Some(5L)), ("a", 3L, Some(9L)),
      ("a", 4L, None),
      // all-null group: no stats exist, rows must still survive
      ("b", 5L, None), ("b", 6L, None)
    ).toDF("g", "id", "v")
    val out = Robust.madOutliers(df, "g", "v", k = 0)
      .select("id", "is_outlier").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // every input row present — nothing dropped by the stat joins
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    // null values are never outliers; non-null deviations still flag
    assert(out(3L) && !out(4L) && !out(5L) && !out(6L))
  }

  test("negative k is rejected") {
    import spark.implicits._
    val df = Seq(("a", 1L)).toDF("g", "v")
    intercept[IllegalArgumentException](Robust.madOutliers(df, "g", "v", k = -1))
  }

  test("the plan windows over the histogram relation, not raw rows") {
    import spark.implicits._
    // the only Window in the plan must sit ABOVE an Aggregate on
    // (g, v) — i.e. ranks are derived from the distinct-value
    // histogram, never from a corpus-sized row window
    val df = Seq(("a", 1L), ("a", 1L), ("a", 2L)).toDF("g", "v")
    val plan = Robust.groupMedian(df, "g", "v")
      .queryExecution.optimizedPlan
    var sawWindow = false
    var aggBelowWindow = false
    plan.foreach {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
        sawWindow = true
        w.child.foreach {
          case _: org.apache.spark.sql.catalyst.plans.logical.Aggregate =>
            aggBelowWindow = true
          case _ =>
        }
      case _ =>
    }
    assert(sawWindow && aggBelowWindow,
      "expected Window over Aggregate (histogram-shaped median plan)")
  }
}
