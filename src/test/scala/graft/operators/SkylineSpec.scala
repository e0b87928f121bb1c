package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class SkylineSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** Quadratic reference: p dominated iff some q is <= on min, >= on
    * max, strictly better on at least one.
    */
  private def bruteSkyline(pts: Seq[(Long, Long, Long)]): Set[Long] =
    pts.filterNot { case (id, mn, mx) =>
      pts.exists { case (_, qn, qx) =>
        qn <= mn && qx >= mx && (qn < mn || qx > mx)
      }
    }.map(_._1).toSet

  test("pareto2d equals the quadratic reference on random data with ties") {
    val rnd = new scala.util.Random(17)
    // small value ranges force heavy ties on both axes — the
    // strict/non-strict boundary cases
    val pts = (0L until 400L).map(i =>
      (i, rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
    val df = pts.toDF("id", "mn", "mx").repartition(9)
    val got = Skyline.pareto2d(df, "mn", "mx")
      .select("id").as[Long].collect().toSet
    assert(got === bruteSkyline(pts))
  }

  test("duplicate (min,max) points do not dominate each other — both survive") {
    val pts = Seq((1L, 5L, 5L), (2L, 5L, 5L), (3L, 9L, 1L))
    val df = pts.toDF("id", "mn", "mx")
    val got = Skyline.pareto2d(df, "mn", "mx")
      .select("id").as[Long].collect().toSet
    assert(got === Set(1L, 2L))
  }

  test("markDominated flags match the reference and layout does not matter") {
    val rnd = new scala.util.Random(23)
    val pts = (0L until 300L).map(i =>
      (i, rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
    val expect = bruteSkyline(pts)
    for (parts <- Seq(1, 4, 13)) {
      val df = pts.toDF("id", "mn", "mx").repartition(parts)
      val sky = Skyline.markDominated(df, "mn", "mx")
        .filter(!col("dominated")).select("id").as[Long].collect().toSet
      assert(sky === expect, s"partitions=$parts")
    }
  }

  test("grouped pareto2d = per-group quadratic reference, groups isolated") {
    val rnd = new scala.util.Random(29)
    val pts = (0L until 300L).map(i =>
      (i, s"g${i % 3}", rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
    val df = pts.toDF("id", "g", "mn", "mx").repartition(7)
    val got = Skyline.pareto2d(df, "mn", "mx", groupCols = Seq("g"))
      .select("id").as[Long].collect().toSet
    val expect = pts.groupBy(_._2).values.flatMap { grp =>
      bruteSkyline(grp.map(t => (t._1, t._3, t._4)))
    }.toSet
    assert(got === expect)
    // a point crushed globally but alone in its group must survive:
    // group isolation, not a weaker global frontier
    val iso = Seq((1L, "a", 1L, 100L), (2L, "b", 50L, 1L))
    val sky = Skyline.pareto2d(iso.toDF("id", "g", "mn", "mx"),
      "mn", "mx", groupCols = Seq("g"))
      .select("id").as[Long].collect().toSet
    assert(sky === Set(1L, 2L))
  }

  test("null coordinates are dominated and never poison real rows") {
    import spark.implicits._
    // the (null, 999) row sorts FIRST under the ascending prefix max —
    // unfiltered it would feed _sky_cheaper of every real row and
    // falsely dominate the genuine frontier
    val df = Seq(
      (1L, Some(1L), Some(10L)), // frontier
      (2L, Some(2L), Some(20L)), // frontier
      (3L, Some(3L), Some(5L)), // dominated by 2
      (4L, None: Option[Long], Some(999L)), // null min: dominated
      (5L, Some(0L), None: Option[Long]) // null max: dominated
    ).toDF("id", "mn", "mx")
    val marked = Skyline.markDominated(df, "mn", "mx")
      .select("id", "dominated").as[(Long, Boolean)].collect().toMap
    assert(marked === Map(1L -> false, 2L -> false, 3L -> true,
      4L -> true, 5L -> true))
    assert(Skyline.pareto2d(df, "mn", "mx")
      .select("id").as[Long].collect().toSet === Set(1L, 2L))
  }

  test("single point and strictly-sorted chain edge cases") {
    assert(Skyline.pareto2d(Seq((1L, 7L, 7L)).toDF("id", "mn", "mx"),
      "mn", "mx").count() === 1L)
    // strictly increasing on both axes: every point is on the frontier
    val chain = (0L until 20L).map(i => (i, i, i))
    assert(Skyline.pareto2d(chain.toDF("id", "mn", "mx"), "mn", "mx")
      .count() === 20L)
    // strictly increasing min, strictly decreasing max: only the
    // first point survives
    val anti = (0L until 20L).map(i => (i, i, 100L - i))
    assert(Skyline.pareto2d(anti.toDF("id", "mn", "mx"), "mn", "mx")
      .select("id").as[Long].collect().toSeq === Seq(0L))
  }
}
