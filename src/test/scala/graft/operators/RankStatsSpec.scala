package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class RankStatsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("weightedMedian: hand case with ties and uneven weights") {
    // masses: 3@v=1, 1@v=2, 2@v=5 → total 6, half 3 → lower median is
    // the smallest v with 2·cum_incl >= 6 → v=1 (cum 3, 2·3 >= 6)
    val df = Seq((1L, 3L), (2L, 1L), (5L, 2L)).toDF("v", "w")
    val got = RankStats.weightedMedian(df, "v", col("w"), Nil)
      .select("total", "median").as[(Long, Long)].collect()
    assert(got.toSeq === Seq((6L, 1L)))
    // shifting one unit of mass upward moves the crossing to v=2
    val df2 = Seq((1L, 2L), (2L, 2L), (5L, 2L)).toDF("v", "w")
    val got2 = RankStats.weightedMedian(df2, "v", col("w"), Nil)
      .select("median").as[Long].collect()
    assert(got2.toSeq === Seq(2L))
  }

  test("kthValue picks exact order statistics per group") {
    val df = (1L to 100L).map(v => ("g", v)).toDF("g", "v")
    // k = 37 → the 37th smallest of 1..100 is 37
    val got = RankStats.kthValue(df, "v", lit(1L), Seq("g"), lit(37L))
      .select("total", "k", "v").as[(Long, Long, Long)].collect()
    assert(got.toSeq === Seq((100L, 37L, 37L)))
  }

  test("trimmedSum drops exactly the outer deciles (brute-force parity)") {
    val rnd = new scala.util.Random(7)
    val vals = Vector.fill(137)(rnd.nextInt(1000).toLong)
    val df = vals.map(v => ("g", v)).toDF("g", "v").repartition(5)
    val got = RankStats.trimmedSum(df, "v", lit(1L), Seq("g"), 1, 10)
      .select("total", "lo", "trim_sum").as[(Long, Long, Long)].collect()
    val lo = 137 / 10
    val expect = vals.sorted.slice(lo, 137 - lo).sum
    assert(got.toSeq === Seq((137L, lo.toLong, expect)))
  }

  test("doubledRanks equal 2× the tie-averaged ranks") {
    // values 5,5,7,9,9,9 → avg ranks 1.5,1.5,3,5,5,5 → doubled 3,3,6,10
    val df = Seq(5L, 5L, 7L, 9L, 9L, 9L).map(("g", _)).toDF("g", "v")
    val got = RankStats.doubledRanks(df, "v", Seq("g"), "r2")
      .orderBy("v").select("v", "r2").as[(Long, Long)].collect()
    assert(got.toSeq === Seq((5L, 3L), (7L, 6L), (9L, 10L)))
  }

  test("giniParts: equal values → G = 0; extreme concentration → (n-1)/n") {
    val eq = Seq.fill(8)(("g", 10L)).toDF("g", "v")
    val g1 = RankStats.giniParts(eq, "v", Seq("g"))
      .select(expr("CAST(gini_num AS LONG)")).as[Long].head()
    assert(g1 === 0L)
    // one holder of everything: x = (0,...,0,T) → G = (n−1)/n
    val conc = (Seq.fill(7)(("g", 0L)) :+ ("g", 800L)).toDF("g", "v")
    val p = RankStats.giniParts(conc, "v", Seq("g"))
      .select(expr("CAST(gini_num AS LONG)"), expr("CAST(gini_den AS LONG)"))
      .as[(Long, Long)].head()
    // G = num/den = 7/8
    assert(p._1 * 8 === p._2 * 7)
  }

  test("cumHistogram totals ride the prefix relation (single scan upstream)") {
    val df = Seq(("a", 1L), ("a", 1L), ("a", 4L), ("b", 2L)).toDF("g", "v")
    val cum = RankStats.cumHistogram(df, "v", lit(1L), Seq("g"))
      .orderBy("g", "v")
      .select("g", "v", "mass", "cum_excl", "total")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(cum.toSeq === Seq(
      ("a", 1L, 2L, 0L, 3L), ("a", 4L, 1L, 2L, 3L), ("b", 2L, 1L, 0L, 1L)))
  }
}
