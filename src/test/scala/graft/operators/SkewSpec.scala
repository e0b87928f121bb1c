package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class SkewSpec extends AnyFunSuite with SparkTestBase {

  test("salted join equals plain join on heavily skewed keys") {
    import spark.implicits._
    // 90% of the big side hits one key
    val big = ((1 to 9000).map(i => (1L, s"row$i")) ++
      (1 to 1000).map(i => ((i % 50 + 2).toLong, s"row$i")))
      .toDF("k", "payload")
    val small = (1L to 60L).map(k => (k, s"dim$k")).toDF("k", "dim")

    val plain = big.join(small, Seq("k")).groupBy("k").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(big, small, "k", salts = 8).groupBy("k").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == plain)

    // the salted plan spreads the hot key over `salts` shuffle keys
    val plan = Skew.saltedJoin(big, small, "k", salts = 8)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("_salt"))
  }

  test("guards: outer joins, bad salt counts, and _salt collisions are rejected") {
    import spark.implicits._
    val a = Seq((1L, "x")).toDF("k", "v")
    val b = Seq((1L, "y")).toDF("k", "w")
    intercept[IllegalArgumentException](Skew.saltedJoin(a, b, "k", 8, joinType = "full"))
    intercept[IllegalArgumentException](Skew.saltedJoin(a, b, "k", 8, joinType = "right_outer"))
    intercept[IllegalArgumentException](Skew.saltedJoin(a, b, "k", 0))
    intercept[IllegalArgumentException](
      Skew.saltedJoin(a.withColumn("_salt", lit(1)), b, "k", 8))
    intercept[IllegalArgumentException](Skew.saltedAgg(a, "k", 0,
      Map("v" -> (c => first(c))), Map("v" -> (c => first(c)))))
    intercept[IllegalArgumentException](Skew.saltedAgg(a, "k", 8, Map.empty, Map.empty))
    // left joins remain supported
    assert(Skew.saltedJoin(a, b, "k", 4, joinType = "left").count() == 1)
  }

  test("salted two-phase aggregation equals direct aggregation") {
    import spark.implicits._
    val df = ((1 to 5000).map(_ => (1L, 2.0)) ++ (1 to 500).map(i => ((i % 20 + 2).toLong, 1.0)))
      .toDF("k", "v")
    val direct = df.groupBy("k").agg(sum("v").as("v"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    val salted = Skew.saltedAgg(df, "k", salts = 8,
      partial = Map("v" -> (c => sum(c)), "n_part" -> (_ => count(lit(1)))),
      finalAgg = Map("v" -> (c => sum(c)), "n_part" -> (c => sum(c))))
      .withColumnRenamed("n_part", "n")
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    assert(salted == direct)
  }
}
