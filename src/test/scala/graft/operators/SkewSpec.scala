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
