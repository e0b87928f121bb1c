package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Bucketed co-located joins: pre-partitioning both sides on the join
  * key at write time removes the join-time shuffle entirely — the
  * technique for repeated large-fact joins at 100 TB (SURVEY §2.3 /
  * build brief "co-locate joins via bucketing").
  */
class BucketingSpec extends AnyFunSuite with SparkTestBase {

  test("join of two tables bucketed on the key runs with no shuffle exchange") {
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      val orders = (1L to 2000L).map(k => (k, k % 7)).toDF("k", "status")
      val items = (1L to 2000L).flatMap(k => Seq((k, k * 2.0), (k, k * 3.0))).toDF("k", "price")

      orders.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .saveAsTable("b_orders")
      items.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .saveAsTable("b_items")

      val joined = spark.table("b_orders").join(spark.table("b_items"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString

      // bucketed scan on both sides: the only acceptable Exchange is none
      assert(!plan.contains("Exchange"), plan)
      assert(joined.count() == 4000)

      // contrast: the same join over unbucketed data shuffles both sides
      val unbucketed = orders.join(items, Seq("k"))
      assert(unbucketed.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_items")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
