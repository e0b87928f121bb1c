package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class BucketedSpec extends AnyFunSuite with SparkTestBase {

  private def withNoBroadcast[T](body: => T): T = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("same-spec bucketed join plans ZERO exchanges and equals the plain join") {
    import spark.implicits._
    withNoBroadcast {
      val dir = Files.createTempDirectory("bktspec").toString
      val a = (1L to 2000L).map(i => (i % 100, i)).toDF("k", "va")
      val b = (1L to 500L).map(i => (i % 100, s"d$i")).toDF("k", "vb")
      Bucketed.writeBucketed(a, s"$dir/a", "bktspec_a", "k", 8)
      Bucketed.writeBucketed(b, s"$dir/b", "bktspec_b", "k", 8)
      try {
        val j = Bucketed.coLocatedJoin(spark, "bktspec_a", "bktspec_b", "k")
        val plan = j.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"), plan)

        val got = j.groupBy("k").count()
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val want = a.join(b, "k").groupBy("k").count()
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got === want)
      } finally {
        spark.sql("DROP TABLE IF EXISTS bktspec_a")
        spark.sql("DROP TABLE IF EXISTS bktspec_b")
      }
    }
  }

  test("mismatched bucket counts fall back to a shuffled join (and stay correct)") {
    import spark.implicits._
    withNoBroadcast {
      val dir = Files.createTempDirectory("bktspec2").toString
      val a = (1L to 300L).map(i => (i % 50, i)).toDF("k", "va")
      val c = (1L to 100L).map(i => (i % 50, i * 2)).toDF("k", "vc")
      Bucketed.writeBucketed(a, s"$dir/a", "bktspec2_a", "k", 8)
      Bucketed.writeBucketed(c, s"$dir/c", "bktspec2_c", "k", 4)
      try {
        val j = Bucketed.coLocatedJoin(spark, "bktspec2_a", "bktspec2_c", "k")
        assert(j.queryExecution.executedPlan.toString.contains("Exchange"))
        assert(j.count() === a.join(c, "k").count())
      } finally {
        spark.sql("DROP TABLE IF EXISTS bktspec2_a")
        spark.sql("DROP TABLE IF EXISTS bktspec2_c")
      }
    }
  }

  test("writeBucketed overwrites an existing table and rejects bad bucket counts") {
    import spark.implicits._
    val dir = Files.createTempDirectory("bktspec3").toString
    val v1 = Seq((1L, "old")).toDF("k", "v")
    val v2 = Seq((1L, "new"), (2L, "new2")).toDF("k", "v")
    Bucketed.writeBucketed(v1, s"$dir/t", "bktspec3_t", "k", 2)
    Bucketed.writeBucketed(v2, s"$dir/t", "bktspec3_t", "k", 2)
    try {
      assert(spark.table("bktspec3_t").count() === 2)
      intercept[IllegalArgumentException](
        Bucketed.writeBucketed(v1, s"$dir/u", "bktspec3_u", "k", 0))
    } finally spark.sql("DROP TABLE IF EXISTS bktspec3_t")
  }
}
