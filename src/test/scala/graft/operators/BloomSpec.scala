package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class BloomSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("bloom semiJoin equals the plain left-semi join, FPs corrected") {
    val probe = spark.range(0, 5000).toDF("k")
    val build = spark.range(0, 5000).filter(col("id") % 100 === 0)
      .toDF("bk") // 50 of 5000 keys match
    val plain = probe.join(build.select(col("bk").as("k")), Seq("k"), "left_semi")
      .as[Long].collect().toSet
    val bloomed = Bloom.semiJoin(probe, build, "k", "bk", expectedItems = 64)
      .as[Long].collect().toSet
    assert(bloomed == plain && plain.size == 50)

    // even a deliberately undersized (high-FP) filter stays exact —
    // the semi join removes what the bloom lets through
    val tiny = Bloom.semiJoin(probe, build, "k", "bk", expectedItems = 2)
      .as[Long].collect().toSet
    assert(tiny == plain)
  }

  test("the bloom predicate prunes the probe side before the join") {
    val probe = spark.range(0, 20000).toDF("k")
    val build = spark.range(0, 20000).filter(col("id") % 1000 === 0).toDF("bk")
    val bf = Bloom.buildFilter(build, "bk", expectedItems = 32).get
    val surviving = probe.filter(Bloom.mightContain(spark, bf, col("k"))).count()
    // 20 true matches; a properly sized filter lets at most a small
    // multiple through (8 bits/item ⇒ ~2% FP worst case ⇒ ≪ 20000)
    assert(surviving >= 20 && surviving < 2000,
      s"bloom should prune most of the probe side, passed $surviving of 20000")
  }

  test("empty build side and zero estimate degrade to a correct empty semi join") {
    import spark.implicits._
    val probe = spark.range(0, 100).toDF("k")
    val none = spark.range(0, 100).filter(col("id") < 0).toDF("bk")
    assert(Bloom.buildFilter(none, "bk", expectedItems = 0).isEmpty)
    assert(Bloom.semiJoin(probe, none, "k", "bk", expectedItems = 0).count() == 0)
  }

  test("mismatched key types are rejected loudly (xxhash64 is type-sensitive)") {
    import spark.implicits._
    val probe = Seq(5, 6).toDF("k")            // int
    val build = Seq(5L, 7L).toDF("bk")         // long
    val e = intercept[IllegalArgumentException] {
      Bloom.semiJoin(probe, build, "k", "bk", 10L)
    }
    assert(e.getMessage.contains("type"), e.getMessage)
    // matching types after an explicit cast agree with the exact join
    val fixed = Bloom.semiJoin(probe.select(col("k").cast("long").as("k")),
      build, "k", "bk", 10L).select("k").as[Long].collect().toSet
    assert(fixed == Set(5L))
  }
}
