package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class BasketSpec extends AnyFunSuite with SparkTestBase {

  // 4 baskets; (1,2) co-occur 3×, (1,3) 2×, (2,3) 1×; item 9 rides a
  // duplicate row (distinct guard) and basket 99 is oversized
  private def fx = {
    import spark.implicits._
    val normal = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 2L), (12L, 3L),
      (13L, 1L), (13L, 3L), (13L, 9L), (13L, 9L))
    val oversized = (1L to 50L).map(i => (99L, i))
    (normal ++ oversized).toDF("b", "i")
  }

  test("pair supports are exact, deduped, and respect the basket cap") {
    val pairs = Basket.frequentPairs(fx, "b", "i", minSupport = 2,
        maxBasketSize = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // basket 99 (50 items > cap) contributes nothing; (2,3) support 2
    // comes from baskets 10 and 12
    assert(pairs == Map((1L, 2L) -> 3L, (1L, 3L) -> 3L, (2L, 3L) -> 2L))
  }

  test("rules compute confidence and lift from the capped relation") {
    val out = Basket.rules(fx, "b", "i", minSupport = 3, maxBasketSize = 20)
      .collect().map(r => (r.getAs[Long]("item_a"), r.getAs[Long]("item_b")) ->
        ((r.getAs[Long]("pair_sup"), r.getAs[Double]("conf_a_b"),
          r.getAs[Double]("conf_b_a"), r.getAs[Double]("lift"),
          r.getAs[Long]("sup_a"), r.getAs[Long]("sup_b"),
          r.getAs[Long]("n_baskets")))).toMap
    // items: 1 in 4 baskets, 2 in 3, 3 in 3; N = 4 (basket 99 dropped)
    assert(out.keySet == Set((1L, 2L), (1L, 3L)))
    val (s12, cab, cba, lift, sa, sb, nb) = out((1L, 2L))
    assert(s12 == 3L && cab == 0.75 && cba == 1.0)
    assert(lift == 3.0 * 4 / (4 * 3)) // full precision: no presentation round
    // the exact integer inputs ride along for integer-exact consumers
    assert(sa == 4L && sb == 3L && nb == 4L)
    intercept[IllegalArgumentException](Basket.frequentPairs(fx, "b", "i", 0))
    intercept[IllegalArgumentException](Basket.frequentPairs(fx, "b", "i", 1, 1))
  }

  test("rules drain-and-release leaves zero cached blocks (handOff contract)") {
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    val out = Basket.rules(fx, "b", "i", minSupport = 3, maxBasketSize = 20)
    out.collect()
    out.unpersist(blocking = true)
    val leftover = spark.sparkContext.getPersistentRDDs
    assert(leftover.isEmpty, leftover.values.map(_.toString).toSeq)
  }
}
