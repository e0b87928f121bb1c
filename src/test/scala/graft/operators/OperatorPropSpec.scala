package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Randomized brute-force equivalence checks for the composed
  * operators whose unit specs use hand-built fixtures — many random
  * shapes, one derived truth, zero tolerance.
  */
class OperatorPropSpec extends AnyFunSuite with SparkTestBase {

  test("resample equals per-key brute force on random sparse series") {
    import spark.implicits._
    val rnd = new scala.util.Random(97)
    for (trial <- 1 to 5) {
      val rows = for {
        k <- 'a' to 'e'
        _ <- 1 to (1 + rnd.nextInt(12))
      } yield (k.toString, rnd.nextInt(200).toLong, rnd.nextInt(100) / 10.0)
      val step = 1 + rnd.nextInt(25)
      val got = Temporal.resample(rows.toDF("k", "ts", "v").repartition(4),
          Seq("k"), "ts", step.toLong, Seq("sv" -> sum(col("v"))))
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getBoolean(2), r.getDouble(3)))).toMap

      // driver-side truth
      val byKey = rows.groupBy(_._1)
      val want = byKey.flatMap { case (k, es) =>
        val buckets = es.groupBy(e => math.floorDiv(e._2, step))
          .view.mapValues(_.map(_._3).sum).toMap
        val (lo, hi) = (buckets.keys.min, buckets.keys.max)
        var last = Double.NaN
        (lo to hi).map { b =>
          val obs = buckets.get(b)
          obs.foreach(v => last = v)
          (k, b * step) -> ((obs.isEmpty, last))
        }
      }
      assert(got.keySet == want.keySet, s"trial $trial: grid mismatch")
      want.foreach { case (key, (gap, v)) =>
        val (gGap, gV) = got(key)
        assert(gGap == gap && math.abs(gV - v) < 1e-9,
          s"trial $trial $key: got ($gGap,$gV) want ($gap,$v)")
      }
    }
  }

  test("frequent pairs equal brute force on random baskets") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    for (trial <- 1 to 5) {
      val rows = for {
        b <- 1 to 30
        _ <- 1 to (2 + rnd.nextInt(6))
      } yield (b.toLong, (1 + rnd.nextInt(8)).toLong)
      val minSup = 2L
      val got = Basket.frequentPairs(rows.toDF("b", "i").repartition(4),
          "b", "i", minSup)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

      val want = rows.distinct.groupBy(_._1).values
        .flatMap { items =>
          val is = items.map(_._2).distinct.sorted
          for (x <- is; y <- is if x < y) yield (x, y)
        }
        .groupBy(identity).view.mapValues(_.size.toLong)
        .filter(_._2 >= minSup).toMap
      assert(got == want, s"trial $trial")
    }
  }
}
