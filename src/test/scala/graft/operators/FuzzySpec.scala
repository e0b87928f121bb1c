package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class FuzzySpec extends AnyFunSuite with SparkTestBase {

  /** Reference Levenshtein (full DP) for the differential checks. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  /** Seeded word-ish corpus: short strings over a tiny alphabet so
    * near pairs actually occur.
    */
  private def corpus(seed: Int, n: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val len = 3 + rnd.nextInt(6)
      (i.toLong, Seq.fill(len)(('a' + rnd.nextInt(4)).toChar).mkString)
    }
  }

  test("editJoin k=1 equals brute-force levenshtein <= 1 (randomized differential)") {
    import spark.implicits._
    for (seed <- Seq(1, 2, 3)) {
      val rows = corpus(seed, 120)
      val df = rows.toDF("id", "s")
      val got = Fuzzy.editJoin(df, "id", "s", df, "id", "s", k = 1)
        .select("idL", "idR", "dist").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val want = (for {
        (ia, sa) <- rows; (ib, sb) <- rows
        d = lev(sa, sb) if d <= 1
      } yield (ia, ib, d)).toSet
      assert(got === want, s"seed $seed")
    }
  }

  test("editJoin k=2 equals brute-force levenshtein <= 2 (randomized differential)") {
    import spark.implicits._
    for (seed <- Seq(7, 8)) {
      val rows = corpus(seed, 60)
      val df = rows.toDF("id", "s")
      val got = Fuzzy.editJoin(df, "id", "s", df, "id", "s", k = 2)
        .select("idL", "idR", "dist").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val want = (for {
        (ia, sa) <- rows; (ib, sb) <- rows
        d = lev(sa, sb) if d <= 2
      } yield (ia, ib, d)).toSet
      assert(got === want, s"seed $seed")
    }
  }

  test("edge cases: empty strings, single chars, nulls dropped, exact dupes") {
    import spark.implicits._
    val left = Seq((1L, ""), (2L, "a"), (3L, "ab"), (4L, null.asInstanceOf[String]),
      (5L, "xyz")).toDF("id", "s")
    val right = Seq((10L, ""), (11L, "b"), (12L, "ab"), (13L, "xyz")).toDF("id", "s")
    val got = Fuzzy.editJoin(left, "id", "s", right, "id", "s", k = 1)
      .select("idL", "idR", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = (for {
      (ia, sa) <- Seq((1L, ""), (2L, "a"), (3L, "ab"), (5L, "xyz"))
      (ib, sb) <- Seq((10L, ""), (11L, "b"), (12L, "ab"), (13L, "xyz"))
      d = lev(sa, sb) if d <= 1
    } yield (ia, ib, d)).toSet
    // spot-check the brute force itself: "" vs "" is 0, "a" vs "" is 1,
    // "a" vs "b" is 1, "ab" vs "ab" is 0
    assert(want.contains((1L, 10L, 0)))
    assert(want.contains((2L, 10L, 1)))
    assert(want.contains((2L, 11L, 1)))
    assert(want.contains((3L, 12L, 0)))
    assert(got === want)
  }

  test("result is invariant to partition layout") {
    import spark.implicits._
    val rows = corpus(42, 100)
    def run(parts: Int): Set[(Long, Long)] = {
      val df = rows.toDF("id", "s").repartition(parts)
      Fuzzy.editJoin(df, "id", "s", df, "id", "s", k = 1)
        .select("idL", "idR").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(run(1) === run(7))
  }

  test("k outside {1, 2} is rejected") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("id", "s")
    intercept[IllegalArgumentException] {
      Fuzzy.editJoin(df, "id", "s", df, "id", "s", k = 3)
    }
    intercept[IllegalArgumentException] {
      Fuzzy.editJoin(df, "id", "s", df, "id", "s", k = 0)
    }
  }
}
