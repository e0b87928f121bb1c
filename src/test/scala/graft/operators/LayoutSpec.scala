package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class LayoutSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def mortonRef(a: Long, b: Long): Long = {
    var out = 0L
    var i = 0
    while (i < 16) {
      out |= ((a >>> i) & 1L) << (2 * i)
      out |= ((b >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    out
  }

  test("interleaveBits matches the scala Morton reference on random 16-bit pairs") {
    val rnd = new scala.util.Random(11)
    val pairs = Seq.fill(500)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong)) ++
      Seq((0L, 0L), (65535L, 65535L), (0L, 65535L), (65535L, 0L))
    val got = pairs.toDF("qa", "qb")
      .select(col("qa"), col("qb"), Layout.interleaveBits(col("qa"), col("qb")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pairs.foreach { case (a, b) =>
      assert(got((a, b)) == mortonRef(a, b), s"($a, $b)")
    }
  }

  test("z-order lets min/max stats skip files on the SECOND dimension; a sort cannot") {
    // uniform 100×100 grid — the adversarial case for a leading-column
    // sort, whose every file spans the full second dimension. Metric =
    // how many files a b-slice predicate must read given per-file
    // [min_b, max_b] stats (what parquet row-group skipping does).
    val grid = (for (x <- 0 until 100; y <- 0 until 100)
      yield (x.toDouble, y.toDouble)).toDF("a", "b")

    def filesIntersectingBSlice(df: org.apache.spark.sql.DataFrame,
        lo: Double, hi: Double): (Long, Long) = {
      val dir = java.nio.file.Files.createTempDirectory("layout").toString
      df.write.mode("overwrite").parquet(dir)
      val stats = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min("b").as("b_min"), max("b").as("b_max"))
      (stats.filter(col("b_max") >= lo && col("b_min") <= hi).count(),
        stats.count())
    }

    val zed = Layout.zOrder(grid, "a", "b", numFiles = 16,
      ranges = Some((0.0, 99.0, 0.0, 99.0)))
    val (zHit, zTotal) = filesIntersectingBSlice(zed, 0.0, 9.0)
    val sorted = grid.repartitionByRange(16, col("a")).sortWithinPartitions("a")
    val (sHit, sTotal) = filesIntersectingBSlice(sorted, 0.0, 9.0)

    // sort by a: every file spans b fully — zero skipping
    assert(sHit == sTotal, s"expected no skipping for the sort, got $sHit/$sTotal")
    // z-order: a 10% b-slice intersects only the z-cells along one
    // edge — at most half the files (4/16 on an ideal quad split)
    assert(zHit * 2 <= zTotal,
      s"z-order should skip at least half the files, read $zHit/$zTotal")
    // and the z-ordered relation is the same multiset of rows
    assert(zed.count() == 10000)
  }

  test("zOrder: empty input returns empty; a user _z column is rejected") {
    import spark.implicits._
    val empty = Seq.empty[(Double, Double)].toDF("a", "b")
    assert(Layout.zOrder(empty, "a", "b", 4).count() == 0)
    val withZ = Seq((1.0, 2.0, 3.0)).toDF("a", "b", "_z")
    intercept[IllegalArgumentException](Layout.zOrder(withZ, "a", "b", 4))
  }
}
