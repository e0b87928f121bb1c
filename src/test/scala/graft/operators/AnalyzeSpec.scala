package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class AnalyzeSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("columnStats: rows, nulls, exact NDV, min/max over mixed types") {
    val df = Seq(
      (1L, Some("b"), 2.5),
      (2L, None, 1.0),
      (3L, Some("a"), 2.5),
      (3L, Some("a"), 9.0)
    ).toDF("id", "s", "x")
    val got = Analyze.columnStats(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toMap
    assert(got("id") === ((4L, 0L, 3L, "1", "3")))
    assert(got("s") === ((4L, 1L, 2L, "a", "b")))
    assert(got("x") === ((4L, 0L, 3L, "1.0", "9.0")))
  }

  test("equiDepth: exact decile boundaries, nulls excluded") {
    val vals = ((1 to 100).map(_.toLong.asInstanceOf[java.lang.Long]) :+
      null.asInstanceOf[java.lang.Long])
    val df = vals.toDF("v")
    val got = Analyze.equiDepth(df, "v", buckets = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // n=100 non-null; targets ceil(j*100/4) = 25, 50, 75, 100
    assert(got.toSeq === Seq(
      (1L, 100L, 25L, "25"), (2L, 100L, 50L, "50"),
      (3L, 100L, 75L, "75"), (4L, 100L, 100L, "100")))
  }

  test("equiDepth handles heavy ties (boundary value repeated)") {
    val df = (Seq.fill(90)(5L) ++ Seq.fill(10)(9L)).toDF("v")
    val got = Analyze.equiDepth(df, "v", buckets = 10).collect()
      .map(r => (r.getLong(0), r.getString(3)))
    // deciles 1..9 land inside the 5-block; only the last reaches 9
    assert(got.toSeq === (1L to 9L).map(j => (j, "5")) :+ ((10L, "9")))
  }
}
