package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.functions.KmvEntry

/** Bottom-k (KMV) sample sketch: the mergeability LAW (sketch of a
  * union == merge of the parts' sketches, any split), determinism
  * across partitionings, the ≤ k size bound, exact rollup counts, and
  * the sample-quantile extractor against a hand-computable fixture.
  */
class KmvSpec extends AnyFunSuite with SparkTestBase {

  private val K = 16

  private def mkRows(n: Int) = (0 until n).map { i =>
    (if (i % 3 == 0) "a" else "b", (i % 7).toString, i.toLong, (i * 37 % 1000).toLong)
  }

  test("merge of unit sketches equals a fresh sketch over the union (any split)") {
    import spark.implicits._
    val df = mkRows(500).toDF("g", "day", "id", "v")
    // units at (g, day), rolled up to g
    val units = Kmv.buildUnits(df, Seq("g", "day"), "id", "v", K)
    val rolled = Kmv.mergeOverSlice(units, Seq("g"), K)
      .select(col("g"), col("n_rows"), col("sample"))
      .as[(String, Long, Seq[KmvEntry])].collect().sortBy(_._1)
    // ground truth: one-shot sketch at the slice grain
    val direct = Kmv.buildUnits(df, Seq("g"), "id", "v", K)
      .select(col("g"), col("n_rows"), col("sample"))
      .as[(String, Long, Seq[KmvEntry])].collect().sortBy(_._1)
    assert(rolled.toSeq === direct.toSeq)
  }

  test("sample is deterministic across partition layouts and bounded by k") {
    import spark.implicits._
    val rows = mkRows(400)
    val a = Kmv.buildUnits(rows.toDF("g", "day", "id", "v").repartition(1),
      Seq("g"), "id", "v", K)
      .select("g", "sample").as[(String, Seq[KmvEntry])].collect().sortBy(_._1)
    val b = Kmv.buildUnits(
      scala.util.Random.shuffle(rows).toDF("g", "day", "id", "v").repartition(13),
      Seq("g"), "id", "v", K)
      .select("g", "sample").as[(String, Seq[KmvEntry])].collect().sortBy(_._1)
    assert(a.toSeq === b.toSeq)
    assert(a.forall(_._2.length == K))
    // ascending (h, id) render, ids unique
    a.foreach { case (_, s) =>
      assert(s.sliding(2).forall(p =>
        p.length < 2 || p(0).h < p(1).h || (p(0).h == p(1).h && p(0).id < p(1).id)))
    }
  }

  test("small groups keep every row; counts are exact through the rollup") {
    import spark.implicits._
    val df = mkRows(60).toDF("g", "day", "id", "v") // per (g, day) ~ 3 rows < K
    val units = Kmv.buildUnits(df, Seq("g", "day"), "id", "v", K)
    import org.apache.spark.sql.Row
    units.collect().foreach { r =>
      assert(r.getAs[scala.collection.Seq[Row]]("sample").length ==
        math.min(K, r.getAs[Long]("n_rows")).toInt)
    }
    val rolled = Kmv.mergeOverSlice(units, Seq("g"), K)
    val want = df.groupBy("g").count().as[(String, Long)].collect().toMap
    rolled.select("g", "n_rows").as[(String, Long)].collect().foreach {
      case (g, n) => assert(n === want(g))
    }
  }

  test("sampleQuantile picks the ceil(q*len) order statistic of v") {
    import spark.implicits._
    // one group, values 1..10 with ids arranged so the sample is all rows
    val df = (1 to 10).map(i => ("g", i.toLong, i.toLong * 10)).toDF("g", "id", "v")
    val sk = Kmv.buildUnits(df, Seq("g"), "id", "v", 32)
    val got = sk.select(
      Kmv.sampleQuantile(col("sample"), 0.5).as("p50"),
      Kmv.sampleQuantile(col("sample"), 0.9).as("p90"),
      Kmv.sampleQuantile(col("sample"), 1.0).as("p100"),
      Kmv.sampleQuantile(col("sample"), 0.05).as("p05"))
      .as[(Long, Long, Long, Long)].head()
    assert(got === ((50L, 90L, 100L, 10L)))
  }

  test("null ids/values are dropped before the agg, not crashed on") {
    import spark.implicits._
    val df = Seq(
      ("g", Some(1L), Some(10L)), ("g", Some(2L), Some(20L)),
      ("g", None, Some(30L)), ("g", Some(4L), None))
      .toDF("g", "id", "v")
    val units = Kmv.buildUnits(df, Seq("g"), "id", "v", 8)
    val r = units.select("n_rows", "sample").head()
    assert(r.getLong(0) === 2L, "n_rows counts the sampleable census")
    assert(r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("sample").length === 2)
  }

  test("sample quantiles land near exact quantiles on a big skewed group") {
    import spark.implicits._
    // deterministic skewed values: v = i*i % 9973 over 20k rows, k=256
    val df = (0 until 20000).map(i => ("g", i.toLong, (i.toLong * i) % 9973))
      .toDF("g", "id", "v")
    val sk = Kmv.buildUnits(df, Seq("g"), "id", "v", 256)
    val (p50, p90) = sk.select(
      Kmv.sampleQuantile(col("sample"), 0.5).as("p50"),
      Kmv.sampleQuantile(col("sample"), 0.9).as("p90"))
      .as[(Long, Long)].head()
    val exact = df.stat.approxQuantile("v", Array(0.5, 0.9), 0.0)
    // rank error ~ sqrt(q(1-q)/k) ≈ 0.031 -> generous 4-sigma bars on
    // the VALUE scale of this near-uniform distribution (range 9973)
    assert(math.abs(p50 - exact(0)) < 9973 * 0.125, s"p50=$p50 exact=${exact(0)}")
    assert(math.abs(p90 - exact(1)) < 9973 * 0.075, s"p90=$p90 exact=${exact(1)}")
  }
}
