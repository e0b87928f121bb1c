package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class CountMinSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** Scala mirror of CountMin.bucket (md5-prefix mod width). */
  private def bucketRef(item: String, seed: Int, width: Int): Long = {
    val md5 = MessageDigest.getInstance("MD5")
      .digest(s"cms$seed:$item".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(md5.take(7), 16) % width
  }

  /** Scala-mirror CMS over raw occurrences. */
  private def cmsRef(items: Seq[String], depth: Int, width: Int)
      : Map[(Int, Long), Long] =
    items.flatMap(it => (0 until depth).map(s => (s, bucketRef(it, s, width))))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  private def estRef(cms: Map[(Int, Long), Long], item: String,
      depth: Int, width: Int): Long =
    (0 until depth)
      .map(s => cms.getOrElse((s, bucketRef(item, s, width)), 0L)).min

  test("build matches the Scala-mirror sketch cell by cell") {
    val rnd = new scala.util.Random(19)
    val items = Seq.fill(500)(s"it${rnd.nextInt(60)}")
    val got = CountMin.build(items.toDF("item").repartition(7), "item",
      depth = 3, width = 16)
      .collect()
      .map(r => (r.getAs[Int]("seed"), r.getAs[Long]("bucket")) ->
        r.getAs[Long]("cnt")).toMap
    assert(got === cmsRef(items, 3, 16))
  }

  test("estimate never undercounts and matches the mirror estimate") {
    val rnd = new scala.util.Random(23)
    // 300 distinct keys into width 32: heavy collisions by design
    val items = Seq.fill(3000)(s"k${rnd.nextInt(300)}")
    val exact = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val df = items.toDF("item").repartition(5)
    val sketch = CountMin.build(df, "item", depth = 4, width = 32)
    val ref = cmsRef(items, 4, 32)
    val est = CountMin.estimate(sketch, df, "item", depth = 4, width = 32)
      .collect().map(r => r.getAs[String]("item") -> r.getAs[Long]("est_n"))
      .toMap
    assert(est.keySet === exact.keySet)
    exact.foreach { case (k, n) =>
      assert(est(k) >= n, s"undercount for $k")
      assert(est(k) === estRef(ref, k, 4, 32), s"mirror mismatch for $k")
    }
    // collisions must actually occur at this width, or the test is vacuous
    assert(exact.exists { case (k, n) => est(k) > n })
  }

  test("merge of unit sketches is cell-identical to one build over the union") {
    val a = (0 until 200).map(i => s"x${i % 40}")
    val b = (0 until 150).map(i => s"y${i % 25}")
    def cells(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Int]("seed"), r.getAs[Long]("bucket")) ->
        r.getAs[Long]("cnt")).toMap
    val merged = CountMin.merge(
      CountMin.build(a.toDF("item"), "item", depth = 4, width = 64),
      CountMin.build(b.toDF("item"), "item", depth = 4, width = 64))
    val whole = CountMin.build((a ++ b).toDF("item"), "item",
      depth = 4, width = 64)
    assert(cells(merged) === cells(whole))
  }

  test("weighted build over a count relation equals build over raw occurrences") {
    val raw = Seq("a", "a", "a", "b", "b", "c")
    val cnt = raw.groupBy(identity).toSeq.map { case (k, v) => (k, v.size.toLong) }
    def cells(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Int]("seed"), r.getAs[Long]("bucket")) ->
        r.getAs[Long]("cnt")).toMap
    assert(
      cells(CountMin.build(cnt.toDF("item", "n"), "item", depth = 2,
        width = 8, weightCol = Some("n"))) ===
        cells(CountMin.build(raw.toDF("item"), "item", depth = 2, width = 8)))
  }

  test("never-seen items estimate 0; null items are ignored") {
    val sketch = CountMin.build(Seq("a", "b").toDF("item"), "item",
      depth = 4, width = 1024)
    val est = CountMin.estimate(sketch,
      Seq(Some("zzz_unseen"), None).toDF("item"), "item",
      depth = 4, width = 1024).collect()
    assert(est.length === 1)
    assert(est.head.getAs[Long]("est_n") === 0L)
    val built = CountMin.build(
      Seq(Some("a"), None, None).toDF("item"), "item", depth = 1, width = 8)
    assert(built.agg(sum("cnt")).head().getLong(0) === 1L)
  }

  test("parameter guards reject degenerate shapes") {
    val df = Seq("a").toDF("item")
    intercept[IllegalArgumentException](CountMin.build(df, "item", depth = 0))
    intercept[IllegalArgumentException](CountMin.build(df, "item", width = 1))
    intercept[IllegalArgumentException](
      CountMin.estimate(df, df, "item", depth = 17))
  }
}
