package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class PrefixSumSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** Plain single-partition-window reference. */
  private def viaWindow(df: org.apache.spark.sql.DataFrame, orderCol: String,
      descending: Boolean, sums: Seq[(String, String)]) = {
    val key = if (descending) col(orderCol).desc else col(orderCol).asc
    val w = Window.orderBy(key).rowsBetween(Window.unboundedPreceding, -1)
    sums.foldLeft(df) { case (d, (v, o)) =>
      d.withColumn(o, coalesce(sum(col(v)).over(w), lit(0L)))
    }
  }

  test("rangeExclusive equals the plain window, both directions, multi-sum") {
    val rnd = new scala.util.Random(31)
    val rows = rnd.shuffle((0 until 500).toVector)
      .map(k => (k * 3 + 1, rnd.nextInt(100).toLong, rnd.nextInt(5).toLong))
    val df = rows.toDF("k", "a", "b").repartition(11)
    for (desc <- Seq(false, true)) {
      val got = PrefixSum.rangeExclusive(df, "k", desc,
        Seq("a" -> "pa", "b" -> "pb"), partitions = 7)
        .orderBy("k").collect().map(r =>
          (r.getAs[Int]("k"), r.getAs[Long]("pa"), r.getAs[Long]("pb")))
      val expect = viaWindow(df, "k", desc, Seq("a" -> "pa", "b" -> "pb"))
        .orderBy("k").collect().map(r =>
          (r.getAs[Int]("k"), r.getAs[Long]("pa"), r.getAs[Long]("pb")))
      assert(got.toSeq === expect.toSeq, s"descending=$desc")
    }
  }

  test("grouped rangeExclusive equals the per-group window, null group included") {
    val rnd = new scala.util.Random(41)
    val rows = rnd.shuffle((0 until 400).toVector).map { i =>
      val g: Option[String] =
        if (i % 7 == 0) None else Some(s"g${i % 3}")
      (g, i, rnd.nextInt(50).toLong)
    }
    val df = rows.toDF("g", "k", "v").repartition(9)
    val got = PrefixSum.rangeExclusive(df, "k", descending = false,
      Seq("v" -> "pv"), partitions = 5, groupCols = Seq("g"))
      .collect()
      .map(r => (Option(r.getAs[String]("g")), r.getAs[Int]("k")) ->
        r.getAs[Long]("pv")).toMap
    val w = Window.partitionBy("g").orderBy(col("k").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val expect = df.withColumn("pv", coalesce(sum("v").over(w), lit(0L)))
      .collect()
      .map(r => (Option(r.getAs[String]("g")), r.getAs[Int]("k")) ->
        r.getAs[Long]("pv")).toMap
    assert(got.size === rows.size)
    assert(got === expect)
    // null-group rows must survive the null-safe spine join
    assert(got.keySet.exists(_._1.isEmpty))
  }

  test("result is independent of the partition count") {
    val rows = (0 until 300).map(k => (k.toDouble / 7, 1L))
    val df = rows.toDF("k", "one")
    val expected = PrefixSum.rangeExclusive(df, "k", descending = false,
      Seq("one" -> "rank0"), partitions = 1).orderBy("k")
      .collect().map(_.getAs[Long]("rank0")).toSeq
    for (p <- Seq(3, 32, 64)) {
      val got = PrefixSum.rangeExclusive(df.repartition(9), "k",
        descending = false, Seq("one" -> "rank0"), partitions = p)
        .orderBy("k").collect().map(_.getAs[Long]("rank0")).toSeq
      assert(got === expected, s"partitions=$p")
      assert(got === (0L until 300L), s"partitions=$p exact ranks")
    }
  }

  test("null order keys rank first ascending (window parity) and last descending") {
    val df = Seq((Some(2), 10L), (None, 1L), (Some(1), 5L), (Some(3), 2L))
      .toDF("k", "v")
    val asc = PrefixSum.rangeExclusive(df, "k", descending = false,
      Seq("v" -> "pv"), partitions = 3)
      .collect().map(r => Option(r.getAs[Integer]("k")) -> r.getAs[Long]("pv"))
      .toMap
    // nulls first: the null row has nothing before it; k=1 sees the null's v
    assert(asc(None) === 0L)
    assert(asc(Some(1)) === 1L)
    assert(asc(Some(2)) === 6L)
    assert(asc(Some(3)) === 16L)
    val desc = PrefixSum.rangeExclusive(df, "k", descending = true,
      Seq("v" -> "pv"), partitions = 3)
      .collect().map(r => Option(r.getAs[Integer]("k")) -> r.getAs[Long]("pv"))
      .toMap
    // nulls last: the null row sums everything else
    assert(desc(None) === 17L)
    assert(desc(Some(3)) === 0L)
    assert(desc(Some(2)) === 2L)
    assert(desc(Some(1)) === 12L)
  }

  test("empty and single-row inputs") {
    val empty = PrefixSum.rangeExclusive(
      Seq.empty[(Int, Long)].toDF("k", "v"), "k", descending = false,
      Seq("v" -> "pv"))
    assert(empty.count() === 0)
    val one = PrefixSum.rangeExclusive(
      Seq((5, 9L)).toDF("k", "v"), "k", descending = false,
      Seq("v" -> "pv")).head()
    assert(one.getAs[Long]("pv") === 0L)
  }

  test("no corpus-sized single-partition window in the plan") {
    val df = (0 until 100).map(k => (k, 1L)).toDF("k", "v")
    val plan = PrefixSum.rangeExclusive(df, "k", descending = false,
      Seq("v" -> "pv"), partitions = 8)
      .queryExecution.executedPlan.toString
    // the data-bearing window must partition by _psx_pid (parallel);
    // the only unpartitioned window runs over the ≤partitions-row
    // totals spine AFTER the groupBy — i.e. every window spec that
    // lacks a partition key sits above a HashAggregate, never above
    // the row relation
    val dataWindow =
      "windowspecdefinition\\(_psx_pid".r.findFirstIn(plan)
    assert(dataWindow.isDefined,
      s"expected the per-partition window keyed by _psx_pid in:\n$plan")
    // the range exchange ran EAGERLY inside the localCheckpoint (the
    // pin that keeps both consumers on one sampled partitioning — see
    // PrefixSum), so the downstream plan reads the pinned RDD
    assert(plan.contains("Scan ExistingRDD"),
      s"expected the checkpointed (pinned) relation scan in:\n$plan")
  }

  test("rangeExclusiveMax equals the plain exclusive window max") {
    val rnd = new scala.util.Random(53)
    val rows = rnd.shuffle((0 until 400).toVector)
      .map(k => (k.toLong, rnd.nextInt(1000).toLong))
    val df = rows.toDF("k", "v").repartition(9)
    val got = PrefixSum.rangeExclusiveMax(df, "k", "v", "pm", partitions = 7)
      .orderBy("k").collect()
      .map(r => (r.getLong(0), Option(r.get(2)).map(_.asInstanceOf[Long])))
    val w = Window.orderBy(col("k").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val expect = df.withColumn("pm", max(col("v")).over(w))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), Option(r.get(2)).map(_.asInstanceOf[Long])))
    assert(got.toSeq === expect.toSeq)
    // first row: no strictly-preceding rows -> null (empty-set max)
    assert(got.head._2.isEmpty)
  }
}
