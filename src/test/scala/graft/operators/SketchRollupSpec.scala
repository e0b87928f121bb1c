package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class SketchRollupSpec extends AnyFunSuite with SparkTestBase {

  // 3 "days" × overlapping user populations; duplicates within and
  // across days so merging must dedup across unit boundaries
  private def eventsFx = {
    import spark.implicits._
    (for {
      day <- 1 to 3
      u <- 1 to (100 * day)
      rep <- 1 to 2 // every user appears twice per active day
    } yield (day, u.toLong)).toDF("day", "user").repartition(8)
  }

  test("merged unit sketches equal one whole-input sketch (register identity)") {
    val df = eventsFx
    val units = SketchRollup.buildUnits(df, Seq("day"), "user")
    assert(units.count() == 3)
    val merged = units.agg(SketchRollup.estimateOfUnion(col("sketch")).as("est"))
      .head().getLong(0)
    val single = df.agg(hll_sketch_estimate(
        hll_sketch_agg(col("user"), lit(12))).as("est"))
      .head().getLong(0)
    assert(merged == single,
      s"union-of-units $merged != single-pass $single — merge lost registers")
  }

  test("slice queries answer from sketches within HLL error of exact") {
    val df = eventsFx
    val units = SketchRollup.buildUnits(df, Seq("day"), "user")
    // whole-range slice: true distinct = 300 (day 3 spans all users)
    val est = SketchRollup.distinctOverSlice(units.withColumn("all", lit(1)), Seq("all"))
      .head().getLong(1)
    assert(math.abs(est - 300.0) <= 300 * 0.05, s"estimate $est vs exact 300")
    // per-day slice keeps per-unit resolution
    val perDay = SketchRollup.distinctOverSlice(units, Seq("day"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    (1 to 3).foreach { d =>
      val exact = 100.0 * d
      assert(math.abs(perDay(d) - exact) <= exact * 0.05,
        s"day $d estimate ${perDay(d)} vs exact $exact")
    }
    // n_rows carries through (2 rows per active user per day)
    val rows = SketchRollup.distinctOverSlice(units, Seq("day"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(rows == Map(1 -> 200L, 2 -> 400L, 3 -> 600L))
  }

  test("incremental append: a new unit extends the rollup without touching old units") {
    import spark.implicits._
    val units = SketchRollup.buildUnits(eventsFx, Seq("day"), "user")
    val day4 = (301 to 350).map(u => (4, u.toLong)).toDF("day", "user")
    val units4 = SketchRollup.buildUnits(day4, Seq("day"), "user")
    val est = units.unionByName(units4)
      .agg(SketchRollup.estimateOfUnion(col("sketch")))
      .head().getLong(0)
    assert(math.abs(est - 350.0) <= 350 * 0.05, s"appended estimate $est vs 350")
  }

  test("guards: empty unit/slice columns rejected") {
    intercept[IllegalArgumentException](
      SketchRollup.buildUnits(eventsFx, Seq.empty, "user"))
    intercept[IllegalArgumentException](
      SketchRollup.distinctOverSlice(eventsFx, Seq.empty))
  }
}
