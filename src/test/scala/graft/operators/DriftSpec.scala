package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class DriftSpec extends AnyFunSuite with SparkTestBase {

  private def vals(xs: Seq[Double]) = {
    import spark.implicits._
    xs.toDF("x")
  }

  test("psiBins: identical distributions score ~0; a planted shift alerts") {
    val ref = vals((1 to 1000).map(_.toDouble))
    val same = Drift.psiBins(ref, vals((1 to 1000).map(_.toDouble)), "x", 10)
      .agg(sum("psi_term")).head().getDouble(0)
    assert(math.abs(same) < 1e-9, s"identical halves scored $same")

    // current mass pushed into the top half of the reference range
    val shifted = Drift.psiBins(ref, vals((1 to 1000).map(i => 500.0 + i / 2.0)), "x", 10)
      .agg(sum("psi_term")).head().getDouble(0)
    assert(shifted > 0.25, s"major shift scored only $shifted")
  }

  test("psiBins: out-of-range current values clamp into edge bins; all bins present") {
    val ref = vals((1 to 100).map(_.toDouble))
    val cur = vals(Seq(-50.0, -1.0, 0.5, 250.0, 300.0)) // mostly outside [1, 100]
    val rows = Drift.psiBins(ref, cur, "x", 10).collect()
    assert(rows.length == 10) // spine keeps empty bins
    val byBin = rows.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(byBin(0L) == 3L) // -50, -1, 0.5 clamp low
    assert(byBin(9L) == 2L) // 250, 300 clamp high
    // empty current bins fall back to the eps floor, keeping terms finite
    rows.foreach(r => assert(!r.getDouble(5).isNaN && !r.getDouble(5).isInfinite))
  }

  test("psiBins: bad params rejected") {
    val ref = vals(Seq(1.0, 2.0))
    intercept[IllegalArgumentException](Drift.psiBins(ref, ref, "x", 1))
    intercept[IllegalArgumentException](Drift.psiBins(ref, ref, "x", 10, eps = 0.0))
  }
}
