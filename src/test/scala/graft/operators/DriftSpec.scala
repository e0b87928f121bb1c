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

  test("ksBins: identical halves give D=0; a location shift gives the known D") {
    val ref = vals((1 to 1000).map(_.toDouble))
    val same = Drift.ksBins(ref, vals((1 to 1000).map(_.toDouble)), "x", 10)
      .agg(max("ks_term")).head().getDouble(0)
    assert(same == 0.0, s"identical halves scored $same")

    // cur = ref + half the range: with 20 bins over the joint [1, 1500]
    // the ECDF gap at the crossing is ~0.5·(1000/1499)·... — just
    // assert the statistic is large and equals a hand-computed ECDF
    // scan at the bin edges
    val cur = vals((1 to 1000).map(i => i + 500.0))
    val rows = Drift.ksBins(ref, cur, "x", 20).collect()
    assert(rows.length == 20)
    val d = rows.map(_.getDouble(5)).max
    // independent computation: ECDFs at the 20 bin upper edges
    val lo = 1.0; val hi = 1500.0
    val expected = (0 until 20).map { b =>
      val edge = lo + (hi - lo) * (b + 1) / 20.0
      val fr = (1 to 1000).count(_ <= edge) / 1000.0
      val fc = (1 to 1000).count(i => i + 500.0 <= edge + 1e-9) / 1000.0
      math.abs(fr - fc)
    }.max
    assert(math.abs(d - expected) < 0.06, s"D=$d expected≈$expected")
    assert(d > 0.3, s"major shift scored only $d")
    // final bin closes both ECDFs at 1
    val last = rows.last
    assert(last.getDouble(3) == 1.0 && last.getDouble(4) == 1.0)
    // cumulative shares are monotone
    assert(rows.map(_.getDouble(3)).sliding(2).forall(w => w(1) >= w(0)))
  }

  test("NaN rows never poison the bounds; identical-constant sides are degenerate-safe") {
    // one NaN in cur previously made max() return NaN, every bin NaN,
    // and the monitor report D=0 on the most anomalous batch
    val ref = vals((1 to 100).map(_.toDouble))
    val cur = vals(Seq(Double.NaN) ++ (201 to 300).map(_.toDouble))
    val d = Drift.ksBins(ref, cur, "x", 10).agg(max("ks_term")).head().getDouble(0)
    assert(d == 1.0, s"NaN poisoned the KS bounds: D=$d")
    val psi = Drift.psiBins(ref, cur, "x", 10)
      .agg(sum("psi_term")).head().getDouble(0)
    assert(psi > 0.25 && !psi.isNaN, s"NaN poisoned the PSI bins: $psi")
    // all values identical on both sides: one bin, zero drift, no NaN
    val const = vals(Seq.fill(10)(5.0))
    val kRows = Drift.ksBins(const, vals(Seq.fill(7)(5.0)), "x", 10).collect()
    assert(kRows.map(_.getDouble(5)).max == 0.0)
    assert(kRows.map(r => r.getLong(1) + r.getLong(2)).sum == 17L) // nothing lost
  }

  test("psiBins: a frozen (constant) reference still alerts on shifted current values") {
    // ref constant 5.0 (lo == hi) with cur at 100.0: the degenerate
    // branch must route the shifted mass to the top bin, not share
    // bin 0 with the reference and report PSI = 0
    val ref = vals(Seq.fill(50)(5.0))
    val shifted = Drift.psiBins(ref, vals(Seq.fill(50)(100.0)), "x", 10)
    val psi = shifted.agg(sum("psi_term")).head().getDouble(0)
    assert(psi > 0.25, s"constant-reference shift scored only $psi")
    // equal-constant current stays at ~0
    val same = Drift.psiBins(ref, vals(Seq.fill(30)(5.0)), "x", 10)
      .agg(sum("psi_term")).head().getDouble(0)
    assert(math.abs(same) < 1e-9, s"identical constants scored $same")
  }

  test("nanShare surfaces a NaN surge the value-bin monitors exclude") {
    val ref = vals((1 to 100).map(_.toDouble))
    // 99 NaN + 1 matching value: value-bin monitors see no drift, the
    // missing-mass census must
    val cur = vals(Seq(50.0) ++ Seq.fill(99)(Double.NaN))
    val row = Drift.nanShare(ref, cur, "x").collect().head
    assert(row.getAs[Long]("n_cur") == 100L && row.getAs[Long]("n_bad_cur") == 99L)
    assert(row.getAs[Double]("nan_share_cur") == 0.99)
    assert(row.getAs[Double]("nan_share_delta") == 0.99)
    // nulls count as missing too
    import spark.implicits._
    val withNulls = Seq(Some(1.0), None, Some(3.0)).toDF("x")
    assert(Drift.nanShare(ref, withNulls, "x").collect().head
      .getAs[Long]("n_bad_cur") == 1L)
  }

  test("ksBins: joint bounds capture drift outside the reference range") {
    val ref = vals((1 to 100).map(_.toDouble))
    val cur = vals((201 to 300).map(_.toDouble)) // entirely past ref's max
    val rows = Drift.ksBins(ref, cur, "x", 10).collect()
    // with joint [1, 300]: all ref mass sits in the low bins, all cur
    // mass in the high bins — D must reach 1.0 at the crossover
    assert(rows.map(_.getDouble(5)).max == 1.0)
    intercept[IllegalArgumentException](Drift.ksBins(ref, ref, "x", 1))
  }

  test("embeddingShift: rotation drops cosine, scaling moves the norm ratio, absence yields nulls") {
    import spark.implicits._
    def side(rows: Seq[(String, Seq[Double])]) = rows.toDF("g", "v")
    val ref = side(Seq(
      ("stable", Seq(1.0, 0.0, 0.0)), ("stable", Seq(1.0, 0.2, 0.0)),
      ("rotated", Seq(0.0, 1.0, 0.0)), ("rotated", Seq(0.0, 1.0, 0.1)),
      ("scaled", Seq(2.0, 2.0, 0.0)),
      ("ref_only", Seq(1.0, 1.0, 1.0))))
    val cur = side(Seq(
      ("stable", Seq(1.0, 0.1, 0.0)),
      ("rotated", Seq(1.0, 0.0, 0.0)), // orthogonal pocket: cos ≈ 0
      ("scaled", Seq(6.0, 6.0, 0.0)), // same direction, 3× norm
      ("cur_only", Seq(0.5, 0.5, 0.0))))
    val out = Drift.embeddingShift(ref, cur, "g", "v").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("stable", "rotated", "scaled", "ref_only", "cur_only"))
    assert(out("stable").getDouble(3) > 0.99)
    assert(math.abs(out("stable").getDouble(4) - 1.0) < 0.1)
    assert(out("rotated").getDouble(3) < 0.1, "orthogonal centroid must read ≈ 0")
    assert(out("scaled").getDouble(3) > 0.999, "pure scaling is invisible to cosine")
    assert(math.abs(out("scaled").getDouble(4) - 3.0) < 1e-6,
      "…but loud in the norm ratio")
    // one-sided groups surface with counts and null comparisons, not
    // silently dropped (a vanished or brand-new group IS drift)
    assert(out("ref_only").getLong(1) == 1L && out("ref_only").getLong(2) == 0L)
    assert(out("ref_only").isNullAt(3) && out("cur_only").isNullAt(3))
  }

  test("embeddingShift: zero-norm reference centroid nulls the ratio; counts are row counts") {
    import spark.implicits._
    val ref = Seq(
      // centroid of these two is the ZERO vector → ratio undefined
      ("zeroed", Some(Seq(1.0, -1.0))), ("zeroed", Some(Seq(-1.0, 1.0))),
      ("ok", Some(Seq(1.0, 0.0))),
      // a null vector row: counted in n_ref (row census) but absent
      // from the centroid (meanPool ignores nulls)
      ("ok", None)).toDF("g", "v")
    val cur = Seq(
      ("zeroed", Some(Seq(2.0, 2.0))), ("ok", Some(Seq(1.0, 0.1)))).toDF("g", "v")
    val out = Drift.embeddingShift(ref, cur, "g", "v").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("zeroed").isNullAt(4), "zero-norm ref centroid must yield null, not Infinity")
    assert(out("ok").getLong(1) == 2L, "n_ref counts rows, null vectors included")
    assert(!out("ok").isNullAt(4))
  }

  test("categoricalShift: hand-computed chi2 terms, new/gone flags, null for new") {
    import spark.implicits._
    // ref: a×6, b×3, c×1 (tr=10); cur: a×3, b×6, d×1 (tc=10)
    val ref = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("cat")
    val cur = (Seq.fill(3)("a") ++ Seq.fill(6)("b") ++ Seq("d")).toDF("cat")
    val out = Drift.categoricalShift(ref, cur, "cat")
      .collect().map(r => r.getString(0) -> r).toMap
    // expected = n_ref * 10/10 = n_ref; chi2 = (o-e)^2/e
    assert(out("a").getLong(1) == 6L && out("a").getLong(2) == 3L)
    assert(math.abs(out("a").getDouble(4) - 9.0 / 6.0) < 1e-12)
    assert(math.abs(out("b").getDouble(4) - 9.0 / 3.0) < 1e-12)
    assert(out("c").getLong(2) == 0L && out("c").getBoolean(6), "c vanished")
    assert(math.abs(out("c").getDouble(4) - 1.0) < 1e-12) // (0-1)^2/1
    assert(out("d").getLong(1) == 0L && out("d").getBoolean(5), "d appeared")
    assert(out("d").isNullAt(4), "chi2 undefined for a ref-absent category")
    assert(out.keySet === Set("a", "b", "c", "d"))
  }

  test("categoricalShift: a null category meets itself (null-RATE drift, not phantom pairs)") {
    import spark.implicits._
    val ref = (Seq.fill(4)(Option("a")) ++ Seq.fill(2)(Option.empty[String])).toDF("cat")
    val cur = (Seq.fill(3)(Option("a")) ++ Seq.fill(3)(Option.empty[String])).toDF("cat")
    val rows = Drift.categoricalShift(ref, cur, "cat").collect()
    assert(rows.length === 2, rows.mkString("; "))
    val nullRow = rows.find(_.isNullAt(0)).get
    assert(nullRow.getLong(1) === 2L && nullRow.getLong(2) === 3L)
    assert(!nullRow.getBoolean(5) && !nullRow.getBoolean(6),
      "one merged null row — no phantom new/gone pair")
    // chi2 for the null category: e = 2*6/6 = 2, (3-2)^2/2 = 0.5
    assert(math.abs(nullRow.getDouble(4) - 0.5) < 1e-12)
  }
}
