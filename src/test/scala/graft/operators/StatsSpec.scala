package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class StatsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("Poisson thresholds are strictly increasing and match the CDF") {
    val t = Stats.PoissonThresholds
    assert(t.size === Stats.BootstrapMaxM)
    assert(t === t.sorted)
    assert(t.distinct.size === t.size)
    // closed-form spot checks: P(0) = e^-1, P(<=1) = 2e^-1
    assert(t.head === (math.exp(-1.0) * Curation.BucketSpace).toLong)
    assert(t(1) === (2 * math.exp(-1.0) * Curation.BucketSpace).toLong)
    // the cap leaves only P(X >= 8) ~ 1.02e-5 mass above the last
    // threshold
    assert(Curation.BucketSpace - t.last < (2e-5 * Curation.BucketSpace).toLong)
  }

  test("poissonCountSql maps boundary buckets to the right m") {
    val t = Stats.PoissonThresholds
    val cases = Seq(0L -> 0, (t.head - 1) -> 0, t.head -> 1,
      (t(3) - 1) -> 3, t(3) -> 4, (Curation.BucketSpace - 1) -> 8)
    val got = cases.map(_._1).toDF("b")
      .withColumn("m", expr(Stats.poissonCountSql("b")))
      .orderBy("b").select("b", "m")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    cases.foreach { case (b, m) => assert(got(b) === m, s"bucket $b") }
  }

  test("poissonBootstrap is layout-independent and replicate means hug the truth") {
    val rows = (0L until 2000L).map(i => (i, 100L + i % 50))
    val truth = rows.map(_._2).sum
    val results = Seq(1, 3, 11).map { parts =>
      val df = rows.toDF("id", "v").repartition(parts)
      Stats.poissonBootstrap(df, col("id"), col("v"), reps = 8)
        .orderBy("rep")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    }
    // identical output whatever the input layout (content-derived m)
    assert(results.distinct.size === 1)
    results.head.foreach { case (_, nEff, wsum) =>
      // E[n_eff] = 2000, sd ~ 45; E[wsum] = truth, both within 5 sd
      assert(math.abs(nEff - 2000L) < 250, s"n_eff $nEff")
      assert(math.abs(wsum - truth).toDouble / truth < 0.15, s"wsum $wsum")
    }
  }

  test("percentileInterval picks the requested order statistics") {
    val reps = Seq((0L, 10L, 1000L), (1L, 10L, 2000L), (2L, 10L, 1500L),
      (3L, 10L, 3000L)).toDF("rep", "n_eff", "wsum")
    // means ×100: 10000, 20000, 15000, 30000 → sorted 10000,15000,20000,30000
    assert(Stats.percentileInterval(reps, 1, 4) === (10000L, 30000L))
    assert(Stats.percentileInterval(reps, 2, 3) === (15000L, 20000L))
    intercept[IllegalArgumentException] {
      Stats.percentileInterval(reps, 0, 4)
    }
  }

  test("percentileInterval: sign-correct rounding, empty replicates dropped") {
    // negative replicate mean ×100 = −150.5 must round AWAY from zero
    // (−151), not truncate toward it (−150); an n_eff=0 replicate has
    // no mean and is dropped, not NPE'd
    val reps = Seq(
      (0L, 200L, -301L), // mean ×100 = −150.5 → −151 (half-away)
      (1L, 10L, 1000L), // 10000
      (2L, 0L, 0L), // empty replicate: dropped
      (3L, 200L, 301L) // mean ×100 = 150.5 → 151 (half-up)
    ).toDF("rep", "n_eff", "wsum")
    assert(Stats.percentileInterval(reps, 1, 3) === (-151L, 10000L))
    assert(Stats.percentileInterval(reps, 2, 2) === (151L, 151L))
  }
}
