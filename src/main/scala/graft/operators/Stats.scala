package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic statistical resampling primitives for the 100 TB
  * path — Poisson bootstrap and A/B readout helpers whose randomness
  * is CONTENT-DERIVED (md5 buckets), never RNG state: every replicate
  * weight is a pure function of (record id, replicate index), so the
  * same corpus yields the same confidence interval on any cluster
  * layout, any retry, any engine with md5.
  *
  * Poisson bootstrap (the scale-out bootstrap): instead of resampling
  * n rows with replacement R times (R full shuffles of a 100 TB
  * corpus), each row contributes m ~ Poisson(1) copies to each
  * replicate — m is computed per (row, replicate) map-side, replicate
  * aggregates combine partially, and the whole R-replicate sweep is
  * ONE pass with an R-way explode that never shuffles the corpus
  * (only the R·|groups| partial aggregates move).
  */
object Stats {

  /** Replicate weights are capped at 8 copies: P(Poisson(1) >= 8)
    * ≈ 1.02e-5, one row in ~100k gets clipped from >=8 down to 8 —
    * truncation bias far under the bootstrap's own Monte-Carlo noise.
    */
  val BootstrapMaxM = 8

  /** Inverse-CDF thresholds on the 28-bit md5 bucket space:
    * `PoissonThresholds(k) = floor(P(X <= k) · 2^28)` for
    * X ~ Poisson(1). A bucket b maps to
    * m = |{k : thresholds(k) <= b}| — i.e. the CASE ladder in
    * [[poissonCountSql]]. The doubles here are computed once on the
    * JVM and rendered as integer literals into BOTH engines' SQL, so
    * the two sides cannot disagree on a boundary.
    */
  val PoissonThresholds: Seq[Long] = {
    val out = Seq.newBuilder[Long]
    var pk = math.exp(-1.0) // P(X = 0)
    var cdf = pk
    out += (cdf * Curation.BucketSpace).toLong
    var k = 1
    while (k < BootstrapMaxM) {
      pk /= k // P(X = k) = P(X = k-1) / k
      cdf += pk
      out += (cdf * Curation.BucketSpace).toLong
      k += 1
    }
    out.result()
  }

  /** The CASE ladder `bucket -> m` — ONE rendering, valid in both
    * Spark SQL and DuckDB (plain integer literals, ANSI CASE), so the
    * engine and the oracle share the exact same boundaries.
    */
  def poissonCountSql(bucketExpr: String): String =
    PoissonThresholds.zipWithIndex
      .map { case (t, k) => s"WHEN ($bucketExpr) < $t THEN $k" }
      .mkString("CASE ", " ", s" ELSE $BootstrapMaxM END")

  /** Per-replicate Poisson-bootstrap aggregates of an integer value
    * column: for each replicate r in [0, reps), every row contributes
    * m(md5("boot:" + r + ":" + id)) copies. Returns
    * (rep, n_eff, wsum) — exact longs only; callers quantize means
    * with the shared half-up idiom. The explode is map-side (no
    * corpus shuffle); the final aggregate moves reps partial rows per
    * task.
    */
  def poissonBootstrap(df: DataFrame, idCol: Column, valueCol: Column,
      reps: Int): DataFrame = {
    require(reps >= 1 && reps <= 1000, s"reps out of range: $reps")
    val withRep = df
      .select(idCol.cast("string").as("_bs_id"), valueCol.cast("long").as("_bs_v"))
      .withColumn("_bs_rep", explode(sequence(lit(0), lit(reps - 1))))
      .withColumn("_bs_bucket",
        Curation.hashBucket(
          concat(lit("boot:"), col("_bs_rep").cast("string"), lit(":"),
            col("_bs_id"))))
      .withColumn("_bs_m", expr(poissonCountSql("_bs_bucket")).cast("long"))
    withRep.groupBy(col("_bs_rep").cast("long").as("rep"))
      .agg(
        sum("_bs_m").cast("long").as("n_eff"),
        sum(col("_bs_m") * col("_bs_v")).cast("long").as("wsum"))
  }

  /** Percentile-method bootstrap interval from the replicate table:
    * the (loRank)-th and (hiRank)-th smallest replicate means
    * (1-indexed), means quantized half-up to ×100 integer units. The
    * replicate table is reps rows — a driver-side sort is the bounded
    * spine, not a scale concern.
    */
  def percentileInterval(replicates: DataFrame, loRank: Int, hiRank: Int)
      : (Long, Long) = {
    // Half-up must be sign-explicit: the plain (2n+d) div (2d) form
    // mis-rounds negative numerators (integer div truncates toward
    // zero). Mirrors SharedOracles.halfDivSpark. Empty replicates
    // (n_eff = 0 — a Poisson draw that kept no rows) have no defined
    // mean and are dropped rather than NPE-ing on a NULL division.
    val means = replicates
      .filter(col("n_eff") > 0)
      .select(expr(
        "CASE WHEN wsum < 0" +
          " THEN -CAST((2 * (-wsum) * 100 + n_eff) div (2 * n_eff) AS BIGINT)" +
          " ELSE CAST((2 * wsum * 100 + n_eff) div (2 * n_eff) AS BIGINT) END"))
      .collect().map(_.getLong(0)).sorted
    require(loRank >= 1 && hiRank <= means.length && loRank <= hiRank,
      s"ranks out of range: [$loRank, $hiRank] of ${means.length}")
    (means(loRank - 1), means(hiRank - 1))
  }
}
