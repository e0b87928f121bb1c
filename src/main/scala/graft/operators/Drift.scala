package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between a REFERENCE snapshot and a
  * CURRENT batch — the check a continuously-fed training lake runs
  * before promoting new data (alert when the feature distribution the
  * model was trained on no longer matches what is arriving).
  */
object Drift {

  /** Per-bin population comparison + Population Stability Index
    * terms over a numeric column. Bins are `buckets` equal-width over
    * the REFERENCE's [min, max]; current values outside that range
    * clamp into the edge bins (drift beyond the reference range must
    * surface in bins 0 / buckets−1, not vanish). Output: one row per
    * bin (all bins present, empty ones at share ~eps) with both
    * shares and the bin's PSI term (share_cur − share_ref) ·
    * ln(share_cur / share_ref); `Σ psi_term` is the index
    * (conventional alert thresholds: 0.1 moderate, 0.25 major).
    * `eps` is the standard smoothing floor keeping the log finite on
    * empty bins.
    *
    * Scale shape: the reference bounds are a 1-row aggregate crossed
    * into both scans (never collected mid-plan); each side is one
    * scan + hash aggregation to `buckets` rows; the spine join and
    * the totals cross are bucket-sized. Two scans total, no
    * corpus-sized shuffle.
    */
  def psiBins(ref: DataFrame, cur: DataFrame, valueCol: String,
      buckets: Int, eps: Double = 1e-6): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    require(eps > 0.0, s"eps must be positive, got $eps")
    // NaN is dropped like null: one NaN in min/max poisons the bounds
    // (NaN orders above every double), every row's bin becomes NaN,
    // and the monitor would report "no drift" on exactly the batch
    // that is most anomalous. NaN MASS is not silently invisible
    // though — monitor it with [[nanShare]], which these value-bin
    // monitors deliberately exclude. A constant reference (hi == lo)
    // degenerates to point-comparison semantics: current values above
    // the constant clamp to the top bin, below (or equal) to bin 0 —
    // a total shift away from a frozen reference must surface, not
    // vanish into a shared bin.
    val bounds = refBounds(ref, valueCol)
    val r = binCounts(ref, valueCol, bounds, buckets, "n_ref")
    val c = binCounts(cur, valueCol, bounds, buckets, "n_cur")
    psiFromBins(r, c, buckets, eps)
  }

  /** The [min, max] reference bounds relation (1 row) [[psiBins]]
    * pins its grid to — exposed so a monitoring deployment can freeze
    * the grid at deploy time and bin arriving batches against it.
    */
  def refBounds(ref: DataFrame, valueCol: String): DataFrame =
    ref.select(col(valueCol).cast("double").as("_v"))
      .filter(col("_v").isNotNull && !isnan(col("_v")))
      .agg(min("_v").as("_lo"), max("_v").as("_hi"))

  /** Equal-width bin counts of `valueCol` over a `bounds` relation
    * (`_lo`/`_hi`, 1 row — crossed in, never collected mid-plan): the
    * ONE binning definition [[psiBins]] and the streaming drift
    * monitor share. The output `(bin, <as>)` relation is ADDITIVE —
    * per-batch counts merged by a keyed sum equal one binning pass
    * over the concatenation, which is what makes PSI incrementally
    * maintainable (the [[graft.streaming.StreamingRollup]] contract).
    */
  def binCounts(df: DataFrame, valueCol: String, bounds: DataFrame,
      buckets: Int, as: String): DataFrame =
    df.select(col(valueCol).cast("double").as("_x"))
      .filter(col("_x").isNotNull && !isnan(col("_x")))
      .crossJoin(bounds)
      .withColumn("bin",
        when(col("_hi") === col("_lo"),
          when(col("_x") > col("_hi"), lit(buckets - 1L)).otherwise(lit(0L)))
        .otherwise(
          greatest(
            least(floor((col("_x") - col("_lo")) * buckets / (col("_hi") - col("_lo"))),
              lit(buckets - 1L)),
            lit(0L))).cast("long"))
      .groupBy("bin").agg(count(lit(1)).as(as))

  /** The share/PSI-term tail of [[psiBins]] over ALREADY-BINNED count
    * relations `(bin, n_ref)` / `(bin, n_cur)` — exposed because bin
    * counts are additive (see [[binCounts]]), so an incrementally
    * accumulated current window plugs straight in.
    */
  def psiFromBins(r: DataFrame, c: DataFrame, buckets: Int,
      eps: Double = 1e-6): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    require(eps > 0.0, s"eps must be positive, got $eps")
    val totals = r.agg(sum("n_ref").as("_tr"))
      .crossJoin(c.agg(sum("n_cur").as("_tc")))
    val spine = r.sparkSession.range(buckets).select(col("id").as("bin"))
    spine
      .join(r, Seq("bin"), "left")
      .join(c, Seq("bin"), "left")
      .crossJoin(totals)
      .select(
        col("bin"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"),
        greatest(coalesce(col("n_ref"), lit(0L)) / col("_tr"), lit(eps)).as("_pr"),
        greatest(coalesce(col("n_cur"), lit(0L)) / col("_tc"), lit(eps)).as("_pc"))
      .select(
        col("bin"), col("n_ref"), col("n_cur"),
        // full-precision doubles: quantization is the caller's
        // presentation concern, and a decimal round(x, d) here is the
        // cross-engine HALF_UP-vs-binary flake class when a gate
        // oracle re-derives these shares
        col("_pr").as("share_ref"),
        col("_pc").as("share_cur"),
        ((col("_pc") - col("_pr")) * log(col("_pc") / col("_pr")))
          .as("psi_term"))
      .orderBy("bin")
  }

  /** Binned two-sample Kolmogorov–Smirnov comparison: the ECDFs of
    * both sides evaluated at `buckets` equal-width bin edges over the
    * JOINT [min, max] (joint, not reference-only: drift outside the
    * reference range must move the statistic, not clamp away). One
    * row per bin with cumulative counts/shares and the |ΔECDF| term;
    * `max(ks_term)` is the binned KS statistic D̂ — a lower bound on
    * the exact D with error at most the largest single-bin probability
    * mass (the standard sketched KS; raise `buckets` to tighten).
    *
    * Scale shape: identical to [[psiBins]] — two scans, bucket-sized
    * joins, 1-row bounds crossed in-plan — plus one window cumsum
    * over the `buckets`-row spine (NOT the corpus; the single
    * partition it runs in holds `buckets` rows). Cumulative sums run
    * on exact integer counts; the only float ops are the final two
    * divisions and a subtraction, so independent engines agree
    * bit-for-bit.
    */
  def ksBins(ref: DataFrame, cur: DataFrame, valueCol: String,
      buckets: Int): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    // same NaN guard as psiBins (track NaN mass with [[nanShare]]);
    // joint hi == lo means every value on BOTH sides is that one
    // constant, so bin 0 for all is exact (unlike psiBins, whose
    // reference-only bounds need the point-comparison branch)
    def side(df: DataFrame) =
      df.select(col(valueCol).cast("double").as("_v"))
        .filter(col("_v").isNotNull && !isnan(col("_v")))
    val bounds = side(ref).agg(min("_v").as("_rlo"), max("_v").as("_rhi"))
      .crossJoin(side(cur).agg(min("_v").as("_clo"), max("_v").as("_chi")))
      .select(least(col("_rlo"), col("_clo")).as("_lo"),
        greatest(col("_rhi"), col("_chi")).as("_hi"))
    def binned(df: DataFrame, n: String) =
      side(df).withColumnRenamed("_v", "_x")
        .crossJoin(bounds)
        .withColumn("bin",
          when(col("_hi") === col("_lo"), lit(0L)).otherwise(
            greatest(
              least(floor((col("_x") - col("_lo")) * buckets / (col("_hi") - col("_lo"))),
                lit(buckets - 1L)),
              lit(0L))).cast("long"))
        .groupBy("bin").agg(count(lit(1)).as(n))
    val r = binned(ref, "n_ref")
    val c = binned(cur, "n_cur")
    val totals = r.agg(sum("n_ref").as("_tr"))
      .crossJoin(c.agg(sum("n_cur").as("_tc")))
    val spine = r.sparkSession.range(buckets).select(col("id").as("bin"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("bin")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    spine
      .join(r, Seq("bin"), "left")
      .join(c, Seq("bin"), "left")
      .crossJoin(totals)
      .select(
        col("bin"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"),
        sum(coalesce(col("n_ref"), lit(0L))).over(w).as("_cr"),
        sum(coalesce(col("n_cur"), lit(0L))).over(w).as("_cc"),
        col("_tr"), col("_tc"))
      .select(
        col("bin"), col("n_ref"), col("n_cur"),
        (col("_cr") / col("_tr")).as("cum_share_ref"),
        (col("_cc") / col("_tc")).as("cum_share_cur"),
        abs(col("_cr") / col("_tr") - col("_cc") / col("_tc"))
          .as("ks_term"))
      .orderBy("bin")
  }

  /** Missing-mass census: row counts and null/NaN fractions per side,
    * one row. The value-bin monitors ([[psiBins]], [[ksBins]])
    * exclude non-finite rows by design (one NaN would poison their
    * bounds), so a NaN SURGE — a common real drift mode when an
    * upstream feature computation breaks — is surfaced here: alert on
    * `abs(nan_share_cur − nan_share_ref)` alongside the value-bin
    * statistics. Two scans, two 1-row aggregates, one cross join.
    */
  def nanShare(ref: DataFrame, cur: DataFrame, valueCol: String): DataFrame = {
    def census(df: DataFrame, suffix: String) =
      df.select(col(valueCol).cast("double").as("_v"))
        .agg(
          count(lit(1)).as(s"n_$suffix"),
          sum(when(col("_v").isNull || isnan(col("_v")), 1L).otherwise(0L))
            .as(s"n_bad_$suffix"))
    census(ref, "ref").crossJoin(census(cur, "cur"))
      .select(
        col("n_ref"), col("n_bad_ref"), col("n_cur"), col("n_bad_cur"),
        (col("n_bad_ref") / greatest(col("n_ref"), lit(1L))).as("nan_share_ref"),
        (col("n_bad_cur") / greatest(col("n_cur"), lit(1L))).as("nan_share_cur"),
        abs(col("n_bad_cur") / greatest(col("n_cur"), lit(1L))
          - col("n_bad_ref") / greatest(col("n_ref"), lit(1L))).as("nan_share_delta"))
  }

  /** EMBEDDING-space drift: per-group centroid comparison between two
    * corpus snapshots — the monitor for "the embedding model (or the
    * content it embeds) moved", which value-bin statistics on scalar
    * columns cannot see. One row per group present on either side:
    * counts, the cosine between the two centroids (1.0 = direction
    * unchanged; null when a side is absent or all-null), and the
    * centroid NORM ratio cur/ref (catches uniform scaling, which
    * cosine is blind to). Alert when `centroid_cos` drops below a
    * threshold or `norm_ratio` leaves [1/τ, τ].
    *
    * Scale shape: each side is one posexplode + ONE (group, pos)-keyed
    * hash aggregation to a (groups × dim)-row relation, rebuilt to
    * per-group arrays and joined on the group key — the meanPool
    * shape; no collect, no corpus-sized join, cosine is the native
    * single-pass expression.
    */
  def embeddingShift(ref: DataFrame, cur: DataFrame, groupCol: String,
      vecCol: String): DataFrame = {
    def centroids(df: DataFrame, side: String) =
      graft.operators.Ann.meanPool(df, groupCol, vecCol)
        .select(col(groupCol), col("pooled").as(s"_c_$side"))
    val normSq = (c: Column) =>
      aggregate(transform(c, x => x * x), lit(0.0), (a, x) => a + x)
    centroids(ref, "ref")
      .join(centroids(cur, "cur"), Seq(groupCol), "full_outer")
      // count ROWS (count(lit(1))), not non-null vectors — the monitor
      // reports group sizes as a census, and row counts stay consistent
      // with any external oracle counting the same groups
      .join(ref.groupBy(groupCol).agg(count(lit(1)).as("n_ref")),
        Seq(groupCol), "left")
      .join(cur.groupBy(groupCol).agg(count(lit(1)).as("n_cur")),
        Seq(groupCol), "left")
      .select(
        col(groupCol),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"),
        graft.operators.Ann.cosine(col("_c_ref"), col("_c_cur"))
          .as("centroid_cos"),
        // a zero-norm reference centroid has no meaningful ratio:
        // null (absent signal), not Infinity
        when(sqrt(normSq(col("_c_ref"))) === 0.0, lit(null))
          .otherwise(
            sqrt(normSq(col("_c_cur"))) / sqrt(normSq(col("_c_ref"))))
          .as("norm_ratio"))
      .orderBy(groupCol)
  }

  /** Categorical frequency shift — the drift dimension psi/ks (binned
    * numerics) and embeddingShift (vectors) don't cover: per-category
    * observed-vs-expected counts between a reference and a current
    * window, with the per-category chi-square contribution. One row
    * per category:
    *
    *   n_ref, n_cur          — raw counts (0 when absent on a side)
    *   expected              — n_ref scaled to the current total
    *   chi2_term             — (n_cur − expected)² / expected;
    *                           null for categories ABSENT in ref
    *                           (chi-square is undefined there — the
    *                           `is_new` flag is the signal instead)
    *   is_new / is_gone      — appeared / vanished category flags
    *
    * Deliberately NOT summed into one chi² statistic: the sum is one
    * cross-partition double accumulation away from the engine-order
    * flake class, and the per-category terms are what a monitor acts
    * on anyway (which categories moved, not just that something did).
    * Callers wanting the scalar sum the (few, category-bounded) rows.
    *
    * Scale shape: two count aggs + a category-sized full-outer join +
    * a 1-row totals broadcast riding the plan.
    */
  def categoricalShift(ref: DataFrame, cur: DataFrame,
      catCol: String): DataFrame = {
    val r = ref.groupBy(catCol).agg(count(lit(1)).as("n_ref"))
      .withColumnRenamed(catCol, "_rcat")
    val c = cur.groupBy(catCol).agg(count(lit(1)).as("n_cur"))
      .withColumnRenamed(catCol, "_ccat")
    // NULL-SAFE join key: a null category (missing values — a prime
    // drift signal, the null-RATE shift) must meet itself, not split
    // into a phantom vanished + phantom new pair as SQL equality would
    val joined = r.join(c, r("_rcat") <=> c("_ccat"), "full_outer")
      .select(coalesce(col("_rcat"), col("_ccat")).as(catCol),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
      // the totals agg below would otherwise re-derive BOTH corpus
      // scans; the joined relation is category-sized, so pinning it is
      // one cheap job that halves the corpus reads
      .localCheckpoint(true)
    val totals = broadcast(joined.agg(
      sum("n_ref").as("_tr"), sum("n_cur").as("_tc")))
    joined.crossJoin(totals)
      .withColumn("expected",
        col("n_ref").cast("double") * col("_tc") / col("_tr"))
      .withColumn("_dev", col("n_cur") - col("expected"))
      .select(col(catCol), col("n_ref"), col("n_cur"),
        col("expected"),
        // x*x, not pow(x, 2): a single IEEE multiply is bit-identical
        // across engines; Math.pow/libm pow are only 1-ulp-accurate
        when(col("n_ref") === 0, lit(null).cast("double"))
          .otherwise(col("_dev") * col("_dev") / col("expected"))
          .as("chi2_term"),
        (col("n_ref") === 0).as("is_new"),
        (col("n_cur") === 0).as("is_gone"))
      .orderBy(catCol)
  }
}
