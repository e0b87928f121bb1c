package graft.operators

import org.apache.spark.sql.DataFrame
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
    val bounds = ref.agg(min(valueCol).as("_lo"), max(valueCol).as("_hi"))
    def binned(df: DataFrame, n: String) =
      df.select(col(valueCol).cast("double").as("_x"))
        .filter(col("_x").isNotNull)
        .crossJoin(bounds)
        .withColumn("bin",
          greatest(
            least(floor((col("_x") - col("_lo")) * buckets / (col("_hi") - col("_lo"))),
              lit(buckets - 1L)),
            lit(0L)).cast("long"))
        .groupBy("bin").agg(count(lit(1)).as(n))
    val r = binned(ref, "n_ref")
    val c = binned(cur, "n_cur")
    val totals = r.agg(sum("n_ref").as("_tr"))
      .crossJoin(c.agg(sum("n_cur").as("_tc")))
    val spine = ref.sparkSession.range(buckets).select(col("id").as("bin"))
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
        round(col("_pr"), 6).as("share_ref"),
        round(col("_pc"), 6).as("share_cur"),
        round((col("_pc") - col("_pr")) * log(col("_pc") / col("_pr")), 6)
          .as("psi_term"))
      .orderBy("bin")
  }
}
