package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust statistics over grouped integer columns — exact per-group
  * medians and MAD (median absolute deviation) outlier flags, shaped
  * for corpora where "sort each group in a window" is the wrong plan:
  * every rank derivation here runs over the DISTINCT-(group, value)
  * HISTOGRAM relation, so the only window in the plan is
  * value-histogram-sized, never corpus-sized. At 100 TB a per-group
  * row window serializes each group through one task; the histogram of
  * distinct lengths/scores stays tiny (bounded by the value domain)
  * no matter how many rows share it.
  *
  * Medians are the exact LOWER median (the element at ascending rank
  * ⌈n/2⌉) — integer in, integer out, no interpolation, so results are
  * bit-identical across engines, layouts, and retries, and safe to
  * hash-compare against a plain `row_number` window oracle.
  */
object Robust {

  /** Exact lower median of `valueCol` per `groupCol`: per-group value
    * histogram + cumulative-count window over the distinct-value
    * relation, then the bucket whose cumulative range covers rank
    * (n+1) div 2. Output: one row per group, columns (groupCol,
    * `median`).
    */
  def groupMedian(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    // aggregate semantics: null values don't participate (like SQL
    // median/percentile — and unlike a raw Spark window, which would
    // rank nulls FIRST and silently shift every rank)
    val hist = df.filter(col(valueCol).isNotNull)
      .groupBy(groupCol, valueCol).agg(count(lit(1)).as("_c"))
    val cumW = Window.partitionBy(groupCol).orderBy(valueCol)
    hist
      .withColumn("_cum", sum("_c").over(cumW))
      .withColumn("_n", sum("_c").over(Window.partitionBy(groupCol)))
      // the bucket CONTAINING the rank: cum reaches it, cum-before didn't
      .withColumn("_rk", expr("(_n + 1) div 2"))
      .filter(col("_cum") >= col("_rk") && col("_cum") - col("_c") < col("_rk"))
      .select(col(groupCol), col(valueCol).cast("long").as("median"))
  }

  /** Per-row MAD outlier flags: |value − group median| > k · group MAD
    * (MAD = lower median of the absolute deviations). Appends columns
    * `median`, `mad`, `dev`, `is_outlier` to the input rows — EVERY
    * input row survives, including null-valued rows and rows of groups
    * whose values are all null (group stats join back via LEFT joins;
    * a null value yields null median-context columns as needed and
    * `is_outlier = false`, since a value that doesn't exist cannot be
    * an outlier — an explicit false, not a null that downstream
    * `when(...)` guards would silently misread). Both median passes
    * ride the histogram shape above; the group-stat relations joined
    * back are one-row-per-group (broadcast-sized at any corpus scale).
    * A group with MAD = 0 (over half its values identical) flags
    * exactly the rows with any deviation when k ≥ 0 — the standard
    * degenerate-MAD behavior, spec-pinned.
    */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
      k: Int): DataFrame = {
    require(k >= 0, s"k must be >= 0, got $k")
    val med = groupMedian(df, groupCol, valueCol)
    val withDev = df.join(med, Seq(groupCol), "left")
      .withColumn("dev", abs(col(valueCol).cast("long") - col("median")))
    val mad = groupMedian(withDev, groupCol, "dev")
      .withColumnRenamed("median", "mad")
    withDev.join(mad, Seq(groupCol), "left")
      .withColumn("is_outlier",
        coalesce(col("dev") > lit(k.toLong) * col("mad"), lit(false)))
  }
}
