package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed exact order statistics over NDV-bounded value
  * histograms — the reusable operator API behind the
  * q_weighted_median / q_trimmed_mean / q_equidepth_hist /
  * q_conformal / q_spearman / q_gini_value gates.
  *
  * Shared shape: aggregate the corpus once to a (group, value, mass)
  * histogram, run [[PrefixSum.rangeExclusive]] over it (ONE range
  * exchange, parallel per-partition windows, bounded spine), and
  * answer every rank question with integer arithmetic on
  * (value, mass, cum_excl). No per-group sort, no group ever pinned
  * to a single partition, and group totals are derived from the
  * prefix relation itself (max of the inclusive cum) so the corpus is
  * scanned exactly once.
  *
  * All outputs are exact integers (or exact integer numerator/
  * denominator pairs); quantization is the caller's business.
  */
object RankStats {

  /** The annotated histogram: one row per (groupCols, valueCol)
    * with `massCol` summed, exclusive prefix mass `cum_excl` in
    * ascending `valueCol` order within each group, and the group
    * total `total`. The building block every selector below rides.
    */
  def cumHistogram(df: DataFrame, valueCol: String, massExpr: Column,
      groupCols: Seq[String]): DataFrame = {
    val hist = df
      .groupBy((groupCols.map(col) :+ col(valueCol)): _*)
      .agg(sum(massExpr).cast("long").as("mass"))
    val cum = PrefixSum.rangeExclusive(hist, valueCol, descending = false,
      Seq("mass" -> "cum_excl"), groupCols = groupCols)
    // totals from the prefix relation's last inclusive cum — riding
    // the pinned checkpoint, NOT a second corpus aggregation
    val totals =
      if (groupCols.isEmpty)
        cum.agg(max(col("cum_excl") + col("mass")).as("total"))
      else
        cum.groupBy(groupCols.map(col): _*)
          .agg(max(col("cum_excl") + col("mass")).as("total"))
    if (groupCols.isEmpty) cum.crossJoin(broadcast(totals))
    else cum.join(broadcast(totals), groupCols)
  }

  /** Exact lower weighted median per group: the smallest value whose
    * inclusive cumulative mass reaches half the group total. Returns
    * one row per group: groupCols ++ (total, median value as
    * `medianCol`).
    */
  def weightedMedian(df: DataFrame, valueCol: String, massExpr: Column,
      groupCols: Seq[String], medianCol: String = "median"): DataFrame =
    cumHistogram(df, valueCol, massExpr, groupCols)
      .filter(lit(2) * (col("cum_excl") + col("mass")) >= col("total") &&
        lit(2) * col("cum_excl") < col("total"))
      .select((groupCols.map(col) :+ col("total") :+
        col(valueCol).as(medianCol)): _*)

  /** Exact k-th order statistic per group, k given as a Column
    * expression over (groupCols, total) — e.g. a conformal
    * ceil(0.9·(n+1)) or a decile target. Returns groupCols ++
    * (total, k, value).
    */
  def kthValue(df: DataFrame, valueCol: String, massExpr: Column,
      groupCols: Seq[String], k: Column): DataFrame =
    cumHistogram(df, valueCol, massExpr, groupCols)
      .withColumn("k", k)
      .filter(col("cum_excl") < col("k") &&
        col("cum_excl") + col("mass") >= col("k"))
      .select((groupCols.map(col) :+ col("total") :+ col("k") :+
        col(valueCol)): _*)

  /** Exact two-sided trimmed sum per group: drop the `num/den`
    * lightest and heaviest mass fractions (lo = total·num div den)
    * and return groupCols ++ (total, lo, trim_sum) where trim_sum =
    * Σ value·retained-mass over the exact rank-interval overlap.
    * Trimmed mean = trim_sum / (total − 2·lo), left to the caller as
    * an exact rational.
    */
  def trimmedSum(df: DataFrame, valueCol: String, massExpr: Column,
      groupCols: Seq[String], num: Int, den: Int): DataFrame = {
    require(num >= 0 && den > 0 && 2 * num < den,
      s"trim fraction out of range: $num/$den")
    cumHistogram(df, valueCol, massExpr, groupCols)
      .withColumn("lo", expr(s"(total * $num) div $den"))
      .withColumn("kept", greatest(lit(0L),
        least(col("cum_excl") + col("mass"), col("total") - col("lo"))
          - greatest(col("cum_excl"), col("lo"))))
      .groupBy((groupCols.map(col) :+ col("total") :+ col("lo")): _*)
      .agg(sum(col("kept") * col(valueCol)).cast("long").as("trim_sum"))
  }

  /** Tie-correct DOUBLED average ranks per (group, value): the
    * integer 2·cum_excl + mass + 1 (= 2·avg-rank of the tie block) —
    * the exact-rank input to Spearman/rank-based statistics. Returns
    * groupCols ++ (valueCol, doubled rank as `outCol`) for joining
    * back onto rows.
    */
  def doubledRanks(df: DataFrame, valueCol: String,
      groupCols: Seq[String], outCol: String): DataFrame =
    cumHistogram(df, valueCol, lit(1L), groupCols)
      .select((groupCols.map(col) :+ col(valueCol) :+
        (lit(2) * col("cum_excl") + col("mass") + 1).as(outCol)): _*)

  /** Exact Gini numerator/denominator per group over a non-negative
    * value column: returns groupCols ++ (n, total_value, gini_num,
    * gini_den) with G = gini_num / gini_den exactly
    * (tie-exact: block (v, c, p) contributes v·(2cp + c² + c) to the
    * doubled rank-weighted sum). Callers quantize.
    */
  def giniParts(df: DataFrame, valueCol: String,
      groupCols: Seq[String]): DataFrame =
    cumHistogram(df, valueCol, lit(1L), groupCols)
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum("mass").cast("long").as("n"),
        expr(s"sum(CAST($valueCol AS DECIMAL(38,0)) * mass)").as("_t"),
        expr(s"sum(CAST($valueCol AS DECIMAL(38,0))" +
          " * (2 * mass * cum_excl + mass * mass + mass))").as("_a2"))
      .select((groupCols.map(col) :+ col("n") :+
        expr("CAST(_t AS DECIMAL(38,0))").as("total_value") :+
        expr("CAST(_a2 - (n + 1) * _t AS DECIMAL(38,0))").as("gini_num") :+
        expr("CAST(CAST(n AS DECIMAL(38,0)) * _t AS DECIMAL(38,0))")
          .as("gini_den")): _*)
}
