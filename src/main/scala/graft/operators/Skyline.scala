package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed 2-D skyline (Pareto front) — the "no row is better on
  * both axes" operator model-selection and corpus-curation sweeps ask
  * for (keep documents no other document beats on BOTH quality and
  * brevity; keep model checkpoints no other checkpoint beats on BOTH
  * loss and size).
  *
  * Definition (minimize `minCol`, maximize `maxCol`): row p is
  * DOMINATED iff some q has `q.min <= p.min && q.max >= p.max` with
  * at least one strict inequality. The skyline is the non-dominated
  * set. Duplicated (min, max) points do not dominate each other —
  * both survive.
  *
  * Shape: the quadratic NOT-EXISTS self-join is never materialized.
  * The dominance test for 2-D needs only, per row,
  *   (a) the best `maxCol` among rows with STRICTLY smaller `minCol`
  *       — an exclusive prefix max over the ≤|distinct minCol|-row
  *       histogram ([[PrefixSum.rangeExclusiveMax]]: one range
  *       exchange, parallel windows, bounded spine), and
  *   (b) the best `maxCol` among rows with the SAME `minCol` — a
  *       plain per-key aggregate on the same histogram.
  * The annotated histogram joins back onto the corpus on `minCol`
  * (broadcast when small, shuffle equi-join otherwise) — no window
  * ever sees the full corpus on one partition, so the plan survives a
  * corpus whose `minCol` is near-continuous.
  */
object Skyline {

  /** Append `dominatedCol` (boolean) to `df` — dominance evaluated
    * WITHIN each `groupCols` cohort when given (a per-brand frontier:
    * rows only dominate same-group rows). Both columns must be
    * orderable numerics; nulls in either coordinate are dominated by
    * definition (they never beat anything and anything beats them) —
    * they are tagged dominated=true here and excluded from the
    * dominance histogram, so a (null, high-max) row can never feed
    * the prefix max of real rows.
    */
  def markDominated(df: DataFrame, minCol: String, maxCol: String,
      dominatedCol: String = "dominated",
      groupCols: Seq[String] = Nil): DataFrame = {
    // null-coordinate rows: dominated by definition, and they must
    // not contribute to _sky_same/_sky_cheaper (nulls sort FIRST
    // under the ascending prefix max, so an unfiltered null-min row
    // would poison every real row's cheaper-max)
    val nullRows = df
      .filter(col(minCol).isNull || col(maxCol).isNull)
      .withColumn(dominatedCol, lit(true))
    val clean = df.filter(col(minCol).isNotNull && col(maxCol).isNotNull)
    // per-distinct-(group, minCol) histogram: the only relation the
    // prefix scan touches; distinct keys by construction (groupBy),
    // so the exclusive window is tie-free
    val hist = clean
      .groupBy((groupCols.map(col) :+ col(minCol).as("_sky_k")): _*)
      .agg(max(col(maxCol)).as("_sky_same"))
    val marked = PrefixSum.rangeExclusiveMax(hist, "_sky_k", "_sky_same",
      "_sky_cheaper", groupCols = groupCols)
      .withColumnsRenamed(groupCols.map(c => c -> s"_sky_g_$c").toMap)
    val joinCond = (groupCols.map(c => col(c) <=> col(s"_sky_g_$c")) :+
      (col(minCol) === col("_sky_k"))).reduce(_ && _)
    clean.join(marked, joinCond)
      .withColumn(dominatedCol,
        // strictly-cheaper same-group row at least ties maxCol, or a
        // same-cost row strictly beats it
        (col("_sky_cheaper").isNotNull &&
          col("_sky_cheaper") >= col(maxCol)) ||
          col("_sky_same") > col(maxCol))
      .drop(("_sky_k" +: "_sky_same" +: "_sky_cheaper" +:
        groupCols.map(c => s"_sky_g_$c")): _*)
      .unionByName(nullRows)
  }

  /** The skyline itself: rows of `df` not dominated under
    * (minimize `minCol`, maximize `maxCol`), per `groupCols` cohort
    * when given.
    */
  def pareto2d(df: DataFrame, minCol: String, maxCol: String,
      groupCols: Seq[String] = Nil): DataFrame = {
    val d = "_sky_dom"
    markDominated(df, minCol, maxCol, d, groupCols).filter(!col(d)).drop(d)
  }
}
