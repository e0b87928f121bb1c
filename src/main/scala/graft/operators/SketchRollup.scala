package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental distinct-count rollups via mergeable HLL sketches
  * (Apache DataSketches, bundled with Spark 4) — the "sketch-as-table"
  * pattern: sketch each ingest unit (e.g. day partition) ONCE at write
  * time, then answer distinct-count queries over ARBITRARY slices by
  * merging the unit sketches — never rescanning raw history. The
  * reference recomputes stats per training run from raw records
  * (src/trainer/code/train.py); at 100 TB a distinct-users-this-
  * quarter query must not rescan a quarter of raw events, and with
  * unit sketches it reads kilobytes per unit instead.
  *
  * Soundness: HLL register state is an insert-order-independent
  * max — so the union of per-unit sketches is REGISTER-IDENTICAL to
  * one sketch built over the concatenated input (same lgConfigK).
  * Merging loses nothing; only the usual HLL estimation error (~1.6%
  * at lgK=12) separates the estimate from the exact count.
  * SketchRollupSpec asserts the register-identity equality; the gate
  * query bounds the estimate against the oracled exact census.
  *
  * Scale shape: building is one hash-partitioned agg over (unit keys);
  * each group's state is one ≤2^lgK-register sketch regardless of
  * input size (partial agg merges sketches map-side). Querying merges
  * #selected-units sketches — bytes, not rows.
  */
object SketchRollup {

  /** One HLL sketch per (`unitCols`) group over `valueCol` — the
    * materializable rollup table (`sketch` binary + `n_rows` long).
    */
  def buildUnits(df: DataFrame, unitCols: Seq[String], valueCol: String,
      lgConfigK: Int = 12): DataFrame = {
    require(unitCols.nonEmpty, "at least one unit column required")
    df.groupBy(unitCols.map(col).toIndexedSeq: _*)
      .agg(
        hll_sketch_agg(col(valueCol), lit(lgConfigK)).as("sketch"),
        count(col(valueCol)).as("n_rows"))
  }

  /** Distinct-count estimates over any slice of a unit-sketch table:
    * group the units by `sliceCols` (a subset of the unit columns, or
    * derived from them) and merge each slice's sketches. Output:
    * `sliceCols` ++ (`distinct_est` long, `n_rows` long).
    */
  def distinctOverSlice(units: DataFrame, sliceCols: Seq[String]): DataFrame = {
    require(sliceCols.nonEmpty, "at least one slice column required")
    units.groupBy(sliceCols.map(col).toIndexedSeq: _*)
      .agg(
        hll_sketch_estimate(hll_union_agg(col("sketch"))).as("distinct_est"),
        sum("n_rows").as("n_rows"))
  }

  /** Register-identity check column: merged unit sketches vs one
    * whole-input sketch (exposed for specs/gates).
    */
  def estimateOfUnion(sketches: Column): Column =
    hll_sketch_estimate(hll_union_agg(sketches))
}
