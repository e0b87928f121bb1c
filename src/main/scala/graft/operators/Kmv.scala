package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

import graft.functions.{BottomK, KmvEntry}

/** Incremental ORDER-STATISTICS rollups via mergeable bottom-k (KMV)
  * sample sketches — the quantile sibling of [[SketchRollup]]'s HLL
  * distinct-count rollup. Each ingest unit (e.g. a day partition)
  * keeps the k rows with the smallest content-derived hash: a
  * deterministic uniform sample. Any slice's sample is the bottom-k of
  * its units' samples — kilobytes merged per unit, never a rescan of
  * raw history — and sample order statistics estimate the slice's
  * quantiles with rank error ~ sqrt(q(1-q)/k).
  *
  * Everything is content-derived (md5 bucket of `kmv:<id>`, id
  * tiebreak, [[graft.operators.Curation.hashBucket]] — the house
  * randomness), so the sketch table is bit-identical on every build,
  * any partitioning, any merge tree; the `q_quantile_rollup` oracle
  * re-derives the SAME sample relationally in DuckDB and the estimates
  * hash-match exactly.
  *
  * Scale shape: building is one hash-partitioned agg whose typed
  * Aggregator state is ≤ 2k entries per group with map-side combine
  * (≤ k entries shuffle per partition per unit — no per-unit global
  * sort, no window). Merging groups the unit-sketch TABLE (one row per
  * unit) — bytes, not data.
  */
object Kmv {

  /** One bottom-k sample per (`unitCols`) group: `unitCols ++ (n_rows
    * long, sample array<struct<h,id,v>>)`. `idCol` must be a unique
    * integral row key (it seeds the hash and breaks hash ties);
    * `valueCol` is cast to long — quantize floats to integer units
    * first, per the house rule.
    */
  def buildUnits(df: DataFrame, unitCols: Seq[String], idCol: String,
      valueCol: String, k: Int): DataFrame = {
    require(unitCols.nonEmpty, "at least one unit column required")
    val bk = udaf(new BottomK(k), Encoders.product[KmvEntry])
    // null id/value rows are dropped BEFORE the agg (the KmvEntry
    // encoder's primitive longs reject nulls with an opaque runtime
    // error otherwise); n_rows therefore counts the SAMPLEABLE census
    df.where(col(idCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(unitCols.map(col).toIndexedSeq: _*)
      .agg(
        count(lit(1)).as("n_rows"),
        bk(
          Curation.hashBucket(
            concat(lit("kmv:"), col(idCol).cast("long").cast("string"))),
          col(idCol).cast("long"),
          col(valueCol).cast("long")).as("sample"))
  }

  /** Roll unit sketches up to any slice (`sliceCols` ⊆ unit columns or
    * derived from them): exact row counts ride along, samples re-take
    * the bottom-k of the union — which equals the sample a fresh build
    * over the slice's raw rows would produce (KmvSpec pins this).
    */
  def mergeOverSlice(units: DataFrame, sliceCols: Seq[String], k: Int): DataFrame = {
    require(sliceCols.nonEmpty, "at least one slice column required")
    val bk = udaf(new BottomK(k), Encoders.product[KmvEntry])
    val slice = sliceCols.map(col).toIndexedSeq
    val counts = units.groupBy(slice: _*).agg(sum("n_rows").as("n_rows"))
    val samples = units
      .select(slice :+ explode(col("sample")).as("_e"): _*)
      .groupBy(slice: _*)
      .agg(bk(col("_e.h"), col("_e.id"), col("_e.v")).as("sample"))
    counts.join(samples, sliceCols)
  }

  /** The q-th sample order statistic of a sketch's `sample` column —
    * value at rank max(1, ceil(q·len)) of the carried values, the
    * lower empirical quantile. Exactly mirrored by the gate oracle's
    * row_number form.
    */
  def sampleQuantile(sampleCol: Column, q: Double): Column = {
    require(q > 0.0 && q <= 1.0, s"quantile must be in (0, 1], got $q")
    val vs = array_sort(transform(sampleCol, e => e.getField("v")))
    element_at(vs, greatest(lit(1L), ceil(lit(q) * size(vs))).cast("int"))
  }
}
