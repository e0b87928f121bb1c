package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering, the
  * lake-layout technique behind Delta/Iceberg OPTIMIZE ZORDER. Rows
  * sorted by the bit-interleaved value of two quantized dimensions
  * land near their neighbors in BOTH dimensions, so parquet min/max
  * file stats prune range scans on either column — a plain sort
  * clusters only its leading column.
  *
  * Everything is a pure column program (quantize → unrolled 16-step
  * bit interleave — codegen'd, no UDF) plus one
  * `repartitionByRange(z).sortWithinPartitions(z)`, i.e. exactly one
  * range shuffle regardless of corpus size.
  */
object Layout {

  /** Quantize `c` into [0, 65535] fixed-point given the column's
    * [min, max] (from stats or a prior agg). Out-of-range values clamp.
    */
  def quantize16(c: Column, min: Double, max: Double): Column = {
    require(max > min, s"degenerate quantization range [$min, $max]")
    val scaled = (c.cast("double") - min) / (max - min) * 65535.0
    least(greatest(round(scaled, 0).cast("long"), lit(0L)), lit(65535L))
  }

  /** 32-bit Morton code of two 16-bit quantized dims: bit i of `qa`
    * lands at position 2i, bit i of `qb` at 2i+1. Unrolled to 32
    * codegen'd terms — no UDF, no loop at runtime.
    */
  def interleaveBits(qa: Column, qb: Column): Column =
    (0 until 16).map { i =>
      (shiftrightunsigned(qa, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftrightunsigned(qb, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)

  /** Z-value of two numeric columns given their ranges. */
  def zValue(a: Column, aMin: Double, aMax: Double,
      b: Column, bMin: Double, bMax: Double): Column =
    interleaveBits(quantize16(a, aMin, aMax), quantize16(b, bMin, bMax))

  /** Re-layout `df` into `numFiles` z-ordered partitions: range
    * partition + in-partition sort on the z-value, so every output
    * file covers a compact z-interval (⇒ a compact rectangle union in
    * (a, b) space) and parquet min/max stats on BOTH source columns
    * become selective. Ranges are taken from one distributed agg when
    * not supplied.
    */
  def zOrder(df: DataFrame, colA: String, colB: String, numFiles: Int,
      ranges: Option[(Double, Double, Double, Double)] = None): DataFrame = {
    require(!df.columns.contains("_z"),
      "zOrder reserves the _z column name; rename the input column")
    val (aMin, aMax, bMin, bMax) = ranges.getOrElse {
      val r = df.agg(
        min(col(colA).cast("double")), max(col(colA).cast("double")),
        min(col(colB).cast("double")), max(col(colB).cast("double"))).collect().head
      // empty input (or an all-null z column): no range to quantize
      // over — return the frame unchanged rather than NPE on the null
      // aggregate bounds
      if (r.isNullAt(0) || r.isNullAt(2)) return df
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    }
    df.withColumn("_z", zValue(col(colA), aMin, aMax, col(colB), bMin, bMax))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
  }
}
