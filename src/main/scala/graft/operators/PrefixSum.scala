package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global prefix sums — the two-pass range-partitioned
  * scan that replaces the "single-partition window over the
  * distinct-key relation" envelope the rank/threshold operators
  * ([[Metrics.aucExact]], [[Metrics.prCurve]],
  * [[Curation.curriculumStages]]) previously documented as their
  * at-scale fallback. With it, a corpus whose score column is
  * continuous (distinct-score relation ≈ corpus-sized) still computes
  * exact global cumulative sums with every stage parallel.
  *
  * Shape: ONE range exchange on the order key (equal keys co-located
  * by the range partitioner), a per-partition window (parallel), a
  * ≤`partitions`-row per-partition-totals relation whose own prefix
  * sum is the only single-partition step (bounded by the partition
  * count, never the data — the same bounded-spine exception as the
  * drift KS window), and a broadcast join of the offsets back onto
  * the partitioned rows. Result values are independent of where the
  * sampled range boundaries land, so the output is deterministic
  * even though `repartitionByRange` samples.
  *
  * Intended for relations with DISTINCT order keys (histograms —
  * every call site pre-aggregates by the key): with duplicate keys an
  * exclusive-of-current-ROW sum is tie-order-dependent under ANY
  * execution, plain window included.
  */
object PrefixSum {

  /** Append EXCLUSIVE (strictly-preceding-rows) prefix sums over the
    * global `orderCol` order: for each `(valueCol, outCol)` in `sums`,
    * `outCol` = Σ valueCol over rows ordered strictly before. Nulls in
    * `orderCol` order first ascending / last descending (Spark's
    * default, identical in the range partitioner and the window).
    * `partitions` defaults to `spark.sql.shuffle.partitions`.
    */
  def rangeExclusive(df: DataFrame, orderCol: String, descending: Boolean,
      sums: Seq[(String, String)], partitions: Int = 0): DataFrame = {
    require(sums.nonEmpty, "at least one (valueCol, outCol) required")
    val p =
      if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val key: Column = if (descending) col(orderCol).desc else col(orderCol).asc
    // PINNED (eager localCheckpoint): the partitioned relation has two
    // consumers (the totals branch and the offset join), and without
    // pinning each may instantiate the range exchange SEPARATELY —
    // RangePartitioner samples its boundaries from the input, and a
    // shuffled upstream (e.g. a hash-aggregate histogram) presents
    // rows in a nondeterministic order, so the two instantiations can
    // sample DIFFERENT boundaries and disagree on every partition id
    // (caught by the ScaleStress closed-form AUC probe at 2M rows:
    // off by ~20 ppm, varying run to run). The checkpoint freezes one
    // partitioning that both branches read.
    val parts = df.repartitionByRange(p, key)
      .withColumn("_psx_pid", spark_partition_id())
      .localCheckpoint(true)
    val local = Window.partitionBy("_psx_pid").orderBy(key)
      .rowsBetween(Window.unboundedPreceding, -1)
    // per-partition totals: ≤ p rows — the bounded spine
    val totals = parts.groupBy("_psx_pid")
      .agg(sum(col(sums.head._1)).as(s"_psx_t0"),
        sums.tail.zipWithIndex.map { case ((v, _), i) =>
          sum(col(v)).as(s"_psx_t${i + 1}")
        }: _*)
    val offW = Window.orderBy(col("_psx_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals.select(
      col("_psx_pid") +: sums.indices.map(i =>
        coalesce(sum(col(s"_psx_t$i")).over(offW), lit(0L)).as(s"_psx_o$i")): _*)
    parts
      .join(broadcast(offsets), Seq("_psx_pid"))
      .select(df.columns.map(col).toIndexedSeq ++
        sums.zipWithIndex.map { case ((v, out), i) =>
          (col(s"_psx_o$i") +
            coalesce(sum(col(v)).over(local), lit(0L))).as(out)
        }: _*)
  }
}
