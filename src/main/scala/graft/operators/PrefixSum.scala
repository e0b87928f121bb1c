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
    * `orderCol` order — GLOBAL, or per group when `groupCols` is
    * given (the order restarts inside each group, like a window
    * `partitionBy(groupCols).orderBy(orderCol)`, but no group ever
    * occupies a single partition: a corpus-sized cohort scans as
    * parallel range partitions). For each `(valueCol, outCol)` in
    * `sums`, `outCol` = Σ valueCol over same-group rows ordered
    * strictly before. Nulls in `orderCol` order first ascending /
    * last descending (Spark's default, identical in the range
    * partitioner and the window). `partitions` defaults to
    * `spark.sql.shuffle.partitions`.
    */
  def rangeExclusive(df: DataFrame, orderCol: String, descending: Boolean,
      sums: Seq[(String, String)], partitions: Int = 0,
      groupCols: Seq[String] = Nil): DataFrame = {
    require(sums.nonEmpty, "at least one (valueCol, outCol) required")
    val p =
      if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val key: Column = if (descending) col(orderCol).desc else col(orderCol).asc
    // group-major range: a group's rows span CONTIGUOUS partitions,
    // so the per-group offset is a prefix over that group's pids
    val rangeKeys = groupCols.map(col(_).asc) :+ key
    val pidGrp = "_psx_pid" +: groupCols
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
    val parts = df.repartitionByRange(p, rangeKeys: _*)
      .withColumn("_psx_pid", spark_partition_id())
      .localCheckpoint(true)
    val local = Window.partitionBy(pidGrp.map(col): _*).orderBy(key)
      .rowsBetween(Window.unboundedPreceding, -1)
    // per-(partition, group) totals: ≤ p + |groups| rows (each group
    // spans contiguous pids) — the bounded spine
    val totals = parts.groupBy(pidGrp.map(col): _*)
      .agg(sum(col(sums.head._1)).as(s"_psx_t0"),
        sums.tail.zipWithIndex.map { case ((v, _), i) =>
          sum(col(v)).as(s"_psx_t${i + 1}")
        }: _*)
    val offW =
      (if (groupCols.isEmpty) Window.orderBy(col("_psx_pid"))
       else Window.partitionBy(groupCols.map(col): _*)
         .orderBy(col("_psx_pid")))
        .rowsBetween(Window.unboundedPreceding, -1)
    // spine columns renamed so the join back is unambiguous, and the
    // group keys join NULL-SAFELY (a null group is a real histogram
    // group — plain equality would silently drop its rows)
    val offsets = totals.select(
      pidGrp.zipWithIndex.map { case (c, i) => col(c).as(s"_psx_k$i") } ++
        sums.indices.map(i =>
          coalesce(sum(col(s"_psx_t$i")).over(offW), lit(0L)).as(s"_psx_o$i")): _*)
    // global: offsets are ≤ p rows — broadcast. Grouped: the spine is
    // group-cardinality-sized, so let the planner pick the join
    val offSide = if (groupCols.isEmpty) broadcast(offsets) else offsets
    val joinCond = pidGrp.zipWithIndex
      .map { case (c, i) => col(c) <=> col(s"_psx_k$i") }
      .reduce(_ && _)
    parts
      .join(offSide, joinCond)
      .select(df.columns.map(col).toIndexedSeq ++
        sums.zipWithIndex.map { case ((v, out), i) =>
          (col(s"_psx_o$i") +
            coalesce(sum(col(v)).over(local), lit(0L))).as(out)
        }: _*)
  }

  /** EXCLUSIVE (strictly-preceding-rows) prefix MAX over the
    * `orderCol` order — the max-monoid sibling of [[rangeExclusive]],
    * same two-pass shape: ONE range exchange, parallel per-partition
    * windows, a ≤`partitions`-row totals spine, broadcast offsets.
    * `outCol` is NULL when no row strictly precedes (max over the
    * empty set — callers decide the identity). Used by
    * [[Skyline.pareto2d]] for the running "best other coordinate so
    * far" scan that a naive `Window.orderBy` without partitionBy
    * would compute on a single partition.
    */
  def rangeExclusiveMax(df: DataFrame, orderCol: String, valueCol: String,
      outCol: String, partitions: Int = 0,
      groupCols: Seq[String] = Nil): DataFrame = {
    val p =
      if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    // group-major range (groups span contiguous partitions), pinned
    // for the same two-consumer boundary-race reason as
    // rangeExclusive (see the localCheckpoint comment above)
    val rangeKeys = groupCols.map(col(_).asc) :+ col(orderCol).asc
    val pidGrp = "_psx_pid" +: groupCols
    val parts = df.repartitionByRange(p, rangeKeys: _*)
      .withColumn("_psx_pid", spark_partition_id())
      .localCheckpoint(true)
    val local = Window.partitionBy(pidGrp.map(col): _*)
      .orderBy(col(orderCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val totals = parts.groupBy(pidGrp.map(col): _*)
      .agg(max(col(valueCol)).as("_psx_t0"))
    val offW =
      (if (groupCols.isEmpty) Window.orderBy(col("_psx_pid"))
       else Window.partitionBy(groupCols.map(col): _*)
         .orderBy(col("_psx_pid")))
        .rowsBetween(Window.unboundedPreceding, -1)
    val offsets0 = totals.select(
      pidGrp.zipWithIndex.map { case (c, i) => col(c).as(s"_psx_k$i") } :+
        max(col("_psx_t0")).over(offW).as("_psx_o0"): _*)
    // global: ≤ p rows — broadcast; grouped: spine is group-sized,
    // let the planner pick
    val offsets = if (groupCols.isEmpty) broadcast(offsets0) else offsets0
    val joinCond = pidGrp.zipWithIndex
      .map { case (c, i) => col(c) <=> col(s"_psx_k$i") }
      .reduce(_ && _)
    parts
      .join(offsets, joinCond)
      .select(df.columns.map(col).toIndexedSeq :+
        greatest(col("_psx_o0"), max(col(valueCol)).over(local)).as(outCol): _*)
  }
}
