package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructType, TimestampType}

/** Temporal joins Spark's built-in operators lack: as-of join and
  * bounded range (interval) join.
  *
  * Both are composed from existing operators — preference (a) of the
  * custom-operator ladder — so Catalyst plans, AQE re-plans, and
  * whole-stage codegen all apply untouched:
  *
  *  - `asofJoin` is ONE shuffle (hash-partition by key) + ONE
  *    partition-local sort + a running `last(ignoreNulls)` window —
  *    the union-tag-scan technique. No per-left-row range probe, no
  *    broadcast, no O(n·m) bucket product; cost is O((|L|+|R|) log)
  *    for the sort and O(1) per row after, at any scale.
  *  - `rangeJoin` buckets both sides into fixed windows at least as
  *    wide as the join span, so a right row lands in exactly one
  *    bucket and a left row expands to at most TWO — the equi-join on
  *    (keys, bucket) then bounds every comparison group, never
  *    degrading to the BroadcastNestedLoopJoin Spark would pick for a
  *    raw inequality condition.
  */
object Temporal {

  /** Micros-since-epoch ordering key for a timestamp or numeric column. */
  private def orderKey(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case TimestampType => unix_micros(col(c))
      case _             => col(c).cast("long")
    }

  /** As-of join: for every left row, the single right row with the
    * same `on` keys and the greatest `rightTs` ≤ `leftTs` (direction
    * "backward"; with "forward", the least `rightTs` ≥ `leftTs`).
    * Left rows keep their columns; the matched right row's columns
    * are appended under `rightPrefix` (all null when no match).
    *
    * Semantics (tradingview "trades ← quotes"):
    *  - `strict = true` excludes right rows at exactly `leftTs`
    *    (DuckDB `ASOF ... ON l.ts > r.ts`); default is inclusive ≥.
    *  - `toleranceUs` bounds the match gap in microseconds: a match
    *    farther than the tolerance resolves to null, as in pandas
    *    `merge_asof(tolerance=...)`.
    *  - Ties among right rows at the identical timestamp resolve
    *    deterministically (max xxhash64 of the right row) — stable
    *    under task retry and any input partitioning.
    *  - Join keys must carry the same names on both sides; right rows
    *    with a null timestamp OR null key never match; left rows with
    *    a null timestamp or null key pass through unmatched — the same
    *    null-key semantics as the equi-join in `rangeJoin` (a window
    *    partition would otherwise silently group null keys together).
    *
    * Plan shape: one Exchange on `on`, one sort per partition, one
    * running window — the same cost as a groupBy over the union of
    * the two inputs. Skewed keys concentrate a partition exactly as a
    * window function would; there is no remedy that preserves the
    * running order, so pre-split pathological keys upstream.
    */
  def asofJoin(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTs: String, rightTs: String,
      direction: String = "backward",
      strict: Boolean = false,
      toleranceUs: Option[Long] = None,
      rightPrefix: String = "r_"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    toleranceUs.foreach(t => require(t >= 0, "toleranceUs must be >= 0"))

    val lType = StructType(left.schema.fields)
    val rType = StructType(right.schema.fields)
    val lPay = struct(left.columns.map(col).toIndexedSeq: _*)
    val rPay = struct(right.columns.map(col).toIndexedSeq: _*)

    // Sort position of a right row vs a left row at the SAME ts picks
    // the semantics: right-first => the running frame at the left row
    // already contains it (inclusive ≥); left-first => it doesn't (strict).
    val (leftOrd, rightOrd) = if (strict) (0, 1) else (1, 0)

    // keyless (global) as-of: no key can be null
    val keyNull =
      if (on.isEmpty) lit(false) else on.map(col(_).isNull).reduce(_ || _)
    // a right column that prefixes into an existing left name would
    // emit two identically-named output columns — unusable downstream
    // (pandas merge_asof raises on suffix overlap likewise)
    val collisions = right.columns.map(rightPrefix + _).toSet
      .intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"asofJoin: prefixed right columns collide with left columns: " +
        s"${collisions.mkString(", ")} (choose a different rightPrefix)")
    val lSide = left.where(col(leftTs).isNotNull && !keyNull).select(
      (on.map(col) ++ Seq(
        orderKey(left, leftTs).as("_at_ts"),
        lit(leftOrd).as("_at_side"),
        lit(0L).as("_at_tie"),
        lit(true).as("_at_isleft"),
        lPay.as("_at_l"),
        lit(null).cast(rType).as("_at_r"))).toIndexedSeq: _*)
    val rSide = right.where(col(rightTs).isNotNull && !keyNull).select(
      (on.map(col) ++ Seq(
        orderKey(right, rightTs).as("_at_ts"),
        lit(rightOrd).as("_at_side"),
        xxhash64(rPay).as("_at_tie"),
        lit(false).as("_at_isleft"),
        lit(null).cast(lType).as("_at_l"),
        rPay.as("_at_r"))).toIndexedSeq: _*)

    val ordering =
      if (direction == "backward")
        Seq(col("_at_ts").asc, col("_at_side").asc, col("_at_tie").asc)
      else
        Seq(col("_at_ts").desc, col("_at_side").asc, col("_at_tie").asc)
    val w = Window.partitionBy(on.map(col).toIndexedSeq: _*)
      .orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matchedCol = last(col("_at_r"), ignoreNulls = true).over(w)
    val withMatch = lSide.unionByName(rSide)
      .withColumn("_at_m", matchedCol)
      .where(col("_at_isleft"))
    val gated = toleranceUs match {
      case None => withMatch
      case Some(tol) =>
        val mTs = right.schema(rightTs).dataType match {
          case TimestampType => unix_micros(col("_at_m").getField(rightTs))
          case _             => col("_at_m").getField(rightTs).cast("long")
        }
        withMatch.withColumn("_at_m",
          when(abs(col("_at_ts") - mTs) <= tol, col("_at_m")))
    }
    val matched = gated.select(
      (left.columns.map(c => col("_at_l").getField(c).as(c)) ++
        right.columns.map(c => col("_at_m").getField(c).as(rightPrefix + c)))
        .toIndexedSeq: _*)

    // Null-ts and null-key left rows bypass the window (a desc sort
    // would otherwise place null ts AFTER every right row and
    // mis-match them; null keys must not form a joinable group).
    val nullPass = left.where(col(leftTs).isNull || keyNull).select(
      (left.columns.map(col) ++
        right.columns.map(c =>
          lit(null).cast(right.schema(c).dataType).as(rightPrefix + c)))
        .toIndexedSeq: _*)
    matched.unionByName(nullPass)
  }

  /** Bounded range join: inner-join every left row to the right rows
    * sharing its `on` keys with `rightTs ∈ [leftTs + lowerUs,
    * leftTs + upperUs]` (offsets in microseconds, either sign; e.g.
    * (-3600e6, 3600e6) = "within one hour either way"). Right columns
    * are appended under `rightPrefix`.
    *
    * Scale path: both sides are assigned to fixed time buckets of
    * width = the window span, so the right side is NOT replicated and
    * the left side is replicated at most twice; the join is a plain
    * shuffle equi-join on (keys, bucket) with the exact range check as
    * a post-filter. A raw `l.ts BETWEEN ...` join condition would give
    * Catalyst nothing to hash on and degenerate to a nested-loop —
    * this never does. Hot (key, bucket) pairs are subject to AQE skew
    * splitting like any other shuffle join.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTs: String, rightTs: String,
      lowerUs: Long, upperUs: Long,
      rightPrefix: String = "r_"): DataFrame = {
    require(upperUs >= lowerUs, s"empty range [$lowerUs, $upperUs]")
    val width = math.max(upperUs - lowerUs, 1L)

    val l = left
      .withColumn("_rj_ts", orderKey(left, leftTs))
      .withColumn("_rj_bucket", explode(sequence(
        floor((col("_rj_ts") + lowerUs) / width).cast("long"),
        floor((col("_rj_ts") + upperUs) / width).cast("long"))))
    val r = right.select(
      (Seq(struct(right.columns.map(col).toIndexedSeq: _*).as("_rj_r"),
        orderKey(right, rightTs).as("_rj_rts")) ++ on.map(col))
        .toIndexedSeq: _*)
      .withColumn("_rj_bucket", floor(col("_rj_rts") / width).cast("long"))

    val cond = (on :+ "_rj_bucket")
      .map(k => l(k) === r(k))
      .reduce(_ && _) &&
      r("_rj_rts") >= l("_rj_ts") + lowerUs &&
      r("_rj_rts") <= l("_rj_ts") + upperUs
    l.join(r, cond)
      .select((left.columns.map(c => l(c)) ++
        right.columns.map(c => col("_rj_r").getField(c).as(rightPrefix + c)))
        .toIndexedSeq: _*)
  }

  /** Time-series resample + gap fill: aggregate per (`on`, fixed
    * `stepUs`-wide time bucket), densify every key's observed bucket
    * range, and forward-fill the aggregated columns across the
    * generated gaps (pandas `resample(...).agg(...).ffill()`
    * semantics: a fill carries the last NON-NULL value; buckets before
    * a key's first observation do not exist, so nothing leads with
    * nulls).
    *
    * Output: `on` ++ (`bucket_us` long — bucket start in micros since
    * epoch, `is_gap` boolean, one column per named agg).
    *
    * Scale shape: the dense grid is generated per key from its own
    * (min, max) bucket span — `explode(sequence(lo, hi))` — so grid
    * size is Σ span/step per key, never global-range × keys; every
    * stage (bucket agg, span agg, grid⋈observed join, forward-fill
    * window) partitions on the SAME key columns, no broadcast, no
    * driver state. A pathological key whose span/step is huge inflates
    * only its own partition — cap the span upstream if steps are tiny.
    */
  /** Interval OVERLAP join: inner-join left intervals
    * [`leftStart`, `leftEnd`] to right intervals
    * [`rightStart`, `rightEnd`] (micros, inclusive) sharing the `on`
    * keys, wherever the intervals intersect. The interval×interval
    * sibling of [[rangeJoin]]'s point-in-window.
    *
    * Scale path: both sides explode onto a fixed `bucketUs`-wide time
    * grid (replication = ceil(span/bucketUs) + 1 cells per interval —
    * pick bucketUs near the typical span), the join is a plain
    * shuffle equi-join on (keys, bucket), and each overlapping pair
    * is emitted EXACTLY ONCE without any distinct: only the canonical
    * cell — the bucket containing max(leftStart, rightStart), the
    * overlap's first instant, which both sides necessarily generated
    * — survives the post-filter. A raw `ls <= re AND rs <= le` theta
    * join would give Catalyst nothing to hash on and degenerate to a
    * nested loop; this never does. Appends `overlap_us` =
    * min(le, re) − max(ls, rs) (≥ 0, exact integer).
    */
  def intervalJoin(left: DataFrame, right: DataFrame, on: Seq[String],
      leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String,
      bucketUs: Long, rightPrefix: String = "r_"): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive: $bucketUs")
    val l = left
      .withColumn("_ij_bucket", explode(sequence(
        floor(col(leftStart) / bucketUs).cast("long"),
        floor(col(leftEnd) / bucketUs).cast("long"))))
    val r = right.select(
      (Seq(struct(right.columns.map(col).toIndexedSeq: _*).as("_ij_r"),
        col(rightStart).as("_ij_rs"), col(rightEnd).as("_ij_re")) ++
        on.map(col)).toIndexedSeq: _*)
      .withColumn("_ij_bucket", explode(sequence(
        floor(col("_ij_rs") / bucketUs).cast("long"),
        floor(col("_ij_re") / bucketUs).cast("long"))))
    val cond = (on :+ "_ij_bucket")
      .map(k => l(k) === r(k))
      .reduce(_ && _) &&
      l(leftStart) <= r("_ij_re") && r("_ij_rs") <= l(leftEnd) &&
      // canonical cell only: the bucket holding the overlap's first
      // instant — dedups multi-cell pairs with zero extra shuffles
      l("_ij_bucket") ===
        floor(greatest(l(leftStart), r("_ij_rs")) / bucketUs).cast("long")
    l.join(r, cond)
      .select((left.columns.map(c => l(c)) ++
        right.columns.map(c => col("_ij_r").getField(c).as(rightPrefix + c)) :+
        (least(l(leftEnd), col("_ij_re")) -
          greatest(l(leftStart), col("_ij_rs"))).as("overlap_us"))
        .toIndexedSeq: _*)
  }

  /** Time-decayed per-key aggregate — the feature-store
    * materialization "recent activity counts more": every event's
    * integer `valueCol` is weighted by a power-of-two half-life decay
    * `weight_x1e6 = 1e6 >> min(age div halfLifeDays, capShift)` (age
    * in whole days before the corpus' newest event, integer epoch
    * arithmetic), and `decayed_x1e6` = Σ value·weight per key. The
    * power-of-two ladder makes the decay EXACT integer arithmetic —
    * no exp/pow float whose libm rounding could split engines — while
    * keeping the half-life semantics (one halfLife ⇒ weight halves);
    * `capShift` floors the weight at `1e6 div 2^cap` (older events
    * still count, just minimally — the default 19 keeps the floor at
    * weight 1; a capShift ≥ 20 makes the floor 0, i.e. events older
    * than cap half-lives contribute exactly nothing).
    *
    * Scale shape: a 1-row max-ts aggregate crossed in (never
    * collected), then ONE map-side-combined aggregation — weights are
    * a per-row column program. Products widen to DECIMAL(38,0).
    * Null ts/value rows are excluded (documented).
    */
  def decayedSum(df: DataFrame, keyCols: Seq[String], tsCol: String,
      valueCol: String, halfLifeDays: Int, capShift: Int = 19): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    require(halfLifeDays >= 1, s"halfLifeDays must be >= 1, got $halfLifeDays")
    require(capShift >= 0 && capShift <= 62, s"capShift in [0,62], got $capShift")
    val ref = df.agg(max(unix_timestamp(col(tsCol))).as("_ref"))
    df
      .filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .crossJoin(broadcast(ref))
      .withColumn("_age_days",
        expr(s"(_ref - unix_timestamp($tsCol)) div 86400"))
      .withColumn("_w", expr(
        s"1000000 div shiftleft(CAST(1 AS BIGINT)," +
          s" CAST(least(_age_days div $halfLifeDays, $capShift) AS INT))"))
      .groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_events"),
        min("_age_days").as("last_age_days"),
        sum(expr(s"CAST($valueCol AS DECIMAL(38,0)) * _w"))
          .cast("long").as("decayed_x1e6"))
  }

  def resample(df: DataFrame, on: Seq[String], ts: String, stepUs: Long,
      aggs: Seq[(String, Column)]): DataFrame = {
    require(stepUs > 0, s"stepUs must be positive, got $stepUs")
    require(aggs.nonEmpty, "at least one aggregation required")
    val keyed = df.where(col(ts).isNotNull)
      .withColumn("_rs_b", floor(orderKey(df, ts) / stepUs).cast("long"))
    val bucketed = keyed
      .groupBy((on :+ "_rs_b").map(col).toIndexedSeq: _*)
      .agg(aggs.head._2.as(aggs.head._1),
        aggs.tail.map { case (n, c) => c.as(n) }.toIndexedSeq: _*)
      .withColumn("_rs_obs", lit(true))
    val grid = bucketed
      .groupBy(on.map(col).toIndexedSeq: _*)
      .agg(min("_rs_b").as("_rs_lo"), max("_rs_b").as("_rs_hi"))
      .withColumn("_rs_b", explode(sequence(col("_rs_lo"), col("_rs_hi"))))
      .drop("_rs_lo", "_rs_hi")
    val w = Window.partitionBy(on.map(col).toIndexedSeq: _*)
      .orderBy(col("_rs_b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // NULL-SAFE key equality: groupBy put null-key rows in a real
    // group, so the grid⋈observed join must match them too — plain
    // equi-join would return every null-key bucket as an is_gap row
    // and silently discard that group's observed aggregates
    val g = grid.as("_rs_g")
    val b = bucketed.as("_rs_o")
    val joinCond = (on :+ "_rs_b")
      .map(c => col(s"_rs_g.$c") <=> col(s"_rs_o.$c")).reduce(_ && _)
    val filled = g.join(b, joinCond, "left")
      .select((
        (on :+ "_rs_b").map(c => col(s"_rs_g.$c").as(c)) ++
        aggs.map { case (n, _) => col(s"_rs_o.$n").as(n) } :+
        col("_rs_o._rs_obs").as("_rs_obs")).toIndexedSeq: _*)
      .withColumn("is_gap", col("_rs_obs").isNull)
    aggs.foldLeft(filled) { case (acc, (n, _)) =>
        acc.withColumn(n, last(col(n), ignoreNulls = true).over(w))
      }
      .select((on.map(col) ++ Seq(
        (col("_rs_b") * stepUs).as("bucket_us"), col("is_gap")) ++
        aggs.map { case (n, _) => col(n) }).toIndexedSeq: _*)
  }
}
