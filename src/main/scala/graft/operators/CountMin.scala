package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count–Min sketch as a TABLE — the mergeable frequency sketch
  * (Cormode & Muthukrishnan 2005) in the repo's sketch-as-table form
  * (the [[SketchRollup]] pattern): the sketch is a tiny
  * `(seed, bucket, cnt)` relation of at most depth×width rows, built
  * in ONE map-side-combined aggregation over the corpus, mergeable
  * across ingest units by a plain `(seed, bucket)` sum, and queried
  * by joining a probe list against it — never rescanning raw history.
  * Complements the exact Misra–Gries pass ([[Frequency]]): MG answers
  * "which items are heavy" exactly with a second scan; CMS answers
  * "how frequent is THIS item" for any item from kilobytes of state,
  * with a one-sided error (never an undercount, overcount ≤ 2n/width
  * with probability 1 − (1/2)^depth for the standard parameters).
  *
  * The reference's trainer computes per-feature frequency stats by
  * exact groupBy per run (src/trainer/code/train.py); at 100 TB the
  * point-lookup use case (how often did THIS feature value appear
  * last quarter?) needs the rollup-table shape instead.
  *
  * Hashing: each row of the depth axis is an independent hash of
  * `"cms<seed>:" + item` through the house md5-prefix bucket
  * ([[Curation.hashBucket]]) — deterministic, engine-portable (the
  * oracle twin is `SharedOracles.bucketSql`), layout/retry-stable.
  * All counts are longs; widths are required to divide the bucket
  * space far from 2^28 so `pmod` is unbiased enough for the CMS
  * guarantee (the md5 prefix is 28 bits).
  */
object CountMin {

  /** The seed-s bucket of an item — ONE definition for build and
    * probe (a fork would silently zero every estimate).
    */
  def bucket(item: Column, seed: Int, width: Int): Column =
    pmod(Curation.hashBucket(
      concat(lit(s"cms$seed:"), item.cast("string"))), lit(width.toLong))

  private def checkParams(depth: Int, width: Int): Unit = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    require(width >= 2 && width <= (1 << 24),
      s"width must be in [2, 2^24], got $width")
    // the bucket space is the 28-bit md5 prefix; a non-power-of-two
    // width makes pmod biased toward low buckets and quietly weakens
    // the stated one-sided CMS error bound
    require((width & (width - 1)) == 0,
      s"width must be a power of two (divides the 2^28 bucket space), got $width")
  }

  /** Build the sketch relation over `itemCol` (null items are not
    * counted). With `weightCol` each row adds that weight instead of
    * 1 — so building over a pre-aggregated `(item, n)` relation is
    * equivalent to (and much cheaper than) building over the raw
    * occurrences.
    *
    * Scale shape: the depth axis explodes each row into `depth`
    * (seed, bucket) pairs BEFORE the aggregation, but partial
    * aggregation compresses map-side, so the shuffle carries at most
    * depth×width rows regardless of corpus size. No driver state.
    */
  def build(df: DataFrame, itemCol: String, depth: Int = 4,
      width: Int = 1024, weightCol: Option[String] = None): DataFrame = {
    checkParams(depth, width)
    val w = weightCol.map(col(_).cast("long")).getOrElse(lit(1L))
    df.filter(col(itemCol).isNotNull)
      .select(posexplode(array((0 until depth).map(s =>
        bucket(col(itemCol), s, width)): _*)).as(Seq("seed", "bucket")),
        w.as("_w"))
      .groupBy("seed", "bucket")
      .agg(sum("_w").as("cnt"))
  }

  /** Merge sketch tables built with the SAME (depth, width): the CMS
    * cell-wise sum. Register-exact: merging per-unit sketches equals
    * one sketch over the concatenated input (CountMinSpec pins it).
    */
  def merge(sketches: DataFrame*): DataFrame = {
    require(sketches.nonEmpty, "nothing to merge")
    sketches.reduce(_ unionByName _)
      .groupBy("seed", "bucket")
      .agg(sum("cnt").as("cnt"))
  }

  /** Point-frequency estimates for `items` (any relation with
    * `itemCol`; duplicates are de-duplicated): est(x) =
    * min over seeds of cell(seed, bucket_s(x)) — ≥ the true count
    * always, with the standard CMS overcount bound. Probes that hit
    * an empty cell estimate 0 (correct for never-seen items).
    *
    * Scale shape: |items|×depth probe rows LEFT-join the ≤depth×width
    * sketch relation on (seed, bucket) — the sketch side broadcasts —
    * then one |items|-keyed min-agg. The corpus is never touched.
    */
  def estimate(sketch: DataFrame, items: DataFrame, itemCol: String,
      depth: Int = 4, width: Int = 1024): DataFrame = {
    checkParams(depth, width)
    val probes = items
      .filter(col(itemCol).isNotNull)
      .select(col(itemCol).as("item")).distinct()
      .select(col("item"), posexplode(array((0 until depth).map(s =>
        bucket(col("item"), s, width)): _*)).as(Seq("seed", "bucket")))
    // only force the broadcast when the sketch is provably small:
    // depth*width bounds its row count, and 2^22 cells (~100 MB of
    // (int,long,long) rows) is the forced-broadcast ceiling — a
    // depth=16/width=2^24 sketch (268M rows) must shuffle-join instead
    // of being rammed through a broadcast.
    val sketchSide =
      if (depth.toLong * width <= (1L << 22)) broadcast(sketch) else sketch
    probes
      .join(sketchSide, Seq("seed", "bucket"), "left")
      .groupBy("item")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_n"))
  }
}
