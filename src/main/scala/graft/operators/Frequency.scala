package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._

import graft.functions.MisraGries

/** Exact heavy hitters over an unbounded-cardinality column via the
  * classic two-pass scheme: a Misra–Gries sketch pass to find
  * candidates with bounded state, then an exact re-count of ONLY the
  * candidates. The reference counts frequencies driver-side per batch
  * (pandas value_counts in src/trainer/code/train.py); at 100 TB the
  * vocabulary fits nowhere, so the sketch pass replaces the
  * full-vocabulary shuffle a plain groupBy would need.
  *
  * Why two passes: the MG candidate SET depends on partition/merge
  * order, but its guarantee does not — every item with true frequency
  * > n/(k+1) is in the sketch, with no false negatives. Re-counting
  * candidates exactly and filtering on the same n/(k+1) bound makes
  * the final answer EXACT and order/partitioning/retry-independent
  * (identical to `GROUP BY v HAVING count(*)·(k+1) > n`), which is
  * what lets the gate query hash-match a DuckDB oracle.
  *
  * Scale shape:
  *  - pass 1 is one scan; each partition shuffles ≤ k counters
  *    (map-side partial agg of the typed Aggregator) and the driver
  *    receives ≤ k candidates + one total — bounded by k, never by
  *    cardinality;
  *  - pass 2 is one scan with an `IN (candidates)` predicate that
  *    Catalyst converts to an InSet and pushes into the parquet scan,
  *    then a groupBy over ≤ k surviving keys — a trivial shuffle.
  */
object Frequency {

  /** Items of `valueCol` (cast to string) whose exact count `c`
    * satisfies `c·(k+1) > n` (n = non-null rows) and `c ≥ minSupport`.
    * Output: (`item` string, `cnt` long). Completeness holds only at
    * the n/(k+1) bound — a `minSupport` below it tightens nothing and
    * is rejected to keep the operator's contract honest.
    */
  def heavyHitters(df: DataFrame, valueCol: String, k: Int,
      minSupport: Option[Long] = None): DataFrame = {
    require(k > 0, s"sketch capacity must be positive, got $k")
    val vals = df.select(col(valueCol).cast("string").as("item"))
      .where(col("item").isNotNull)

    val mg = udaf(new MisraGries(k), Encoders.STRING)
    val first = vals.agg(mg(col("item")).as("hits"), count(lit(1)).as("n")).head()
    val n = first.getLong(1)
    val cands = first.getSeq[Row](0).map(_.getString(0))
    minSupport.foreach { s =>
      require(s * (k + 1L) > n,
        s"minSupport=$s is below the MG completeness bound n/(k+1)=" +
          s"${n / (k + 1L)} — raise k or minSupport")
    }

    vals
      .where(col("item").isin(cands: _*))
      .groupBy("item")
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * (k + 1L) > n &&
        col("cnt") >= minSupport.getOrElse(0L))
  }

  /** Per-group heavy hitters: for every `groupCols` combination, the
    * items whose within-group count `c` satisfies `c·(k+1) > n_g`
    * (n_g = the group's non-null rows). Output: `groupCols` ++
    * (`item` string, `cnt` long).
    *
    * Unlike the global variant there is NO driver round-trip: the
    * number of groups is unbounded at corpus scale (candidates would
    * be groups×k), so the candidate relation stays distributed — a
    * semi join keyed on (`groupCols`, item) restricts the exact
    * re-count, and the per-group totals join back for the threshold.
    * Every stage is a hash-partitioned agg/join on the same keys; the
    * sketch still bounds each GROUP's aggregation state at k counters
    * where a plain groupBy(group, item) would carry the full per-group
    * vocabulary through the shuffle.
    */
  def heavyHittersByGroup(df: DataFrame, groupCols: Seq[String],
      valueCol: String, k: Int, minSupport: Option[Long] = None): DataFrame = {
    require(k > 0, s"sketch capacity must be positive, got $k")
    require(groupCols.nonEmpty, "groupCols must be non-empty (use heavyHitters)")
    // "item"/"cnt" are the OUTPUT columns and the internal names below
    // join on them — a group column reusing one would make every later
    // reference ambiguous
    val reserved = Set("item", "cnt", "_hh_hits", "_hh_n")
    require(groupCols.forall(c => !reserved.contains(c)),
      s"group columns may not use reserved names ${reserved.mkString(", ")}")
    val gcols = groupCols.map(col)
    val vals = df.select((gcols :+ col(valueCol).cast("string").as("item"))
      .toIndexedSeq: _*).where(col("item").isNotNull)

    val mg = udaf(new MisraGries(k), Encoders.STRING)
    val sketched = vals.groupBy(gcols.toIndexedSeq: _*)
      .agg(mg(col("item")).as("_hh_hits"), count(lit(1)).as("_hh_n"))
    val cands = sketched.select(
      (gcols :+ explode(col("_hh_hits.item")).as("item")).toIndexedSeq: _*)

    // NULL-SAFE group-key joins: groupBy forms a real group for null
    // keys (and the exact groupBy this operator replaces reports it),
    // so the candidate semi-join and the totals join must match null
    // keys instead of silently dropping the whole group
    def nullSafeOn(leftAlias: String, rightAlias: String, cols: Seq[String]) =
      cols.map(c => col(s"$leftAlias.$c") <=> col(s"$rightAlias.$c")).reduce(_ && _)
    val exact = vals.as("_hh_v")
      .join(cands.as("_hh_c"),
        nullSafeOn("_hh_v", "_hh_c", groupCols :+ "item"), "left_semi")
      .groupBy((gcols :+ col("item")).toIndexedSeq: _*)
      .agg(count(lit(1)).as("cnt"))
    exact.as("_hh_e")
      .join(sketched.select((gcols :+ col("_hh_n")).toIndexedSeq: _*).as("_hh_s"),
        nullSafeOn("_hh_e", "_hh_s", groupCols))
      .select((groupCols.map(c => col(s"_hh_e.$c").as(c)) ++
        Seq(col("_hh_e.item").as("item"), col("_hh_e.cnt").as("cnt"),
          col("_hh_s._hh_n").as("_hh_n"))).toIndexedSeq: _*)
      .where(col("cnt") * (k + 1L) > col("_hh_n") &&
        col("cnt") >= minSupport.getOrElse(0L))
      .drop("_hh_n")
  }
}
