package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture application: apply a changelog of keyed
  * upserts/deletes to a base snapshot — the MERGE INTO / CDC-apply
  * step every incrementally-maintained lake table needs (the reference
  * maintains its rewarded-decision partitions with exactly this
  * last-write-wins discipline, merge.py's "latest wins" rule; this is
  * the generic operator).
  *
  * Semantics (deterministic given a total per-key order):
  *   - per key, only the LAST change by `ordCols` (lexicographic,
  *     ascending, ties broken by the full ordCols tuple — callers must
  *     make it total, e.g. (ts, change_id)) is considered;
  *   - last op == delete → the key is absent from the result, even if
  *     the snapshot had it;
  *   - last op == upsert → the change's payload replaces (or inserts)
  *     the snapshot row;
  *   - keys with no change keep their snapshot row.
  *
  * Output: key columns ++ payload columns ++ `_src` ("base" |
  * "upsert") — the provenance column makes audits and incremental
  * re-application testable.
  *
  * Scale shape: ONE window over the changelog partitioned by key (the
  * per-key change history is bounded by delivery cadence, never by
  * corpus size) and ONE key-partitioned full-outer join against the
  * snapshot. No broadcast of corpus-sized sides, no driver state; both
  * shuffles are on the same key, so AQE can reuse the exchange. At
  * 100 TB the snapshot and changelog are both hash-partitioned on the
  * key — exactly the layout a bucketed lake table already has.
  */
object Cdc {

  /** @param snapshot base table: keyCols ++ payloadCols
    * @param changes  changelog: keyCols ++ ordCols ++ opCol ++ payloadCols
    * @param opCol    boolean-ish column in `changes`: true → delete,
    *                 false → upsert (pre-derive from a string op code)
    */
  def applyChangelog(snapshot: DataFrame, changes: DataFrame,
      keyCols: Seq[String], ordCols: Seq[String], opCol: String,
      payloadCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    require(ordCols.nonEmpty,
      "ordCols must define a TOTAL per-key order (e.g. ts + change id); " +
        "a partial order makes last-write-wins nondeterministic")
    require(payloadCols.nonEmpty, "at least one payload column")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(ordCols.map(c => col(c).desc): _*)
    val last = changes
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select((keyCols.map(col) :+ col(opCol).as("_del")) ++
        payloadCols.map(c => col(c).as(s"_chg_$c")): _*)
    snapshot
      .select((keyCols ++ payloadCols).map(col): _*)
      .join(last, keyCols, "full_outer")
      .filter(coalesce(col("_del"), lit(false)) === false)
      .select(keyCols.map(col) ++
        payloadCols.map(c =>
          when(col("_del").isNotNull, col(s"_chg_$c"))
            .otherwise(col(c)).as(c)) :+
        when(col("_del").isNotNull, lit("upsert")).otherwise(lit("base"))
          .as("_src"): _*)
  }
}
