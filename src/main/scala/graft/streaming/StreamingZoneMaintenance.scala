package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.ZoneMap

/** The sidecar ARRIVAL LOOP as a streaming sink: each micro-batch
  * lands in the table and the zone/bloom/HLL sidecar refreshes
  * INCREMENTALLY in the same `foreachBatch` — O(new files) maintenance
  * per batch, so the pruning and census layers never go stale while
  * data streams in (the loop a 100 TB ingest pipeline runs
  * continuously; batch callers run the same refreshes per job).
  *
  * Exactly-once layout: every batch writes `mode(overwrite)` into its
  * OWN deterministic `batch=<id>` directory, so a crash-replayed batch
  * overwrites itself instead of appending duplicates (plain
  * `append` in foreachBatch is at-least-once; Spark's built-in file
  * sink gets exactly-once from its commit log — this gets it from
  * path determinism). The table reads as a Hive-partitioned layout on
  * the synthetic `batch` column; the recursive harvest and the
  * partition-aware pruning rule both handle that shape natively. The
  * refresh after a replay re-harvests the overwritten files (their
  * mtimes changed — stale entries are dropped by the freshness check
  * either way, so even a crash BETWEEN write and refresh only
  * degrades pruning until the next batch, never correctness.)
  */
object StreamingZoneMaintenance {

  def start(spark: SparkSession, source: DataFrame, tableDir: String,
      checkpoint: String, zoneCols: Seq[String],
      bloomCols: Seq[String] = Nil, hllCols: Seq[String] = Nil,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          batch.write.mode("overwrite").parquet(s"$tableDir/batch=$batchId")
          ZoneMap.refreshSidecar(spark, tableDir, zoneCols)
          if (bloomCols.nonEmpty)
            ZoneMap.refreshBlooms(spark, tableDir, bloomCols)
          if (hllCols.nonEmpty)
            ZoneMap.refreshHlls(spark, tableDir, hllCols)
        }
        () // foreachBatch wants Unit, not the refresh counts
      }
      .start()
}
