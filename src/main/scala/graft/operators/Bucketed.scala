package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for co-located joins — the storage-level
  * answer to the shuffle a repeated big⋈big join pays. Writing both
  * relations `bucketBy(n, key).sortBy(key)` pins rows to
  * hash(key) mod n buckets AT WRITE TIME; every later equi-join or
  * aggregation on `key` between same-`n` tables reads bucket i
  * against bucket i with NO exchange — at 100 TB the join cost
  * becomes the two scans, paid once per WRITE instead of once per
  * QUERY. This is the batch analogue of the IVF index's
  * partition-pruned probes: layout doing the work the shuffle would.
  *
  * Bucketing only applies to catalog tables (the bucket spec lives in
  * the table metadata, not the parquet files), so these helpers write
  * EXTERNAL tables: data at `path`, metadata in the session catalog.
  */
object Bucketed {

  /** Write `df` as external parquet table `table` at `path`, bucketed
    * AND sorted by `key` into `buckets` buckets. One file per (task,
    * bucket); pre-repartition on `key` upstream if single-file buckets
    * matter (they do for sort-elision on large merges).
    */
  def writeBucketed(df: DataFrame, path: String, table: String,
      key: String, buckets: Int): Unit = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .option("path", path)
      .saveAsTable(table)
  }

  /** Equi-join two same-bucket-count tables on their bucket key. With
    * matching specs Catalyst plans scan→join with zero Exchange on
    * either side (asserted in BucketedSpec); the join itself is
    * sort-merge over the per-bucket sorted runs.
    */
  def coLocatedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
