package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generic ANALYZE: per-column statistics and exact equi-depth
  * boundaries for ANY parquet table — the reusable form of the
  * q_table_stats / q_equidepth_hist gates (those pin the engine
  * against the oracle on fixed columns; this is the user-facing
  * operator behind `graft.jobs.AnalyzeJob`).
  */
object Analyze {

  /** One row per column: rows, nulls, exact NDV, min/max rendered as
    * strings (values of any orderable type; computed on the native
    * type, cast only for display). ONE scan — Spark plans the
    * count-distincts as a single Expand with partial aggregation; at
    * 100 TB swap countDistinct for approx_count_distinct (same plan
    * shape, same output schema).
    */
  def columnStats(df: DataFrame): DataFrame = {
    val cols = df.columns.toSeq
    require(cols.nonEmpty, "empty schema")
    // a generic ANALYZE entry point sees arbitrary column names —
    // reference them backtick-quoted (graft.core.SqlIdent) and carry
    // the name itself as a typed literal, never spliced into SQL text
    def qc(c: String) = col(graft.core.SqlIdent.quote(c))
    val wide = df.agg(
      count(lit(1)).as("n_rows"),
      cols.zipWithIndex.flatMap { case (c, i) => Seq(
        sum(qc(c).isNull.cast("long")).as(s"_nn_$i"),
        countDistinct(qc(c)).as(s"_nd_$i"),
        min(qc(c)).cast("string").as(s"_mn_$i"),
        max(qc(c)).cast("string").as(s"_mx_$i"))
      }: _*)
    val rows = cols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("col_name"), col(s"_nn_$i").as("n_nulls"),
        col(s"_nd_$i").as("ndv"), col(s"_mn_$i").as("min_str"),
        col(s"_mx_$i").as("max_str"))
    }
    wide.select(col("n_rows"), explode(array(rows: _*)).as("_s"))
      .select(col("_s.col_name").as("col_name"), col("n_rows"),
        col("_s.n_nulls").as("n_nulls"), col("_s.ndv").as("ndv"),
        col("_s.min_str").as("min_str"), col("_s.max_str").as("max_str"))
      .orderBy("col_name")
  }

  /** Exact equi-depth boundaries of one orderable column: boundary j
    * = the ceil(j·n/buckets)-th smallest non-null value, selected via
    * the histogram prefix-count architecture (RankStats) — never a
    * global sort of the corpus. Output: (bucket, n_rows, target,
    * boundary as string).
    */
  def equiDepth(df: DataFrame, valueCol: String, buckets: Int = 10): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1: $buckets")
    val cum = RankStats.cumHistogram(
      df.filter(col(valueCol).isNotNull).select(valueCol),
      valueCol, lit(1L), Nil)
    val targets = df.sparkSession.range(1, buckets + 1)
      .select(col("id").cast("long").as("bucket"))
    cum.crossJoin(broadcast(targets))
      .withColumn("target", expr(s"(bucket * total + ${buckets - 1}) div $buckets"))
      .filter(col("cum_excl") < col("target") &&
        col("cum_excl") + col("mass") >= col("target"))
      .select(col("bucket"), col("total").as("n_rows"), col("target"),
        col(valueCol).cast("string").as("boundary"))
      .orderBy("bucket")
  }
}
