package graft.queries

import graft.pipeline.RdrPipeline

/** Gate queries for the domain dataflow itself: the synthetic-firehose
  * ingest → merge (→ store → groom) pipeline derived from `events`.
  * The merge summary is exactly predictable by SQL over `events`
  * (see RdrPipeline derivation); the store summary is checked
  * rows-only (file layout is not SQL-expressible).
  */
object PipelineOps {

  val queries: Seq[GateQuery] = Seq(
    GateQuery(
      "q_rdr_merge",
      (s, d) => RdrPipeline.mergeSummary(s, d),
      Some("""SELECT count(*) AS n_decisions,
             |       CAST(sum(CASE WHEN event_type = 'purchase' AND round(value, 2) > 0
             |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_rewarded,
             |       CAST(round(sum(CASE WHEN event_type = 'purchase'
             |                      THEN round(value, 2) ELSE 0 END) * 100) AS BIGINT) AS total_reward_cents
             |FROM events""".stripMargin)),

    // __GRAFT_GATES__ is substituted by Verify at oracle-dump time with
    // the stable per-sfDir artifact dir the gate wrote (GateArtifacts):
    // DuckDB recomputes the census straight from the parquet files the
    // store gate produced, so the write path is verified end to end.
    GateQuery(
      "q_rdr_store",
      (s, d) => RdrPipeline.storeSummary(s, d),
      Some("""SELECT count(*) AS n_rows,
             |       CAST(round(sum(reward) * 100) AS BIGINT) AS total_reward_cents,
             |       count(DISTINCT filename) AS n_files,
             |       min(decision_id) AS min_id,
             |       max(decision_id) AS max_id
             |FROM read_parquet('__GRAFT_GATES__/store/rewarded_decisions/events/parquet/**/*.parquet', filename = true)""".stripMargin)),

    GateQuery(
      "q_rdr_train",
      (s, d) => RdrPipeline.trainSummary(s, d),
      Some("""SELECT
             |  (SELECT count(*) FROM read_parquet('__GRAFT_GATES__/train/phase1/*.parquet')) AS n_rows_p1,
             |  (SELECT count(*) FROM read_parquet('__GRAFT_GATES__/train/phase2/*.parquet')) AS n_rows_p2,
             |  (SELECT count(*) FROM events) AS n_events,
             |  (SELECT count(*) FROM read_parquet('__GRAFT_GATES__/train/features_p1/*.parquet')) AS n_features_p1,
             |  (SELECT count(*) FROM read_parquet('__GRAFT_GATES__/train/features_p2/*.parquet')) AS n_features_p2,
             |  (SELECT CAST(round(sum("count") * 100) AS BIGINT) FROM read_parquet('__GRAFT_GATES__/train/phase1/*.parquet')) AS total_count_p1_x100,
             |  (SELECT CAST(round(avg(reward) * 10000) AS BIGINT) FROM read_parquet('__GRAFT_GATES__/train/phase2/*.parquet')) AS reward_mean_x1e4,
             |  (SELECT CAST(round(coalesce(stddev_samp(reward), 0) * 10000) AS BIGINT) FROM read_parquet('__GRAFT_GATES__/train/phase2/*.parquet')) AS reward_std_x1e4""".stripMargin)),
  )
}
