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
             |  (SELECT CAST((2 * sum(CAST(round(reward * 100) AS HUGEINT)) * 100 + count(*))
             |               // (2 * count(*)) AS BIGINT)
             |   FROM read_parquet('__GRAFT_GATES__/train/phase2/*.parquet')) AS reward_mean_x1e4,
             |  (SELECT CASE WHEN count(*) < 2 THEN CAST(0 AS BIGINT) ELSE
             |            CAST(round(sqrt((CAST(count(*) AS DOUBLE)
             |                 * CAST(sum(CAST(round(reward * 100) AS HUGEINT)
             |                            * CAST(round(reward * 100) AS BIGINT)) AS DOUBLE)
             |                 - CAST(sum(CAST(round(reward * 100) AS HUGEINT)) AS DOUBLE)
             |                 * CAST(sum(CAST(round(reward * 100) AS HUGEINT)) AS DOUBLE))
             |                / (CAST(count(*) AS DOUBLE) * (count(*) - 1))) * 100) AS BIGINT) END
             |   FROM read_parquet('__GRAFT_GATES__/train/phase2/*.parquet')) AS reward_std_x1e4""".stripMargin)),

    // Curation-weighted training: soft-dedup weights + decayed recency
    // feature multiplied into the phase-2 training weight
    // (RdrPipeline.softTrainSummary). The gate dumps only the CLUSTER
    // ASSIGNMENT; the oracle re-derives multiplicities and weights
    // from the labels and recomputes the decayed recency straight from
    // `events` — two independent derivations of the same census. The
    // model fits themselves are loud in-gate requires.
    GateQuery(
      "q_train_soft",
      (s, d) => RdrPipeline.softTrainSummary(s, d),
      Some("""WITH w AS (
             |  SELECT * FROM read_parquet('__GRAFT_GATES__/soft/weights/*.parquet')
             |), sz AS (
             |  SELECT cluster, count(*) AS m FROM w GROUP BY 1
             |), ww AS (
             |  SELECT w.et, w.cluster, sz.m, 1000000 // sz.m AS wx
             |  FROM w JOIN sz USING (cluster)
             |), base AS (
             |  SELECT event_type, epoch_us(ts) // 1000000 AS sec,
             |         CAST(round(value * 100) AS BIGINT) AS cents
             |  FROM events
             |), r AS (SELECT max(sec) AS ref FROM base),
             |dk AS (
             |  SELECT event_type, (ref - sec) // 86400 AS age, cents
             |  FROM base, r WHERE sec IS NOT NULL AND cents IS NOT NULL
             |), dec AS (
             |  SELECT event_type,
             |         CAST(sum(CAST(cents AS HUGEINT)
             |                  * (1000000 // (CAST(1 AS BIGINT) << CAST(least(age // 7, 19) AS INT))))
             |              AS BIGINT) AS decayed_x1e6
             |  FROM dk GROUP BY 1
             |)
             |SELECT ww.et AS event_type,
             |       count(*) AS n_decisions,
             |       CAST(count(DISTINCT ww.cluster) AS BIGINT) AS n_clusters,
             |       CAST(sum(CASE WHEN ww.m >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_downweighted,
             |       CAST(sum(ww.wx) AS BIGINT) AS sum_weight_x1e6,
             |       coalesce(max(dec.decayed_x1e6), 0) AS decayed_x1e6
             |FROM ww LEFT JOIN dec ON ww.et = dec.event_type
             |GROUP BY ww.et
             |ORDER BY event_type""".stripMargin)),
  )
}
