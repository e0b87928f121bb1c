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
             |       round(sum(CASE WHEN event_type = 'purchase'
             |                      THEN round(value, 2) ELSE 0 END), 2) AS total_reward
             |FROM events""".stripMargin)),

    GateQuery(
      "q_rdr_store",
      (s, d) => RdrPipeline.storeSummary(s, d),
      None),

    GateQuery(
      "q_rdr_train",
      (s, d) => RdrPipeline.trainSummary(s, d),
      None),
  )
}
