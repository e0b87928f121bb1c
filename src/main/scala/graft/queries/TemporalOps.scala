package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Temporal

/** Gate queries for the temporal joins (as-of join, bounded range
  * join) over the `events` table. Both are fully SQL-expressible —
  * DuckDB has a native `ASOF JOIN`, and the range join is a plain
  * inequality join — so both gates are exact-hash oracled.
  */
object TemporalOps {
  import Tables._

  val queries: Seq[GateQuery] = Seq(

    // As-of join: every purchase matched to the same user's most
    // recent view at-or-before it (backward, inclusive — the default).
    // The right side is pre-deduped to one row per (user_id, ts) so
    // the oracle never depends on tie order; the per-user census
    // (counts, total match gap, matched-id checksum) pins every
    // individual match — one flipped match changes its user's row.
    GateQuery(
      "q_asof_join",
      (s, d) => {
        val ev = events(s, d)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts")
        val views = ev.filter(col("event_type") === "view")
          .groupBy("user_id", "ts").agg(max("event_id").as("view_id"))
        Temporal.asofJoin(purchases, views, Seq("user_id"), "ts", "ts")
          .groupBy("user_id")
          .agg(
            count(lit(1)).as("n_purchases"),
            count(col("r_view_id")).as("n_matched"),
            sum(unix_micros(col("ts")) - unix_micros(col("r_ts")))
              .cast("long").as("sum_gap_us"),
            sum(col("r_view_id")).cast("long").as("sum_view_id"))
          .orderBy("user_id")
      },
      Some("""WITH p AS (
             |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
             |), v AS (
             |  SELECT user_id, ts, max(event_id) AS view_id
             |  FROM events WHERE event_type = 'view' GROUP BY 1, 2
             |)
             |SELECT p.user_id,
             |       count(*) AS n_purchases,
             |       count(v.view_id) AS n_matched,
             |       CAST(sum(epoch_us(p.ts) - epoch_us(v.ts)) AS BIGINT) AS sum_gap_us,
             |       CAST(sum(v.view_id) AS BIGINT) AS sum_view_id
             |FROM p ASOF LEFT JOIN v
             |  ON p.user_id = v.user_id AND p.ts >= v.ts
             |GROUP BY p.user_id
             |ORDER BY p.user_id""".stripMargin)),

    // Bounded range join: every purchase inner-joined to the same
    // user's clicks within ±2 hours, aggregated per purchase. The
    // matched-id checksum and value sum pin the exact match set.
    GateQuery(
      "q_range_join",
      (s, d) => {
        val ev = events(s, d)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"),
            col("ts"), col("value"))
        val twoHoursUs = 2L * 3600L * 1000000L
        Temporal.rangeJoin(purchases, clicks, Seq("user_id"), "ts", "ts",
          -twoHoursUs, twoHoursUs)
          .groupBy("event_id")
          .agg(
            count(lit(1)).as("n_nearby"),
            sum(col("r_click_id")).cast("long").as("sum_click_id"),
            // integer-units (×100 long), never round(x, d) doubles —
            // the cross-engine decimal-round flake class
            round(sum("r_value") * 100).cast("long").as("sum_value_x100"))
          .orderBy("event_id")
      },
      Some("""WITH p AS (
             |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
             |), c AS (
             |  SELECT event_id AS click_id, user_id, ts, value
             |  FROM events WHERE event_type = 'click'
             |)
             |SELECT p.event_id,
             |       count(*) AS n_nearby,
             |       CAST(sum(c.click_id) AS BIGINT) AS sum_click_id,
             |       CAST(round(sum(c.value) * 100) AS BIGINT) AS sum_value_x100
             |FROM p JOIN c
             |  ON p.user_id = c.user_id
             | AND c.ts >= p.ts - INTERVAL 2 HOUR
             | AND c.ts <= p.ts + INTERVAL 2 HOUR
             |GROUP BY p.event_id
             |ORDER BY p.event_id""".stripMargin)),

    // Resample + gap fill: per-user daily buckets over each user's own
    // observed span, gaps forward-filled with the last non-null bucket
    // value. The per-user census (bucket/gap counts + checksums over
    // ALL filled values and over gap rows alone) pins every generated
    // grid row and every carried fill — one wrong fill shifts its
    // user's sums.
    GateQuery(
      "q_resample",
      (s, d) => {
        val dayUs = 86400000000L
        Temporal.resample(events(s, d), Seq("user_id"), "ts", dayUs,
          Seq("v" -> round(sum(col("value")), 2)))
          .groupBy("user_id")
          .agg(
            count(lit(1)).as("n_buckets"),
            sum(col("is_gap").cast("long")).as("n_gaps"),
            // bucket values stay round(x, 2) quantized (data
            // derivation, mirrored in the oracle's b CTE); the final
            // comparison sums ship as ×100 integer units
            round(sum("v") * 100).cast("long").as("sum_filled_x100"),
            round(sum(when(col("is_gap"), col("v"))) * 100).cast("long")
              .as("sum_gap_fill_x100"))
          .orderBy("user_id")
      },
      Some("""WITH b AS (
             |  SELECT user_id,
             |         CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS bk,
             |         round(sum(value), 2) AS v
             |  FROM events GROUP BY 1, 2
             |), span AS (
             |  SELECT user_id, min(bk) AS lo, max(bk) AS hi FROM b GROUP BY 1
             |), grid AS (
             |  SELECT user_id, unnest(range(lo, hi + 1)) AS bk FROM span
             |), j AS (
             |  SELECT g.user_id, g.bk, b.v, b.user_id IS NULL AS is_gap
             |  FROM grid g LEFT JOIN b ON g.user_id = b.user_id AND g.bk = b.bk
             |), f AS (
             |  SELECT user_id, bk, is_gap,
             |         last_value(v IGNORE NULLS) OVER (
             |           PARTITION BY user_id ORDER BY bk
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
             |  FROM j
             |)
             |SELECT user_id, count(*) AS n_buckets,
             |       CAST(sum(CASE WHEN is_gap THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps,
             |       CAST(round(sum(v) * 100) AS BIGINT) AS sum_filled_x100,
             |       CAST(round(sum(CASE WHEN is_gap THEN v END) * 100) AS BIGINT) AS sum_gap_fill_x100
             |FROM f
             |GROUP BY user_id
             |ORDER BY user_id""".stripMargin)),

    // SCD2 / changelog compaction: collapse each user's event stream
    // into type-change validity intervals (valid_from = the change
    // event, valid_to = the next change, open interval = current) —
    // the slowly-changing-dimension build step of a warehouse load.
    // Census per type: segment count, open-segment count, mean closed
    // duration. Two windows, both partitioned on user_id — one
    // shuffle, no self-join.
    GateQuery(
      "q_scd2",
      (s, d) => {
        val ev = events(s, d).select("user_id", "ts", "event_id", "event_type")
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val changes = ev
          .withColumn("prev", lag("event_type", 1).over(w))
          .filter(col("prev").isNull || col("prev") =!= col("event_type"))
        val iv = changes.withColumn("valid_to",
          lead("ts", 1).over(Window.partitionBy("user_id").orderBy("ts", "event_id")))
        iv.groupBy("event_type")
          .agg(
            count(lit(1)).as("n_segments"),
            sum(col("valid_to").isNull.cast("long")).as("n_current"),
            // mean closed duration in EXACT integer arithmetic:
            // micros are integers, so the ×100-seconds mean is one
            // half-up integer division — the old round(avg(double), 2)
            // summed doubles in partial-agg order (flake class)
            expr("CASE WHEN count(CASE WHEN valid_to IS NOT NULL THEN 1 END) = 0" +
              " THEN CAST(NULL AS BIGINT)" +
              " ELSE CAST((2 * sum(CASE WHEN valid_to IS NOT NULL THEN" +
              " CAST(unix_micros(valid_to) - unix_micros(ts) AS DECIMAL(38,0)) END)" +
              " + count(CASE WHEN valid_to IS NOT NULL THEN 1 END) * 10000)" +
              " div (2 * count(CASE WHEN valid_to IS NOT NULL THEN 1 END) * 10000)" +
              " AS BIGINT) END").as("avg_dur_sec_x100"))
          .orderBy("event_type")
      },
      Some("""WITH seg AS (
             |  SELECT user_id, ts, event_id, event_type,
             |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
             |  FROM events
             |), ch AS (
             |  SELECT * FROM seg WHERE prev IS NULL OR prev <> event_type
             |), iv AS (
             |  SELECT user_id, ts, event_type,
             |         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
             |  FROM ch
             |)
             |SELECT event_type, count(*) AS n_segments,
             |       CAST(sum(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_current,
             |       CASE WHEN count(CASE WHEN valid_to IS NOT NULL THEN 1 END) = 0
             |            THEN CAST(NULL AS BIGINT)
             |            ELSE CAST((2 * sum(CASE WHEN valid_to IS NOT NULL THEN
             |                       CAST(epoch_us(valid_to) - epoch_us(ts) AS HUGEINT) END)
             |                       + count(CASE WHEN valid_to IS NOT NULL THEN 1 END) * 10000)
             |                      // (2 * count(CASE WHEN valid_to IS NOT NULL THEN 1 END) * 10000)
             |                      AS BIGINT) END AS avg_dur_sec_x100
             |FROM iv
             |GROUP BY event_type
             |ORDER BY event_type""".stripMargin)),

    // CDC / MERGE INTO application (Cdc.applyChangelog): the customer
    // snapshot updated by an orders-derived changelog — last change
    // per key by (o_orderdate, o_orderkey) wins; status-F finals
    // delete the key; untouched keys keep their base row. The FULL
    // result table is hashed (every key's survival, payload, and
    // provenance pinned), payloads in integer cents. One window over
    // the changelog + one key join — both on the same key.
    GateQuery(
      "q_cdc_apply",
      (s, d) => {
        val snapshot = customer(s, d).select(
          col("c_custkey"),
          round(col("c_acctbal") * 100).cast("long").as("bal_x100"),
          col("c_mktsegment").as("seg"))
        val changes = orders(s, d).select(
          col("o_custkey").as("c_custkey"),
          col("o_orderdate"), col("o_orderkey"),
          (col("o_orderstatus") === "F").as("del"),
          round(col("o_totalprice") * 100).cast("long").as("bal_x100"),
          col("o_orderpriority").as("seg"))
        graft.operators.Cdc.applyChangelog(snapshot, changes,
          keyCols = Seq("c_custkey"),
          ordCols = Seq("o_orderdate", "o_orderkey"),
          opCol = "del", payloadCols = Seq("bal_x100", "seg"))
          .orderBy("c_custkey")
      },
      Some("""WITH chg AS (
             |  SELECT o_custkey AS c_custkey,
             |         (o_orderstatus = 'F') AS del,
             |         CAST(round(o_totalprice * 100) AS BIGINT) AS bal_x100,
             |         o_orderpriority AS seg,
             |         row_number() OVER (PARTITION BY o_custkey
             |           ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
             |  FROM orders),
             |last AS (SELECT * FROM chg WHERE rn = 1),
             |base AS (
             |  SELECT c_custkey,
             |         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_x100,
             |         c_mktsegment AS seg
             |  FROM customer)
             |SELECT coalesce(b.c_custkey, l.c_custkey) AS c_custkey,
             |       CASE WHEN l.c_custkey IS NOT NULL THEN l.bal_x100 ELSE b.bal_x100 END AS bal_x100,
             |       CASE WHEN l.c_custkey IS NOT NULL THEN l.seg ELSE b.seg END AS seg,
             |       CASE WHEN l.c_custkey IS NOT NULL THEN 'upsert' ELSE 'base' END AS _src
             |FROM base b FULL OUTER JOIN last l ON b.c_custkey = l.c_custkey
             |WHERE coalesce(l.del, false) = false
             |ORDER BY c_custkey""".stripMargin)),

    // Ordered funnel: view → click → purchase, each step strictly
    // after the previous (min qualifying timestamp per step, computed
    // with conditional aggregation — ONE shuffle on user_id, no
    // self-joins). Census: users reaching each stage + median
    // view→purchase latency for full conversions.
    GateQuery(
      "q_funnel",
      (s, d) => {
        val ev = events(s, d)
        val perUser = ev.groupBy("user_id")
          .agg(
            min(when(col("event_type") === "view", col("ts"))).as("t_view"),
            collect_list(when(col("event_type") === "click",
              struct(col("ts")))).as("_clicks"),
            collect_list(when(col("event_type") === "purchase",
              struct(col("ts")))).as("_purchases"))
          .withColumn("t_click",
            array_min(expr("transform(filter(_clicks, c -> c.ts > t_view), c -> c.ts)")))
          .withColumn("t_purchase",
            array_min(expr("transform(filter(_purchases, p -> p.ts > t_click), p -> p.ts)")))
        perUser.agg(
          count(col("t_view")).as("n_viewed"),
          count(col("t_click")).as("n_clicked"),
          count(col("t_purchase")).as("n_converted"),
          round(expr(
            "percentile(CASE WHEN t_purchase IS NOT NULL THEN (unix_micros(t_purchase) - unix_micros(t_view)) / 1e6 END, 0.5)")
            * 100).cast("long").as("median_latency_sec_x100"))
      },
      Some("""WITH v AS (
             |  SELECT user_id, min(ts) AS t_view FROM events
             |  WHERE event_type = 'view' GROUP BY 1
             |), c AS (
             |  SELECT e.user_id, min(e.ts) AS t_click
             |  FROM events e JOIN v ON e.user_id = v.user_id
             |  WHERE e.event_type = 'click' AND e.ts > v.t_view
             |  GROUP BY 1
             |), p AS (
             |  SELECT e.user_id, min(e.ts) AS t_purchase
             |  FROM events e JOIN c ON e.user_id = c.user_id
             |  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
             |  GROUP BY 1
             |)
             |SELECT (SELECT count(*) FROM v) AS n_viewed,
             |       (SELECT count(*) FROM c) AS n_clicked,
             |       (SELECT count(*) FROM p) AS n_converted,
             |       CAST(round(quantile_cont((epoch_us(p.t_purchase) - epoch_us(v.t_view)) / 1e6, 0.5) * 100) AS BIGINT)
             |         AS median_latency_sec_x100
             |FROM p JOIN v ON p.user_id = v.user_id""".stripMargin)),

    // Retention cohorts: users grouped by first-activity week, matrix
    // of (cohort week, weeks-since) distinct-active counts — the
    // warehouse retention triangle. Two aggs, both on user/cohort keys.
    GateQuery(
      "q_retention",
      (s, d) => {
        val ev = events(s, d)
        val firstWeek = ev.groupBy("user_id")
          .agg(min(date_trunc("week", col("ts"))).as("cohort"))
        ev.join(firstWeek, Seq("user_id"))
          .withColumn("week_n",
            datediff(date_trunc("week", col("ts")), col("cohort")) / 7)
          .groupBy(date_format(col("cohort"), "yyyy-MM-dd").as("cohort"),
            col("week_n").cast("long").as("week_n"))
          .agg(countDistinct(col("user_id")).as("n_active"))
          .orderBy("cohort", "week_n")
      },
      Some("""WITH fw AS (
             |  SELECT user_id, min(date_trunc('week', ts)) AS cohort
             |  FROM events GROUP BY 1
             |)
             |SELECT strftime(fw.cohort, '%Y-%m-%d') AS cohort,
             |       CAST(date_diff('day', fw.cohort, date_trunc('week', e.ts)) // 7 AS BIGINT) AS week_n,
             |       count(DISTINCT e.user_id) AS n_active
             |FROM events e JOIN fw ON e.user_id = fw.user_id
             |GROUP BY 1, 2
             |ORDER BY cohort, week_n""".stripMargin)),

    // Time-decayed per-user engagement (feature-store shape): integer
    // cents weighted by a power-of-two half-life ladder
    // (1e6 >> (age_days div 7), capped) -- EXACT integer decay, no
    // exp/pow float whose libm rounding could split engines. The
    // reference epoch is the corpus' newest event (1-row agg crossed
    // in, computed BEFORE the null-value filter -- documented
    // operator semantic, mirrored in the oracle); epoch seconds via
    // integer epoch_us // 1e6 on the DuckDB side because a
    // double-epoch CAST rounds instead of flooring.
    GateQuery(
      "q_decayed_score",
      (s, d) =>
        Temporal.decayedSum(
          events(s, d).filter(col("user_id").isNotNull)
            .select(col("user_id"), col("ts"),
              round(col("value") * 100).cast("long").as("cents")),
          Seq("user_id"), "ts", "cents", halfLifeDays = 7)
          .orderBy("user_id"),
      Some("""WITH base AS (
             |  SELECT user_id, ts,
             |         CAST(round(value * 100) AS BIGINT) AS cents
             |  FROM events WHERE user_id IS NOT NULL),
             |r AS (SELECT max(epoch_us(ts) // 1000000) AS ref FROM base),
             |w AS (
             |  SELECT user_id,
             |         (ref - epoch_us(ts) // 1000000) // 86400 AS age,
             |         cents
             |  FROM base, r
             |  WHERE ts IS NOT NULL AND cents IS NOT NULL)
             |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |       CAST(min(age) AS BIGINT) AS last_age_days,
             |       CAST(sum(CAST(cents AS HUGEINT)
             |                * (1000000 // (CAST(1 AS BIGINT) << CAST(least(age // 7, 19) AS INT))))
             |            AS BIGINT) AS decayed_x1e6
             |FROM w GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Interval OVERLAP join (interval×interval — the sibling
    // q_range_join's point-in-window doesn't cover): per-user daily
    // activity spans × the 20 worst error incidents' ±30 min windows.
    // The engine grid-buckets BOTH interval sets onto a 1 h grid and
    // equi-joins on the cell, emitting each overlapping pair exactly
    // once via the canonical-cell filter (Temporal.intervalJoin — no
    // distinct, no theta-join nested loop); the oracle is the plain
    // inequality join. Census pins pair multiplicity, both distinct
    // sides, the exact integer overlap mass, and membership.
    GateQuery(
      "q_interval_join",
      (s, d) => {
        val ev = events(s, d)
          .withColumn("tus", unix_micros(col("ts")))
          .withColumn("cents", round(col("value") * 100).cast("long"))
        val sessions = ev
          .groupBy(col("user_id"), expr("tus div 86400000000L").as("day"))
          .agg(min("tus").as("s_start"), max("tus").as("s_end"))
        val incidents = ev.filter(col("event_type") === "error")
          .orderBy(desc("cents"), asc("event_id")).limit(20)
          .select(col("event_id").as("incident_id"),
            (col("tus") - 1800000000L).as("i_start"),
            (col("tus") + 1800000000L).as("i_end"))
        Temporal.intervalJoin(sessions, incidents, Nil,
            "s_start", "s_end", "i_start", "i_end",
            bucketUs = 3600000000L)
          .agg(
            count(lit(1)).as("n_pairs"),
            countDistinct(col("user_id") * 1000000 + col("day"))
              .as("n_sessions_hit"),
            countDistinct(col("r_incident_id")).as("n_incidents_hit"),
            sum("overlap_us").cast("long").as("sum_overlap_us"),
            sum(graft.operators.Curation.hashBucket(concat_ws(":",
              col("user_id"), col("day"), col("r_incident_id"))))
              .cast("long").as("pair_checksum"))
      },
      Some(s"""WITH ev AS (
              |  SELECT user_id, event_id, event_type, epoch_us(ts) AS tus,
              |         CAST(round(value * 100) AS BIGINT) AS cents
              |  FROM events),
              |sess AS (
              |  SELECT user_id, tus // 86400000000 AS day,
              |         min(tus) AS s_start, max(tus) AS s_end
              |  FROM ev GROUP BY user_id, tus // 86400000000),
              |inc AS (
              |  SELECT event_id AS incident_id,
              |         tus - 1800000000 AS i_start, tus + 1800000000 AS i_end
              |  FROM ev WHERE event_type = 'error'
              |  ORDER BY cents DESC, event_id ASC LIMIT 20),
              |p AS (
              |  SELECT user_id, day, incident_id,
              |         least(s_end, i_end) - greatest(s_start, i_start) AS overlap_us
              |  FROM sess JOIN inc ON s_start <= i_end AND i_start <= s_end)
              |SELECT count(*) AS n_pairs,
              |       count(DISTINCT user_id * 1000000 + day) AS n_sessions_hit,
              |       count(DISTINCT incident_id) AS n_incidents_hit,
              |       CAST(sum(overlap_us) AS BIGINT) AS sum_overlap_us,
              |       CAST(sum(${SharedOracles.bucketSql(
                 "CAST(user_id AS VARCHAR) || ':' || CAST(day AS VARCHAR) || ':' || CAST(incident_id AS VARCHAR)")}) AS BIGINT) AS pair_checksum
              |FROM p""".stripMargin)),
  )
}
