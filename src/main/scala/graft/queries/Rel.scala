package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational operator gate queries over the synthetic tables.
  *
  * Each query exercises one operator family from SURVEY.md §2 (scan /
  * filter / projection / aggregation / join / window / sort / set-op),
  * re-expressed over the TPC-H-ish testdata so the driver's DuckDB
  * oracle can hash-match results. Floating aggregates ship as INTEGER
  * units on BOTH sides (×100 / ×1e4 / ×1e6 longs, suffixed _x100 /
  * _x1e4 / _x1e6): a decimal round of a double is the
  * HALF_UP-vs-binary cross-engine flake class, while a
  * nearest-integer after scaling renders identically everywhere.
  *
  * Scale notes (100 TB design): every query is a declarative DataFrame
  * plan — Catalyst pushes filters/projections into the parquet scan,
  * aggregations run partial+final, small dimension tables are broadcast
  * explicitly, and nothing is ever collected to the driver.
  */
object Rel {
  import Tables._

  /** The suite's single ×1e6 quantization of Drift.psiBins output —
    * shared by q_drift_psi and the streaming monitor parity gate.
    * Shares are re-derived from the EXACT integer bin counts (totals
    * via a window over the ≤buckets-row relation) and quantized with
    * integer half-up division — no double round on a ratio; the
    * smoothing floor becomes `greatest(…, 1)` in ×1e6 units, which is
    * value-identical to rounding `greatest(n/t, 1e-6)·1e6`. Only
    * `psi_term` still quantizes a double: its ln() has no exact
    * integer form (the documented accepted exception — see
    * [[graft.operators.Metrics.mutualInformation]]).
    */
  private[queries] def psiGateProjection(df: DataFrame): DataFrame = {
    val all = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    df.select(col("bin"), col("n_ref"), col("n_cur"), col("psi_term"))
      .withColumn("_tr", sum("n_ref").over(all))
      .withColumn("_tc", sum("n_cur").over(all))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        expr("greatest(CAST((2 * CAST(n_ref AS DECIMAL(38,0)) * 1000000 + _tr)" +
          " div (2 * _tr) AS BIGINT), 1)").as("share_ref_x1e6"),
        expr("greatest(CAST((2 * CAST(n_cur AS DECIMAL(38,0)) * 1000000 + _tc)" +
          " div (2 * _tc) AS BIGINT), 1)").as("share_cur_x1e6"),
        round(col("psi_term") * 1000000).cast("long").as("psi_term_x1e6"))
  }

  /** The q_drift_psi oracle — shared VERBATIM with the streaming
    * drift-monitor parity gate (same ground truth, one definition).
    */
  private[queries] val DriftPsiOracle: String =
    """WITH ref AS (
             |  SELECT l_extendedprice AS x FROM lineitem WHERE l_orderkey % 2 = 0
             |), cur AS (
             |  SELECT l_extendedprice AS x FROM lineitem WHERE l_orderkey % 2 = 1
             |), b AS (
             |  SELECT min(x) AS lo, max(x) AS hi FROM ref
             |), r AS (
             |  SELECT greatest(least(CAST(floor((x - lo) * 10 / (hi - lo)) AS BIGINT), 9), 0) AS bin,
             |         count(*) AS n_ref
             |  FROM ref, b GROUP BY 1
             |), c AS (
             |  SELECT greatest(least(CAST(floor((x - lo) * 10 / (hi - lo)) AS BIGINT), 9), 0) AS bin,
             |         count(*) AS n_cur
             |  FROM cur, b GROUP BY 1
             |), t AS (
             |  SELECT (SELECT sum(n_ref) FROM r) AS tr,
             |         (SELECT sum(n_cur) FROM c) AS tc
             |), s AS (SELECT unnest(range(10)) AS bin)
             |SELECT s.bin AS bin,
             |       coalesce(r.n_ref, 0) AS n_ref,
             |       coalesce(c.n_cur, 0) AS n_cur,
             |       greatest(CAST((2 * CAST(coalesce(r.n_ref, 0) AS HUGEINT) * 1000000 + tr)
             |                     // (2 * tr) AS BIGINT), 1) AS share_ref_x1e6,
             |       greatest(CAST((2 * CAST(coalesce(c.n_cur, 0) AS HUGEINT) * 1000000 + tc)
             |                     // (2 * tc) AS BIGINT), 1) AS share_cur_x1e6,
             |       CAST(round((greatest(coalesce(c.n_cur, 0) / tc, 0.000001)
             |              - greatest(coalesce(r.n_ref, 0) / tr, 0.000001))
             |             * ln(greatest(coalesce(c.n_cur, 0) / tc, 0.000001)
             |                  / greatest(coalesce(r.n_ref, 0) / tr, 0.000001)) * 1000000) AS BIGINT) AS psi_term_x1e6
             |FROM s LEFT JOIN r ON s.bin = r.bin LEFT JOIN c ON s.bin = c.bin, t
             |ORDER BY bin""".stripMargin

  val queries: Seq[GateQuery] = Seq(

    // S1/S3/P3: scan + projection + filter pushdown (TPC-H Q6 shape).
    GateQuery(
      "q_scan_filter",
      (s, d) =>
        lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp")
            && col("l_shipdate") < lit("1996-01-01").cast("timestamp")
            && col("l_discount").between(0.03, 0.07)
            && col("l_quantity") < 24)
          .agg(
            // ALL gate comparison columns ship as integer units
            // (×100 / ×1e4 longs), never round(x, d) doubles: a
            // decimal round of a double is the HALF_UP-vs-binary
            // cross-engine flake class this repo documents, and an
            // integer renders identically everywhere
            // exact: cents·basis-points summed in DECIMAL, ONE half-up
            // division at the end — the old round(sum(double)·100)
            // summed floats in partial-agg order
            expr("CAST((2 * sum(CAST(round(l_extendedprice * 100) AS DECIMAL(38,0))" +
              " * CAST(round(l_discount * 100) AS BIGINT)) + 100) div 200 AS BIGINT)")
              .as("revenue_x100"),
            count(lit(1)).as("n_rows")),
      Some("""SELECT CAST((2 * sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
             |                     * CAST(round(l_discount * 100) AS BIGINT)) + 100)
             |            // 200 AS BIGINT) AS revenue_x100,
             |       count(*) AS n_rows
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
             |  AND l_shipdate < TIMESTAMP '1996-01-01'
             |  AND l_discount BETWEEN 0.03 AND 0.07
             |  AND l_quantity < 24""".stripMargin)),

    // G1/G5: multi-aggregate groupBy (TPC-H Q1 pricing summary).
    GateQuery(
      "q_agg_pricing",
      (s, d) =>
        lineitem(s, d)
          .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          // per-row exact integers (qty integral, price/discount exact
          // 2dp — fixture-verified): every sum/avg below is DECIMAL
          // integer arithmetic with ONE half-up division per published
          // column; no float ever accumulates in shuffle order
          .withColumn("_q", round(col("l_quantity")).cast("long"))
          .withColumn("_c", round(col("l_extendedprice") * 100).cast("long"))
          .withColumn("_d100", round(col("l_discount") * 100).cast("long"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            expr("CAST(sum(CAST(_q AS DECIMAL(38,0))) * 100 AS BIGINT)")
              .as("sum_qty_x100"),
            expr("CAST(sum(CAST(_c AS DECIMAL(38,0))) AS BIGINT)")
              .as("sum_base_price_x100"),
            expr("CAST((2 * sum(CAST(_c AS DECIMAL(38,0)) * (100 - _d100)) + 100)" +
              " div 200 AS BIGINT)").as("sum_disc_price_x100"),
            expr("CAST((2 * sum(CAST(_q AS DECIMAL(38,0))) * 10000 + count(1))" +
              " div (2 * count(1)) AS BIGINT)").as("avg_qty_x1e4"),
            expr("CAST((2 * sum(CAST(_d100 AS DECIMAL(38,0))) * 100 + count(1))" +
              " div (2 * count(1)) AS BIGINT)").as("avg_disc_x1e4"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             |       CAST(sum(CAST(round(l_quantity) AS HUGEINT)) * 100 AS BIGINT) AS sum_qty_x100,
             |       CAST(sum(CAST(round(l_extendedprice * 100) AS HUGEINT)) AS BIGINT) AS sum_base_price_x100,
             |       CAST((2 * sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
             |                     * (100 - CAST(round(l_discount * 100) AS BIGINT))) + 100)
             |            // 200 AS BIGINT) AS sum_disc_price_x100,
             |       CAST((2 * sum(CAST(round(l_quantity) AS HUGEINT)) * 10000 + count(*))
             |            // (2 * count(*)) AS BIGINT) AS avg_qty_x1e4,
             |       CAST((2 * sum(CAST(round(l_discount * 100) AS HUGEINT)) * 100 + count(*))
             |            // (2 * count(*)) AS BIGINT) AS avg_disc_x1e4,
             |       count(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // O4/G3: aggregate + top-k (sort + limit with deterministic tiebreak).
    GateQuery(
      "q_topk_brands",
      (s, d) =>
        part(s, d)
          .groupBy("p_brand")
          .agg(
            round(sum("p_retailprice") * 100).cast("long").as("sum_retail_x100"),
            count(lit(1)).as("n_parts"))
          .orderBy(desc("sum_retail_x100"), asc("p_brand"))
          .limit(10),
      Some("""SELECT p_brand, CAST(round(sum(p_retailprice) * 100) AS BIGINT) AS sum_retail_x100,
             |       count(*) AS n_parts
             |FROM part
             |GROUP BY p_brand
             |ORDER BY sum_retail_x100 DESC, p_brand ASC
             |LIMIT 10""".stripMargin)),

    // Join (shuffle hash / SMJ on fact side) + aggregation.
    GateQuery(
      "q_join_agg",
      (s, d) =>
        orders(s, d)
          .join(customer(s, d), col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(
            round(sum("o_totalprice") * 100).cast("long").as("sum_price_x100"),
            count(lit(1)).as("n_orders"))
          .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment, CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS sum_price_x100,
             |       count(*) AS n_orders
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment
             |ORDER BY c_mktsegment""".stripMargin)),

    // Broadcast join chain over small dims (supplier ⋈ nation ⋈ region).
    GateQuery(
      "q_broadcast_dims",
      (s, d) =>
        supplier(s, d)
          .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name")
          .agg(
            count(lit(1)).as("n_suppliers"),
            round(sum("s_acctbal") * 100).cast("long").as("sum_bal_x100"))
          .orderBy("r_name"),
      Some("""SELECT r_name, count(*) AS n_suppliers,
             |       CAST(round(sum(s_acctbal) * 100) AS BIGINT) AS sum_bal_x100
             |FROM supplier
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name
             |ORDER BY r_name""".stripMargin)),

    // Left outer join + null handling (P4 coalesce/fillna analogue).
    GateQuery(
      "q_left_join_hist",
      (s, d) => {
        val perCust = customer(s, d)
          .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("n_orders"))
        perCust
          .groupBy("n_orders")
          .agg(count(lit(1)).as("n_customers"))
          .orderBy("n_orders")
      },
      Some("""SELECT n_orders, count(*) AS n_customers
             |FROM (
             |  SELECT c_custkey, count(o_orderkey) AS n_orders
             |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |  GROUP BY c_custkey)
             |GROUP BY n_orders
             |ORDER BY n_orders""".stripMargin)),

    // Semi join (EXISTS).
    GateQuery(
      "q_semi_join",
      (s, d) =>
        customer(s, d)
          .join(
            orders(s, d).filter(col("o_totalprice") > 200000),
            col("c_custkey") === col("o_custkey"),
            "left_semi")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_big_customers"))
          .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment, count(*) AS n_big_customers
             |FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |              WHERE o_custkey = c_custkey AND o_totalprice > 200000)
             |GROUP BY c_mktsegment
             |ORDER BY c_mktsegment""".stripMargin)),

    // Anti join (NOT EXISTS) — orphan detection, mirrors P3's orphaned rewards.
    GateQuery(
      "q_anti_join",
      (s, d) =>
        customer(s, d)
          .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy("c_mktsegment")
          .agg(
            count(lit(1)).as("n_orphans"),
            round(sum("c_acctbal") * 100).cast("long").as("sum_bal_x100"))
          .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment, count(*) AS n_orphans,
             |       CAST(round(sum(c_acctbal) * 100) AS BIGINT) AS sum_bal_x100
             |FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |GROUP BY c_mktsegment
             |ORDER BY c_mktsegment""".stripMargin)),

    // W1: window functions — lag over (user, time) ordering.
    GateQuery(
      "q_window_lag",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("event_id")
        events(s, d)
          .withColumn("prev_value", lag("value", 1).over(w))
          .filter(col("prev_value").isNotNull)
          .groupBy("user_id")
          .agg(
            round(sum(abs(col("value") - col("prev_value"))) * 100)
              .cast("long").as("sum_abs_delta_x100"),
            count(lit(1)).as("n_steps"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id,
             |       CAST(round(sum(abs(value - prev_value)) * 100) AS BIGINT) AS sum_abs_delta_x100,
             |       count(*) AS n_steps
             |FROM (
             |  SELECT user_id, value,
             |         lag(value, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_value
             |  FROM events)
             |WHERE prev_value IS NOT NULL
             |GROUP BY user_id
             |ORDER BY user_id""".stripMargin)),

    // W1 variant: ranking window + per-group top-N rows.
    GateQuery(
      "q_window_rank",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("event_type").orderBy(desc("value"), asc("event_id"))
        events(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("event_type", "rn", "event_id", "value")
          .orderBy("event_type", "rn")
      },
      Some("""SELECT event_type, rn, event_id, value
             |FROM (
             |  SELECT event_type, event_id, value,
             |         row_number() OVER (PARTITION BY event_type
             |                            ORDER BY value DESC, event_id ASC) AS rn
             |  FROM events)
             |WHERE rn <= 3
             |ORDER BY event_type, rn""".stripMargin)),

    // U1/U2: union of same-schema projections then re-aggregate.
    GateQuery(
      "q_union_kinds",
      (s, d) => {
        val c = customer(s, d).select(
          col("c_custkey").as("id"), lit("customer").as("kind"), col("c_acctbal").as("bal"))
        val sup = supplier(s, d).select(
          col("s_suppkey").as("id"), lit("supplier").as("kind"), col("s_acctbal").as("bal"))
        c.unionByName(sup)
          .groupBy("kind")
          .agg(
            count(lit(1)).as("n"),
            round(sum("bal") * 100).cast("long").as("sum_bal_x100"),
            round(avg("bal") * 10000).cast("long").as("avg_bal_x1e4"))
          .orderBy("kind")
      },
      Some("""SELECT kind, count(*) AS n,
             |       CAST(round(sum(bal) * 100) AS BIGINT) AS sum_bal_x100,
             |       CAST(round(avg(bal) * 10000) AS BIGINT) AS avg_bal_x1e4
             |FROM (
             |  SELECT c_custkey AS id, 'customer' AS kind, c_acctbal AS bal FROM customer
             |  UNION ALL
             |  SELECT s_suppkey AS id, 'supplier' AS kind, s_acctbal AS bal FROM supplier)
             |GROUP BY kind
             |ORDER BY kind""".stripMargin)),

    // O1/O2: global sort + limit, min/max extraction.
    GateQuery(
      "q_sort_limit",
      (s, d) =>
        orders(s, d)
          .orderBy(desc("o_totalprice"), asc("o_orderkey"))
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .limit(25),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice
             |FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey ASC
             |LIMIT 25""".stripMargin)),

    GateQuery(
      "q_minmax",
      (s, d) =>
        orders(s, d).agg(
          date_format(min("o_orderdate"), "yyyy-MM-dd").as("min_date"),
          date_format(max("o_orderdate"), "yyyy-MM-dd").as("max_date"),
          min("o_orderkey").as("min_key"),
          max("o_orderkey").as("max_key"),
          count(lit(1)).as("n")),
      Some("""SELECT strftime(min(o_orderdate), '%Y-%m-%d') AS min_date,
             |       strftime(max(o_orderdate), '%Y-%m-%d') AS max_date,
             |       min(o_orderkey) AS min_key,
             |       max(o_orderkey) AS max_key,
             |       count(*) AS n
             |FROM orders""".stripMargin)),

    // G5: describe()-style summary stats incl. exact interpolated median.
    GateQuery(
      "q_describe",
      (s, d) =>
        events(s, d).agg(
          count("value").as("n"),
          // integer-units (×1e4 / ×100 longs), not round(x, d): decimal
          // rounds of doubles are the HALF_UP-vs-binary flake class
          round(avg("value") * 10000).cast("long").as("mean_x1e4"),
          round(stddev_samp("value") * 10000).cast("long").as("std_x1e4"),
          round(min("value") * 100).cast("long").as("min_v_cents"),
          round(expr("percentile(value, 0.5)") * 10000).cast("long").as("median_x1e4"),
          round(max("value") * 100).cast("long").as("max_v_cents")),
      Some("""SELECT count(value) AS n,
             |       CAST(round(avg(value) * 10000) AS BIGINT) AS mean_x1e4,
             |       CAST(round(stddev_samp(value) * 10000) AS BIGINT) AS std_x1e4,
             |       CAST(round(min(value) * 100) AS BIGINT) AS min_v_cents,
             |       CAST(round(quantile_cont(value, 0.5) * 10000) AS BIGINT) AS median_x1e4,
             |       CAST(round(max(value) * 100) AS BIGINT) AS max_v_cents
             |FROM events""".stripMargin)),

    // P7: rlike predicate.
    GateQuery(
      "q_regex_filter",
      (s, d) =>
        documents(s, d)
          .filter(col("source").rlike("^src1[0-9]$"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
          .orderBy("source"),
      Some("""SELECT source, count(*) AS n_docs,
             |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
             |FROM documents
             |WHERE regexp_matches(source, '^src1[0-9]$')
             |GROUP BY source
             |ORDER BY source""".stripMargin)),

    // P5: binarization (reward > 0 → 1.0 analogue) + conditional agg.
    GateQuery(
      "q_binarize",
      (s, d) =>
        events(s, d)
          .groupBy("event_type")
          .agg(
            sum(when(col("value") > 100, 1L).otherwise(0L)).as("n_high"),
            count(lit(1)).as("n"),
            round(avg(when(col("value") > 100, 1.0).otherwise(0.0)) * 10000)
              .cast("long").as("high_rate_x1e4"))
          .orderBy("event_type"),
      Some("""SELECT event_type,
             |       CAST(sum(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
             |       count(*) AS n,
             |       CAST(round(avg(CASE WHEN value > 100 THEN 1.0 ELSE 0.0 END) * 10000) AS BIGINT) AS high_rate_x1e4
             |FROM events
             |GROUP BY event_type
             |ORDER BY event_type""".stripMargin)),

    // F5-adjacent: JSON payload extraction from a string column.
    GateQuery(
      "q_json_extract",
      (s, d) =>
        events(s, d)
          .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
          .groupBy("event_type")
          .agg(
            sum("k").as("sum_k"),
            round(avg("k") * 10000).cast("long").as("avg_k_x1e4"),
            count(lit(1)).as("n"))
          .orderBy("event_type"),
      Some("""SELECT event_type,
             |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             |       CAST(round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)) * 10000) AS BIGINT) AS avg_k_x1e4,
             |       count(*) AS n
             |FROM events
             |GROUP BY event_type
             |ORDER BY event_type""".stripMargin)),

    // G1 analogue on testdata: decision/reward full-outer merge keyed by
    // user (clicks = decisions, purchases = rewards; reward null-fills
    // to 0.0 exactly like P4). See SURVEY §2.3.
    GateQuery(
      "q_reward_merge",
      (s, d) => {
        val ev = events(s, d)
        val decisions = ev.filter(col("event_type") === "click")
          .groupBy("user_id")
          .agg(min("event_id").as("first_decision"), count(lit(1)).as("n_decisions"))
        val rewards = ev.filter(col("event_type") === "purchase")
          .groupBy("user_id")
          .agg(round(sum("value") * 100).cast("long").as("reward_sum_x100"),
            count(lit(1)).as("n_rewards"))
        decisions
          .join(rewards, Seq("user_id"), "full_outer")
          .select(
            col("user_id"),
            col("first_decision"),
            coalesce(col("n_decisions"), lit(0L)).as("n_decisions"),
            coalesce(col("reward_sum_x100"), lit(0L)).as("reward_sum_x100"),
            coalesce(col("n_rewards"), lit(0L)).as("n_rewards"))
          .orderBy("user_id")
      },
      Some("""SELECT COALESCE(d.user_id, r.user_id) AS user_id,
             |       d.first_decision AS first_decision,
             |       COALESCE(d.n_decisions, 0) AS n_decisions,
             |       COALESCE(r.reward_sum_x100, 0) AS reward_sum_x100,
             |       COALESCE(r.n_rewards, 0) AS n_rewards
             |FROM (SELECT user_id, min(event_id) AS first_decision,
             |             count(*) AS n_decisions
             |      FROM events WHERE event_type = 'click' GROUP BY user_id) d
             |FULL OUTER JOIN
             |     (SELECT user_id, CAST(round(sum(value) * 100) AS BIGINT) AS reward_sum_x100,
             |             count(*) AS n_rewards
             |      FROM events WHERE event_type = 'purchase' GROUP BY user_id) r
             |ON d.user_id = r.user_id
             |ORDER BY user_id""".stripMargin)),

    // Distinct aggregation.
    GateQuery(
      "q_distinct_agg",
      (s, d) =>
        lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(
            countDistinct(col("l_orderkey")).as("n_orders"),
            countDistinct(col("l_suppkey")).as("n_supps"),
            count(lit(1)).as("n_rows"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_orders,
             |       count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
             |FROM lineitem
             |GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // 3-way shuffle join + agg + top-k (TPC-H Q3 shape).
    GateQuery(
      "q_three_way_join",
      (s, d) =>
        customer(s, d).filter(col("c_mktsegment") === "BUILDING")
          .join(orders(s, d), col("c_custkey") === col("o_custkey"))
          .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
          .filter(col("o_orderdate") < lit("1995-03-15").cast("date")
            && col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
          .groupBy("o_orderkey")
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))) * 100)
            .cast("long").as("revenue_x100"))
          .orderBy(desc("revenue_x100"), asc("o_orderkey"))
          .limit(10),
      Some("""SELECT o_orderkey, CAST(round(sum(l_extendedprice * (1 - l_discount)) * 100) AS BIGINT) AS revenue_x100
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON o_orderkey = l_orderkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < DATE '1995-03-15'
             |  AND l_shipdate > TIMESTAMP '1995-03-15'
             |GROUP BY o_orderkey
             |ORDER BY revenue_x100 DESC, o_orderkey ASC
             |LIMIT 10""".stripMargin)),

    // Sessionization: 30-minute-gap sessions per user via lag +
    // cumulative boundary sum — the batch form of session windows.
    GateQuery(
      "q_sessionize",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val sessions = events(s, d)
          .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
          .withColumn("new_session",
            when(col("prev_ts").isNull
              || col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1L).otherwise(0L))
          .withColumn("session_id", sum("new_session").over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        sessions
          .groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_events"))
          .groupBy("user_id")
          .agg(
            count(lit(1)).as("n_sessions"),
            max("n_events").as("max_session_events"),
            round(avg("n_events") * 10000).cast("long").as("avg_session_events_x1e4"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, count(*) AS n_sessions,
             |       max(n_events) AS max_session_events,
             |       CAST(round(avg(n_events) * 10000) AS BIGINT) AS avg_session_events_x1e4
             |FROM (
             |  SELECT user_id, session_id, count(*) AS n_events
             |  FROM (
             |    SELECT user_id,
             |           sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                                  ROWS UNBOUNDED PRECEDING) AS session_id
             |    FROM (
             |      SELECT user_id, ts, event_id,
             |             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             |                    OR CAST(floor(epoch(ts)) AS BIGINT)
             |                       - CAST(floor(epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT) > 1800
             |                  THEN 1 ELSE 0 END AS new_session
             |      FROM events))
             |  GROUP BY user_id, session_id)
             |GROUP BY user_id
             |ORDER BY user_id""".stripMargin)),

    // Hierarchical aggregation: ROLLUP with grouping level id.
    GateQuery(
      "q_rollup",
      (s, d) =>
        lineitem(s, d)
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(
            round(sum("l_quantity") * 100).cast("long").as("sum_qty_x100"),
            count(lit(1)).as("n"),
            grouping_id().as("gid"))
          .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"), asc("gid")),
      Some("""SELECT l_returnflag, l_linestatus,
             |       CAST(round(sum(l_quantity) * 100) AS BIGINT) AS sum_qty_x100,
             |       count(*) AS n,
             |       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid
             |FROM lineitem
             |GROUP BY ROLLUP (l_returnflag, l_linestatus)
             |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST, gid ASC""".stripMargin)),

    // Set operations: INTERSECT / EXCEPT between two key populations.
    GateQuery(
      "q_setops",
      (s, d) => {
        val big = orders(s, d).filter(col("o_totalprice") > 150000)
          .select(col("o_custkey").as("k"))
        val recent = orders(s, d)
          .filter(col("o_orderdate") >= lit("1997-01-01").cast("date"))
          .select(col("o_custkey").as("k"))
        val both = big.intersect(recent).agg(count(lit(1)).as("n")).select(lit("both").as("pop"), col("n"))
        val onlyBig = big.except(recent).agg(count(lit(1)).as("n")).select(lit("only_big").as("pop"), col("n"))
        both.unionByName(onlyBig).orderBy("pop")
      },
      Some("""WITH big AS (SELECT o_custkey AS k FROM orders WHERE o_totalprice > 150000),
             |     recent AS (SELECT o_custkey AS k FROM orders WHERE o_orderdate >= DATE '1997-01-01')
             |SELECT 'both' AS pop, count(*) AS n FROM (SELECT k FROM big INTERSECT SELECT k FROM recent)
             |UNION ALL
             |SELECT 'only_big' AS pop, count(*) AS n FROM (SELECT k FROM big EXCEPT SELECT k FROM recent)
             |ORDER BY pop""".stripMargin)),

    // Date bucketing + time-series aggregation (month grain).
    GateQuery(
      "q_time_bucket",
      (s, d) =>
        events(s, d)
          .withColumn("month", date_format(col("ts"), "yyyy-MM"))
          .groupBy("month")
          .agg(
            count(lit(1)).as("n"),
            round(sum("value") * 100).cast("long").as("sum_value_x100"),
            countDistinct(col("user_id")).as("n_users"))
          .orderBy("month"),
      Some("""SELECT strftime(ts, '%Y-%m') AS month, count(*) AS n,
             |       CAST(round(sum(value) * 100) AS BIGINT) AS sum_value_x100,
             |       count(DISTINCT user_id) AS n_users
             |FROM events
             |GROUP BY month
             |ORDER BY month""".stripMargin)),

    // Pivot (long→wide): per-user event-type value matrix. The value
    // list is explicit, so Spark skips the pre-scan a dynamic pivot
    // needs to discover columns and the whole pivot compiles to ONE
    // conditional-aggregation shuffle — the shape that scales.
    GateQuery(
      "q_pivot",
      (s, d) =>
        events(s, d)
          .groupBy("user_id")
          .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
          .agg(round(sum("value") * 100).cast("long"))
          .orderBy("user_id"),
      Some("""SELECT user_id,
             |       CAST(round(sum(CASE WHEN event_type = 'click' THEN value END) * 100) AS BIGINT) AS click,
             |       CAST(round(sum(CASE WHEN event_type = 'error' THEN value END) * 100) AS BIGINT) AS error,
             |       CAST(round(sum(CASE WHEN event_type = 'purchase' THEN value END) * 100) AS BIGINT) AS purchase,
             |       CAST(round(sum(CASE WHEN event_type = 'signup' THEN value END) * 100) AS BIGINT) AS signup,
             |       CAST(round(sum(CASE WHEN event_type = 'view' THEN value END) * 100) AS BIGINT) AS "view"
             |FROM events
             |GROUP BY user_id
             |ORDER BY user_id""".stripMargin)),

    // Unpivot (wide→long, melt): per-metric census over lineitem's
    // numeric columns. Unpivot is a zero-shuffle column program (each
    // row expands in place); the only exchange is the final census agg.
    GateQuery(
      "q_unpivot",
      (s, d) =>
        lineitem(s, d)
          .select("l_quantity", "l_extendedprice", "l_discount")
          .unpivot(Array.empty[org.apache.spark.sql.Column],
            Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
            "metric", "val")
          .groupBy("metric")
          .agg(round(sum("val") * 100).cast("long").as("sum_val_x100"),
            count(lit(1)).as("n"))
          .orderBy("metric"),
      Some("""SELECT 'l_quantity' AS metric, CAST(round(sum(l_quantity) * 100) AS BIGINT) AS sum_val_x100, count(*) AS n FROM lineitem
             |UNION ALL
             |SELECT 'l_extendedprice', CAST(round(sum(l_extendedprice) * 100) AS BIGINT), count(*) FROM lineitem
             |UNION ALL
             |SELECT 'l_discount', CAST(round(sum(l_discount) * 100) AS BIGINT), count(*) FROM lineitem
             |ORDER BY metric""".stripMargin)),

    // Data-quality expectations: the relation-level contract check a
    // pipeline runs before ingesting a batch. Row-local rules share
    // ONE aggregation pass; uniqueness is one keyed agg; the FK check
    // is distinct + left join + agg (reference side may be
    // corpus-sized — never collected). Violation counts are exact, so
    // the whole verdict table is oracle-able; three rules are
    // deliberately failing ones.
    GateQuery(
      "q_quality",
      (s, d) =>
        graft.operators.Quality.check(lineitem(s, d), Seq(
          graft.operators.Quality.NotNull("l_orderkey"),
          graft.operators.Quality.InRange("l_quantity", 1.0, 25.0),
          graft.operators.Quality.InSet("l_returnflag", Seq("A", "N")),
          graft.operators.Quality.Matches("l_linestatus", "^[FO]$"),
          graft.operators.Quality.Unique(Seq("l_orderkey", "l_linenumber")),
          graft.operators.Quality.ForeignKey(Seq("l_orderkey"),
            orders(s, d), Seq("o_orderkey"))))
          .orderBy("rule"),
      Some("""SELECT 'not_null(l_orderkey)' AS rule,
             |       CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations,
             |       count(*) AS checked,
             |       sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) = 0 AS pass
             |FROM lineitem
             |UNION ALL
             |SELECT 'in_range(l_quantity,1.0,25.0)',
             |       CAST(sum(CASE WHEN l_quantity IS NOT NULL AND (l_quantity < 1 OR l_quantity > 25) THEN 1 ELSE 0 END) AS BIGINT),
             |       count(*),
             |       sum(CASE WHEN l_quantity IS NOT NULL AND (l_quantity < 1 OR l_quantity > 25) THEN 1 ELSE 0 END) = 0
             |FROM lineitem
             |UNION ALL
             |SELECT 'in_set(l_returnflag:{A,N})',
             |       CAST(sum(CASE WHEN l_returnflag IS NOT NULL AND l_returnflag NOT IN ('A', 'N') THEN 1 ELSE 0 END) AS BIGINT),
             |       count(*),
             |       sum(CASE WHEN l_returnflag IS NOT NULL AND l_returnflag NOT IN ('A', 'N') THEN 1 ELSE 0 END) = 0
             |FROM lineitem
             |UNION ALL
             |SELECT 'matches(l_linestatus:^[FO]$)',
             |       CAST(sum(CASE WHEN l_linestatus IS NOT NULL AND NOT regexp_matches(l_linestatus, '^[FO]$') THEN 1 ELSE 0 END) AS BIGINT),
             |       count(*),
             |       sum(CASE WHEN l_linestatus IS NOT NULL AND NOT regexp_matches(l_linestatus, '^[FO]$') THEN 1 ELSE 0 END) = 0
             |FROM lineitem
             |UNION ALL
             |SELECT 'unique(l_orderkey+l_linenumber)',
             |       CAST(coalesce(sum(c - 1), 0) AS BIGINT),
             |       CAST(coalesce(sum(c), 0) AS BIGINT),
             |       coalesce(sum(c - 1), 0) = 0
             |FROM (SELECT count(*) AS c FROM lineitem GROUP BY l_orderkey, l_linenumber)
             |UNION ALL
             |SELECT 'fk(l_orderkey->o_orderkey)',
             |       CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |       count(*),
             |       sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) = 0
             |FROM (SELECT l_orderkey FROM lineitem WHERE l_orderkey IS NOT NULL) l
             |LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
             |  ON l.l_orderkey = o.o_orderkey
             |ORDER BY rule""".stripMargin)),

    // Winsorization: clip each group's values at its own [p05, p95] —
    // outlier taming before statistics. The percentile relation is
    // groups-sized (joined back, never collected); census pins clipped
    // counts and the trimmed mean. EXACT integer arithmetic end to
    // end: prices become cents per row (a deterministic single round
    // of identical doubles), the interpolated bounds are quantized to
    // integer cents ONCE per group, and the clipped mean is a
    // DECIMAL(38,0) sum with integer half-up division — no float ever
    // accumulates in shuffle order (the old round(avg*100) did, and a
    // partial-agg-order ulp could flip the final digit).
    GateQuery(
      "q_winsorize",
      (s, d) => {
        val li = lineitem(s, d).select(col("l_returnflag"),
          round(col("l_extendedprice") * 100).cast("long").as("_cents"))
        val bounds = li.groupBy("l_returnflag")
          .agg(
            round(expr("percentile(_cents, 0.05)")).cast("long").as("lo_c"),
            round(expr("percentile(_cents, 0.95)")).cast("long").as("hi_c"))
        li.join(bounds, Seq("l_returnflag"))
          .withColumn("_clip",
            least(greatest(col("_cents"), col("lo_c")), col("hi_c")))
          .groupBy("l_returnflag")
          .agg(
            count(lit(1)).as("n"),
            sum((col("_cents") < col("lo_c")).cast("long")).as("n_low"),
            sum((col("_cents") > col("hi_c")).cast("long")).as("n_high"),
            expr("CAST((2 * sum(CAST(_clip AS DECIMAL(38,0))) + count(1))" +
              " div (2 * count(1)) AS BIGINT)").as("winsor_mean_x100"))
          .orderBy("l_returnflag")
      },
      Some("""WITH c AS (
             |  SELECT l_returnflag,
             |         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
             |  FROM lineitem),
             |b AS (
             |  SELECT l_returnflag,
             |         CAST(round(quantile_cont(cents, 0.05)) AS BIGINT) AS lo_c,
             |         CAST(round(quantile_cont(cents, 0.95)) AS BIGINT) AS hi_c
             |  FROM c GROUP BY l_returnflag
             |)
             |SELECT c.l_returnflag, count(*) AS n,
             |       CAST(sum(CASE WHEN cents < lo_c THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
             |       CAST(sum(CASE WHEN cents > hi_c THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
             |       CAST((2 * sum(CAST(least(greatest(cents, lo_c), hi_c) AS HUGEINT)) + count(*))
             |            // (2 * count(*)) AS BIGINT) AS winsor_mean_x100
             |FROM c JOIN b ON c.l_returnflag = b.l_returnflag
             |GROUP BY c.l_returnflag
             |ORDER BY c.l_returnflag""".stripMargin)),

    // Pairwise Pearson correlation matrix over numeric columns — one
    // aggregation pass computes every pair (no per-pair scans).
    GateQuery(
      "q_corr",
      (s, d) =>
        lineitem(s, d)
          .agg(
            round(corr("l_quantity", "l_extendedprice") * 10000).cast("long").as("qty_price_x1e4"),
            round(corr("l_quantity", "l_discount") * 10000).cast("long").as("qty_disc_x1e4"),
            round(corr("l_extendedprice", "l_discount") * 10000).cast("long").as("price_disc_x1e4"),
            round(corr("l_extendedprice", "l_tax") * 10000).cast("long").as("price_tax_x1e4")),
      Some("""SELECT CAST(round(corr(l_quantity, l_extendedprice) * 10000) AS BIGINT) AS qty_price_x1e4,
             |       CAST(round(corr(l_quantity, l_discount) * 10000) AS BIGINT) AS qty_disc_x1e4,
             |       CAST(round(corr(l_extendedprice, l_discount) * 10000) AS BIGINT) AS price_disc_x1e4,
             |       CAST(round(corr(l_extendedprice, l_tax) * 10000) AS BIGINT) AS price_tax_x1e4
             |FROM lineitem""".stripMargin)),

    // Market-basket association rules: item pairs co-bought in ≥ 3
    // orders with confidence/lift. The pair join is keyed on the
    // basket (Σ basket² comparisons, never corpus²).
    GateQuery(
      "q_assoc_rules",
      (s, d) =>
        // the operator ships full-precision ratios PLUS their exact
        // integer inputs; the GATE quantizes in pure integer half-up
        // division ((2·num·1e4 + den) div (2·den)) — no double is ever
        // rounded, so no FP boundary exists to split engines
        graft.operators.Basket.rules(lineitem(s, d), "l_orderkey", "l_partkey",
            minSupport = 3L)
          .select(col("item_a"), col("item_b"), col("pair_sup"),
            expr("CAST((2 * CAST(pair_sup AS DECIMAL(38,0)) * 10000 + sup_a)" +
              " div (2 * sup_a) AS BIGINT)").as("conf_a_b_x1e4"),
            expr("CAST((2 * CAST(pair_sup AS DECIMAL(38,0)) * 10000 + sup_b)" +
              " div (2 * sup_b) AS BIGINT)").as("conf_b_a_x1e4"),
            expr("CAST((2 * CAST(pair_sup AS DECIMAL(38,0)) * n_baskets * 10000" +
              " + CAST(sup_a AS DECIMAL(38,0)) * sup_b)" +
              " div (2 * CAST(sup_a AS DECIMAL(38,0)) * sup_b) AS BIGINT)")
              .as("lift_x1e4"))
          .orderBy("item_a", "item_b"),
      Some("""WITH items AS (
             |  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem
             |), n AS (SELECT count(DISTINCT b) AS nb FROM items),
             |sup AS (SELECT i, count(*) AS s FROM items GROUP BY 1),
             |p AS (
             |  SELECT a.i AS item_a, c.i AS item_b, count(*) AS pair_sup
             |  FROM items a JOIN items c ON a.b = c.b AND a.i < c.i
             |  GROUP BY 1, 2
             |)
             |SELECT item_a, item_b, pair_sup,
             |       CAST((2 * CAST(pair_sup AS HUGEINT) * 10000 + sa.s)
             |            // (2 * sa.s) AS BIGINT) AS conf_a_b_x1e4,
             |       CAST((2 * CAST(pair_sup AS HUGEINT) * 10000 + sb.s)
             |            // (2 * sb.s) AS BIGINT) AS conf_b_a_x1e4,
             |       CAST((2 * CAST(pair_sup AS HUGEINT) * n.nb * 10000
             |             + CAST(sa.s AS HUGEINT) * sb.s)
             |            // (2 * CAST(sa.s AS HUGEINT) * sb.s) AS BIGINT) AS lift_x1e4
             |FROM p
             |JOIN sup sa ON p.item_a = sa.i
             |JOIN sup sb ON p.item_b = sb.i
             |CROSS JOIN n
             |WHERE pair_sup >= 3
             |ORDER BY item_a, item_b""".stripMargin)),

    // CUBE: all grouping-set combinations with grouping ids — the
    // sibling of q_rollup completing the GROUPING SETS surface.
    GateQuery(
      "q_cube",
      (s, d) =>
        lineitem(s, d)
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(
            round(sum("l_extendedprice") * 100).cast("long").as("sum_price_x100"),
            count(lit(1)).as("n"),
            grouping_id().as("gid"))
          .orderBy(asc_nulls_first("l_returnflag"),
            asc_nulls_first("l_linestatus"), asc("gid")),
      Some("""SELECT l_returnflag, l_linestatus,
             |       CAST(round(sum(l_extendedprice) * 100) AS BIGINT) AS sum_price_x100,
             |       count(*) AS n,
             |       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid
             |FROM lineitem
             |GROUP BY CUBE (l_returnflag, l_linestatus)
             |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST, gid ASC""".stripMargin)),

    // Equi-width histogram: 10 bins over the observed [min, max] —
    // a stats pass + a binning pass (the bounds relation is one row,
    // crossed in — never collected to the driver mid-plan).
    GateQuery(
      "q_histogram",
      (s, d) => {
        val li = lineitem(s, d)
        val bounds = li.agg(
          min("l_extendedprice").as("lo"), max("l_extendedprice").as("hi"))
        li.crossJoin(bounds)
          .withColumn("bin",
            least(floor((col("l_extendedprice") - col("lo")) * 10.0 /
              (col("hi") - col("lo"))), lit(9L)).cast("long"))
          .groupBy("bin")
          .agg(count(lit(1)).as("n"),
            round(avg("l_extendedprice") * 100).cast("long").as("bin_mean_x100"))
          .orderBy("bin")
      },
      Some("""WITH b AS (
             |  SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
             |  FROM lineitem
             |)
             |SELECT CAST(least(floor((l_extendedprice - lo) * 10.0 / (hi - lo)), 9) AS BIGINT) AS bin,
             |       count(*) AS n,
             |       CAST(round(avg(l_extendedprice) * 100) AS BIGINT) AS bin_mean_x100
             |FROM lineitem, b
             |GROUP BY bin
             |ORDER BY bin""".stripMargin)),

    // Distribution-drift monitor (Drift.psiBins): per-bin population
    // shares + PSI terms between two halves of lineitem (even vs odd
    // order keys — near-identical distributions, so the gate checks
    // the MACHINERY: binning over reference bounds, the all-bins
    // spine, share smoothing, and the log-term arithmetic, which a
    // swapped side or off-by-one bin edge would all break).
    GateQuery(
      "q_drift_psi",
      (s, d) => {
        val li = lineitem(s, d)
        // the operator ships full-precision shares; the GATE applies
        // the suite's single scaled-integer quantization (×1e6 longs)
        graft.operators.Drift.psiBins(
          li.filter(col("l_orderkey") % 2 === 0),
          li.filter(col("l_orderkey") % 2 === 1),
          "l_extendedprice", buckets = 10)
          .transform(psiGateProjection)
      },
      Some(DriftPsiOracle)),

    // Binned two-sample Kolmogorov–Smirnov drift (Drift.ksBins): cur
    // is the odd-key half SCALED ×1.1 — a genuine planted location
    // shift, so the ECDF gap is materially nonzero and the joint
    // [min, max] grid (cur's max exceeds ref's) is load-bearing; a
    // reference-only grid, swapped cumsums, or an off-by-one edge all
    // change the hash.
    GateQuery(
      "q_drift_ks",
      (s, d) => {
        val li = lineitem(s, d)
        // cumulative sums and totals re-derived from the EXACT
        // integer bin counts over the 10-row relation; quantization
        // is integer half-up division — the old round(double·1e6)
        // carried a (tiny) cross-engine FP boundary one layer down
        val cum = org.apache.spark.sql.expressions.Window.orderBy("bin")
          .rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        val all = org.apache.spark.sql.expressions.Window
          .rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.unboundedFollowing)
        graft.operators.Drift.ksBins(
          li.filter(col("l_orderkey") % 2 === 0),
          li.filter(col("l_orderkey") % 2 === 1)
            .withColumn("l_extendedprice", col("l_extendedprice") * 1.1),
          "l_extendedprice", buckets = 10)
          .select(col("bin"), col("n_ref"), col("n_cur"))
          .withColumn("_cr", sum("n_ref").over(cum))
          .withColumn("_cc", sum("n_cur").over(cum))
          .withColumn("_tr", sum("n_ref").over(all))
          .withColumn("_tc", sum("n_cur").over(all))
          .select(col("bin"), col("n_ref"), col("n_cur"),
            expr("CAST((2 * CAST(_cr AS DECIMAL(38,0)) * 1000000 + _tr)" +
              " div (2 * _tr) AS BIGINT)").as("cum_share_ref_x1e6"),
            expr("CAST((2 * CAST(_cc AS DECIMAL(38,0)) * 1000000 + _tc)" +
              " div (2 * _tc) AS BIGINT)").as("cum_share_cur_x1e6"),
            expr("CAST((2 * abs(CAST(_cr AS DECIMAL(38,0)) * _tc" +
              " - CAST(_cc AS DECIMAL(38,0)) * _tr) * 1000000" +
              " + CAST(_tr AS DECIMAL(38,0)) * _tc)" +
              " div (2 * CAST(_tr AS DECIMAL(38,0)) * _tc) AS BIGINT)")
              .as("ks_term_x1e6"))
      },
      Some("""WITH ref AS (
             |  SELECT CAST(l_extendedprice AS DOUBLE) AS x FROM lineitem WHERE l_orderkey % 2 = 0
             |), cur AS (
             |  SELECT CAST(l_extendedprice AS DOUBLE) * 1.1 AS x FROM lineitem WHERE l_orderkey % 2 = 1
             |), b AS (
             |  SELECT least((SELECT min(x) FROM ref), (SELECT min(x) FROM cur)) AS lo,
             |         greatest((SELECT max(x) FROM ref), (SELECT max(x) FROM cur)) AS hi
             |), r AS (
             |  SELECT greatest(least(CAST(floor((x - lo) * 10 / (hi - lo)) AS BIGINT), 9), 0) AS bin,
             |         count(*) AS n_ref
             |  FROM ref, b GROUP BY 1
             |), c AS (
             |  SELECT greatest(least(CAST(floor((x - lo) * 10 / (hi - lo)) AS BIGINT), 9), 0) AS bin,
             |         count(*) AS n_cur
             |  FROM cur, b GROUP BY 1
             |), t AS (
             |  SELECT (SELECT sum(n_ref) FROM r) AS tr,
             |         (SELECT sum(n_cur) FROM c) AS tc
             |), s AS (SELECT unnest(range(10)) AS bin),
             |j AS (
             |  SELECT s.bin AS bin,
             |         coalesce(r.n_ref, 0) AS n_ref,
             |         coalesce(c.n_cur, 0) AS n_cur,
             |         sum(coalesce(r.n_ref, 0)) OVER (ORDER BY s.bin) AS cr,
             |         sum(coalesce(c.n_cur, 0)) OVER (ORDER BY s.bin) AS cc
             |  FROM s LEFT JOIN r ON s.bin = r.bin LEFT JOIN c ON s.bin = c.bin
             |)
             |SELECT bin, n_ref, n_cur,
             |       CAST((2 * CAST(cr AS HUGEINT) * 1000000 + tr)
             |            // (2 * tr) AS BIGINT) AS cum_share_ref_x1e6,
             |       CAST((2 * CAST(cc AS HUGEINT) * 1000000 + tc)
             |            // (2 * tc) AS BIGINT) AS cum_share_cur_x1e6,
             |       CAST((2 * abs(CAST(cr AS HUGEINT) * tc - CAST(cc AS HUGEINT) * tr) * 1000000
             |             + CAST(tr AS HUGEINT) * tc)
             |            // (2 * CAST(tr AS HUGEINT) * tc) AS BIGINT) AS ks_term_x1e6
             |FROM j, t
             |ORDER BY bin""".stripMargin)),

    // Missing-mass drift census (Drift.nanShare): events.value with a
    // planted NaN surge on the current side (event_id % 7 → NaN on top
    // of the fixture's organic nulls). The value-bin monitors exclude
    // non-finite rows by design; this gate pins the census that makes
    // the excluded mass visible.
    GateQuery(
      "q_drift_nan",
      (s, d) => {
        val ev = events(s, d)
        // operator ships full-precision shares; the GATE quantizes
        // once to ×1e6 integer units (see q_drift_psi)
        graft.operators.Drift.nanShare(
          ev.filter(col("event_id") % 2 === 0).select(col("value")),
          ev.filter(col("event_id") % 2 === 1)
            .select(when(col("event_id") % 7 === 0, lit(Double.NaN))
              .otherwise(col("value")).as("value")),
          "value")
          .select(col("n_ref"), col("n_bad_ref"), col("n_cur"), col("n_bad_cur"),
            // shares re-derived from the exact counts in integer
            // half-up arithmetic (delta as a single cross-multiplied
            // rational) — no double ratio is ever rounded
            expr("CAST((2 * CAST(n_bad_ref AS DECIMAL(38,0)) * 1000000" +
              " + greatest(n_ref, 1)) div (2 * greatest(n_ref, 1)) AS BIGINT)")
              .as("nan_share_ref_x1e6"),
            expr("CAST((2 * CAST(n_bad_cur AS DECIMAL(38,0)) * 1000000" +
              " + greatest(n_cur, 1)) div (2 * greatest(n_cur, 1)) AS BIGINT)")
              .as("nan_share_cur_x1e6"),
            expr("CAST((2 * abs(CAST(n_bad_cur AS DECIMAL(38,0)) * greatest(n_ref, 1)" +
              " - CAST(n_bad_ref AS DECIMAL(38,0)) * greatest(n_cur, 1)) * 1000000" +
              " + CAST(greatest(n_ref, 1) AS DECIMAL(38,0)) * greatest(n_cur, 1))" +
              " div (2 * CAST(greatest(n_ref, 1) AS DECIMAL(38,0)) * greatest(n_cur, 1))" +
              " AS BIGINT)").as("nan_share_delta_x1e6"))
      },
      Some("""WITH ref AS (
             |  SELECT CAST(value AS DOUBLE) AS v FROM events WHERE event_id % 2 = 0
             |), cur AS (
             |  SELECT CASE WHEN event_id % 7 = 0 THEN CAST('NaN' AS DOUBLE)
             |              ELSE CAST(value AS DOUBLE) END AS v
             |  FROM events WHERE event_id % 2 = 1
             |), r AS (
             |  SELECT count(*) AS n_ref,
             |         CAST(sum(CASE WHEN v IS NULL OR isnan(v) THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_ref
             |  FROM ref
             |), c AS (
             |  SELECT count(*) AS n_cur,
             |         CAST(sum(CASE WHEN v IS NULL OR isnan(v) THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_cur
             |  FROM cur
             |)
             |SELECT n_ref, n_bad_ref, n_cur, n_bad_cur,
             |       CAST((2 * CAST(n_bad_ref AS HUGEINT) * 1000000 + greatest(n_ref, 1))
             |            // (2 * greatest(n_ref, 1)) AS BIGINT) AS nan_share_ref_x1e6,
             |       CAST((2 * CAST(n_bad_cur AS HUGEINT) * 1000000 + greatest(n_cur, 1))
             |            // (2 * greatest(n_cur, 1)) AS BIGINT) AS nan_share_cur_x1e6,
             |       CAST((2 * abs(CAST(n_bad_cur AS HUGEINT) * greatest(n_ref, 1)
             |                     - CAST(n_bad_ref AS HUGEINT) * greatest(n_cur, 1)) * 1000000
             |             + CAST(greatest(n_ref, 1) AS HUGEINT) * greatest(n_cur, 1))
             |            // (2 * CAST(greatest(n_ref, 1) AS HUGEINT) * greatest(n_cur, 1))
             |            AS BIGINT) AS nan_share_delta_x1e6
             |FROM r, c""".stripMargin)),
  )
}
