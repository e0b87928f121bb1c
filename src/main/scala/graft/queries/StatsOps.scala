package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.{Curation, PrefixSum, RankStats, Skyline, Stats}

/** Gate queries for the statistics/readout extension family:
  * ANALYZE-style per-column table statistics (the CBO input a 100 TB
  * catalog needs), distributed 2-D skyline (Pareto front), the
  * deterministic Poisson bootstrap, doubly-robust off-policy
  * evaluation, multi-touch attribution, exact rolling medians, A/B
  * experiment readout, and positional phrase search. House rules
  * throughout: content-derived md5 randomness, exact integer/decimal
  * accumulation, half-up integer quantization at the projection, the
  * one accepted double class (correctly-rounded /,sqrt over
  * exact-integer-derived inputs, q_outliers precedent).
  */
object StatsOps {
  import Tables._
  import SharedOracles.{halfDivSpark, halfDivSql, bucketSql}

  /** The six profiled lineitem columns, as exact BIGINT projections
    * (timestamps as epoch micros — no float, no engine-specific
    * date-to-string rendering anywhere).
    */
  private val statColNames =
    Seq("l_linenumber", "l_orderkey", "l_partkey", "l_quantity",
      "l_shipdate_us", "l_suppkey")

  /** ONE ground truth for the 20-replicate Poisson bootstrap — shared
    * verbatim by the batch gate (q_bootstrap_ci) and the streaming
    * rollup parity gate (q_bootstrap_stream): replicate weights are
    * content-derived, so streaming delivery must reproduce the batch
    * table bit-for-bit.
    */
  private[queries] val BootstrapOracle: String =
    s"""WITH ev AS (
       |  SELECT event_id, CAST(round(value * 100) AS BIGINT) AS cents
       |  FROM events),
       |m AS (
       |  SELECT r.range AS rep,
       |         ${Stats.poissonCountSql(SharedOracles.bucketSql(
          "'boot:' || CAST(r.range AS VARCHAR) || ':' || CAST(ev.event_id AS VARCHAR)"))} AS m,
       |         ev.cents
       |  FROM ev CROSS JOIN range(20) r)
       |SELECT rep, CAST(sum(m) AS BIGINT) AS n_eff,
       |       CAST(sum(m * cents) AS BIGINT) AS wsum,
       |       ${SharedOracles.halfDivSql("CAST(sum(m * cents) AS HUGEINT) * 100",
          "CAST(sum(m) AS HUGEINT)")} AS mean_x100
       |FROM m GROUP BY rep ORDER BY rep""".stripMargin

  /** The CUSUM census over a (event_type, day, n, sc) daily relation
    * — shared by the batch gate and the streaming rollup parity gate
    * (daily (n, Σcents) partials are additive, so the streaming state
    * reconstructs this input exactly). Recurrence runs inside an
    * `aggregate()` fold over the ≤|days|-row per-action sequence.
    */
  private[queries] def cusumCensus(
      daily: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    daily
      .withColumn("mean_x100", expr(halfDivSpark("sc * 100", "n")))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_days"),
        sum("mean_x100").cast("long").as("_sm"),
        sort_array(collect_list(struct(col("day"), col("mean_x100"))))
          .as("_seq"))
      .withColumn("mu_x100", expr(halfDivSpark("_sm", "n_days")))
      .withColumn("_fold", expr(
        "aggregate(_seq," +
          " named_struct('s', 0L, 'smax', 0L, 'argd', -1L)," +
          " (acc, x) -> named_struct(" +
          "   's', greatest(0L, acc.s + (x.mean_x100 - mu_x100))," +
          "   'smax', CASE WHEN greatest(0L, acc.s + (x.mean_x100 - mu_x100)) > acc.smax" +
          "           THEN greatest(0L, acc.s + (x.mean_x100 - mu_x100)) ELSE acc.smax END," +
          "   'argd', CASE WHEN greatest(0L, acc.s + (x.mean_x100 - mu_x100)) > acc.smax" +
          "           THEN x.day ELSE acc.argd END))"))
      .select(col("event_type"), col("n_days"), col("mu_x100"),
        col("_fold.smax").as("max_cusum_x100"),
        col("_fold.argd").as("peak_day"))
      .orderBy("event_type")

  /** ONE ground truth for the CUSUM census — shared verbatim by
    * q_cusum_drift and the streaming rollup parity gate
    * q_cusum_stream.
    */
  private[queries] val CusumOracle: String =
    s"""WITH RECURSIVE ev AS (
              |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
              |         CAST(round(value * 100) AS BIGINT) AS cents
              |  FROM events),
              |daily AS (
              |  SELECT event_type, day, count(*) AS n,
              |         CAST(sum(cents) AS HUGEINT) AS sc
              |  FROM ev GROUP BY event_type, day),
              |m AS (
              |  SELECT event_type, day,
              |         ${halfDivSql("sc * 100", "n")} AS mean_x100,
              |         row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
              |  FROM daily),
              |mu AS (
              |  SELECT event_type, count(*) AS n_days,
              |         ${halfDivSql("CAST(sum(mean_x100) AS HUGEINT)", "count(*)")} AS mu_x100
              |  FROM m GROUP BY event_type),
              |c(event_type, rn, s, smax, argd) AS (
              |  SELECT m.event_type, 0, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
              |         CAST(-1 AS BIGINT)
              |  FROM (SELECT DISTINCT event_type FROM m) m
              |  UNION ALL
              |  SELECT c.event_type, c.rn + 1,
              |         greatest(0, c.s + (m.mean_x100 - mu.mu_x100)),
              |         CASE WHEN greatest(0, c.s + (m.mean_x100 - mu.mu_x100)) > c.smax
              |              THEN greatest(0, c.s + (m.mean_x100 - mu.mu_x100)) ELSE c.smax END,
              |         CASE WHEN greatest(0, c.s + (m.mean_x100 - mu.mu_x100)) > c.smax
              |              THEN m.day ELSE c.argd END
              |  FROM c
              |  JOIN m ON m.event_type = c.event_type AND m.rn = c.rn + 1
              |  JOIN mu ON mu.event_type = c.event_type)
              |SELECT c.event_type, mu.n_days, mu.mu_x100,
              |       CAST(c.smax AS BIGINT) AS max_cusum_x100,
              |       CAST(c.argd AS BIGINT) AS peak_day
              |FROM c JOIN mu ON mu.event_type = c.event_type
              |WHERE c.rn = mu.n_days
              |ORDER BY c.event_type""".stripMargin

  def queries: Seq[GateQuery] = Seq(

    // The ANALYZE feedback loop closed: measured stats (Cbo
    // .collectStats — the AnalyzeJob product) PIN the join strategy
    // instead of the optimizer's scan-size guess. nation's measured
    // ~2 KB fits the budget → broadcast; lineitem's measured bytes
    // exceed it → pinned sort-merge (a bad static estimate can never
    // buffer an unbounded build side). The gate asserts BOTH planned
    // strategies in-gate (loud requires on the executed plan) and the
    // oracle checks the join RESULT census — strategy must never
    // change the answer.
    GateQuery(
      "q_cbo_join",
      (s, d) => {
        import graft.operators.Cbo
        val nat = Tables.nation(s, d)
          .select(col("n_nationkey").as("s_nationkey"), col("n_name"))
        val li = Tables.lineitem(s, d)
          .select(col("l_suppkey"), col("l_quantity").cast("long").as("qty"))
        val natStats = Cbo.collectStats(nat, Seq("s_nationkey"))
        val liStats = Cbo.collectStats(li)
        // 64 KB budget: stats-scaled so the flip holds at every sf the
        // suite runs (nation is ~2 KB at any sf; the lineitem
        // projection is ≥96 KB from sf0.001 up)
        val budget = 64L << 10
        require(natStats.isKey("s_nationkey"),
          "q_cbo_join: nation key not measured unique")
        val supNat = Cbo.statsJoin(
          supplier(s, d).select("s_suppkey", "s_nationkey"),
          nat, natStats, Seq("s_nationkey"), broadcastBytes = budget)
        val joined = Cbo.statsJoin(
          supNat, li.withColumnRenamed("l_suppkey", "s_suppkey"),
          liStats, Seq("s_suppkey"), broadcastBytes = budget)
        val plan = joined.queryExecution.executedPlan.toString()
        require(plan.contains("BroadcastHashJoin"),
          s"q_cbo_join: stats said broadcast nation, plan disagrees:\n$plan")
        require(plan.contains("SortMergeJoin"),
          s"q_cbo_join: stats said shuffle-join lineitem, plan disagrees:\n$plan")
        joined.groupBy("n_name")
          .agg(countDistinct(col("s_suppkey")).as("n_suppliers"),
            sum("qty").cast("long").as("total_qty"))
          .orderBy("n_name")
      },
      Some("""SELECT n_name, count(DISTINCT s_suppkey) AS n_suppliers,
             |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
             |FROM supplier
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN lineitem ON l_suppkey = s_suppkey
             |GROUP BY n_name
             |ORDER BY n_name""".stripMargin)),

    // ANALYZE-style table statistics: per-column row/null/NDV/min/max
    // census — the stats relation a cost-based optimizer (join order,
    // broadcast thresholds, partition sizing) is fed from. ONE corpus
    // scan: Spark plans the 6 exact count-distincts as a single
    // Expand (×6 row replication map-side, partial aggs combine);
    // at 100 TB you would swap exact NDV for approx_count_distinct
    // and the plan shape would not change — the gate pins the exact
    // variant because the oracle can reproduce it.
    GateQuery(
      "q_table_stats",
      (s, d) => {
        // fanOut measured FLAT here (countDistinct expand is exchange-bound,
        // not scan-bound) — left on the plain scan
        val li = lineitem(s, d).select(
          col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_orderkey").as("l_orderkey"),
          col("l_partkey").as("l_partkey"),
          col("l_quantity").cast("long").as("l_quantity"),
          unix_micros(col("l_shipdate").cast("timestamp")).as("l_shipdate_us"),
          col("l_suppkey").as("l_suppkey"))
        val wide = li.agg(
          count(lit(1)).as("n_rows"),
          statColNames.flatMap(c => Seq(
            sum(col(c).isNull.cast("long")).as(s"nn_$c"),
            countDistinct(col(c)).as(s"nd_$c"),
            min(col(c)).as(s"mn_$c"),
            max(col(c)).as(s"mx_$c"))): _*)
        val stackArgs = statColNames
          .map(c => s"'$c', nn_$c, nd_$c, mn_$c, mx_$c").mkString(", ")
        wide.selectExpr("n_rows",
          s"stack(${statColNames.size}, $stackArgs)" +
            " as (col_name, n_nulls, ndv, min_v, max_v)")
          .select("col_name", "n_rows", "n_nulls", "ndv", "min_v", "max_v")
          .orderBy("col_name")
      },
      Some {
        val perCol = statColNames.map { c =>
          s"""SELECT '$c' AS col_name, count(*) AS n_rows,
             |       count(*) - count($c) AS n_nulls,
             |       count(DISTINCT $c) AS ndv,
             |       CAST(min($c) AS BIGINT) AS min_v,
             |       CAST(max($c) AS BIGINT) AS max_v FROM s""".stripMargin
        }.mkString("\n", "\nUNION ALL\n", "\n")
        s"""WITH s AS (
           |  SELECT CAST(l_linenumber AS BIGINT) AS l_linenumber,
           |         l_orderkey, l_partkey,
           |         CAST(l_quantity AS BIGINT) AS l_quantity,
           |         epoch_us(l_shipdate) AS l_shipdate_us,
           |         l_suppkey
           |  FROM lineitem)
           |SELECT * FROM ($perCol) ORDER BY col_name""".stripMargin
      }),

    // Distributed 2-D skyline (Pareto front) over part: cheapest-for-
    // the-size frontier (minimize retail cents, maximize size). The
    // engine never forms the quadratic dominance join — Skyline
    // reduces it to an exclusive prefix max over the price histogram
    // (PrefixSum range architecture: one exchange, bounded spine) +
    // one equi-join back; the oracle IS the quadratic NOT EXISTS, so
    // the gate is a true independent re-derivation.
    GateQuery(
      "q_pareto",
      (s, d) => {
        val p = part(s, d).select(
          col("p_partkey"),
          expr("CAST(round(p_retailprice * 100) AS BIGINT)").as("price_cents"),
          col("p_size").cast("long").as("size_v"))
        Skyline.pareto2d(p, "price_cents", "size_v")
          .select("p_partkey", "price_cents", "size_v")
          .orderBy("price_cents", "p_partkey")
      },
      Some("""WITH p AS (
             |  SELECT p_partkey,
             |         CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
             |         CAST(p_size AS BIGINT) AS size_v
             |  FROM part)
             |SELECT p_partkey, price_cents, size_v FROM p a
             |WHERE NOT EXISTS (
             |  SELECT 1 FROM p b
             |  WHERE b.price_cents <= a.price_cents AND b.size_v >= a.size_v
             |    AND (b.price_cents < a.price_cents OR b.size_v > a.size_v))
             |ORDER BY price_cents, p_partkey""".stripMargin)),

    // Per-brand Pareto front: the grouped skyline — dominance only
    // within a brand cohort (the per-domain frontier a model-selection
    // or per-source curation sweep asks for). Same histogram prefix-
    // max architecture, group-major range partitioning: a brand never
    // pins to one partition. Census output (frontier size + id/price
    // checksums per brand) keeps the gate row count brand-bounded
    // while still pinning exact membership.
    GateQuery(
      "q_pareto_grouped",
      (s, d) => {
        val p = part(s, d).select(
          col("p_brand"), col("p_partkey"),
          expr("CAST(round(p_retailprice * 100) AS BIGINT)").as("price_cents"),
          col("p_size").cast("long").as("size_v"))
        Skyline.pareto2d(p, "price_cents", "size_v",
            groupCols = Seq("p_brand"))
          .groupBy("p_brand")
          .agg(
            count(lit(1)).as("n_frontier"),
            sum(Curation.hashBucket(col("p_partkey").cast("string")))
              .cast("long").as("id_checksum"),
            sum("price_cents").cast("long").as("sum_price_cents"),
            max("size_v").as("max_size"))
          .orderBy("p_brand")
      },
      Some(s"""WITH p AS (
              |  SELECT p_brand, p_partkey,
              |         CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
              |         CAST(p_size AS BIGINT) AS size_v
              |  FROM part),
              |f AS (
              |  SELECT * FROM p a
              |  WHERE NOT EXISTS (
              |    SELECT 1 FROM p b
              |    WHERE b.p_brand = a.p_brand
              |      AND b.price_cents <= a.price_cents AND b.size_v >= a.size_v
              |      AND (b.price_cents < a.price_cents OR b.size_v > a.size_v)))
              |SELECT p_brand, count(*) AS n_frontier,
              |       CAST(sum(${bucketSql("CAST(p_partkey AS VARCHAR)")}) AS BIGINT) AS id_checksum,
              |       CAST(sum(price_cents) AS BIGINT) AS sum_price_cents,
              |       CAST(max(size_v) AS BIGINT) AS max_size
              |FROM f GROUP BY p_brand ORDER BY p_brand""".stripMargin)),

    // Deterministic Poisson bootstrap (the scale-out bootstrap): 20
    // replicates of the mean event value, each row contributing
    // m ~ Poisson(1) copies per replicate with m a pure function of
    // md5("boot:<rep>:<event_id>") — ONE corpus pass, map-side
    // explode, no corpus resampling shuffle, reproducible on any
    // layout. The inverse-CDF thresholds are rendered as identical
    // integer literals into both engines (Stats.poissonCountSql), so
    // a boundary disagreement is impossible by construction.
    GateQuery(
      "q_bootstrap_ci",
      (s, d) => {
        val ev = events(s, d)
          .withColumn("cents", round(col("value") * 100).cast("long"))
        Stats.poissonBootstrap(ev, col("event_id"), col("cents"), reps = 20)
          .withColumn("mean_x100", expr(halfDivSpark("wsum * 100", "n_eff")))
          .orderBy("rep")
      },
      Some(BootstrapOracle)),

    // Doubly-robust off-policy evaluation — the estimator that stays
    // consistent if EITHER the propensity model or the reward model
    // is right (Dudík et al., arXiv:1103.4601). Reward model q̂ =
    // per-action mean cents on the even-id fit split; importance
    // weight w = 1/p with the same exact-integer 25200/k propensity
    // as q_offpolicy_ips. The whole estimate is one exact rational:
    //   V·(2520·N·n_e) = 2520·S·n_e + N·Σw·c − S·Σw
    // (S,N = fit sum/count; sums over the odd-id eval split), carried
    // in DECIMAL(38,0)/HUGEINT and quantized once. Two scans of the
    // 5-row-keyed aggregates + one broadcast join.
    GateQuery(
      "q_offpolicy_dr",
      (s, d) => {
        val ev = events(s, d)
          .withColumn("cents", round(col("value") * 100).cast("long"))
          .withColumn("k",
            pmod(Curation.hashBucket(
              concat(lit("prop:"), col("event_id").cast("string"))), lit(9)) + 1)
          .withColumn("w_x2520", expr("25200L div k"))
        val fit = ev.filter(pmod(col("event_id"), lit(2)) === 0)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_fit"),
            sum("cents").cast("long").as("s_fit"))
        val eval = ev.filter(pmod(col("event_id"), lit(2)) === 1)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_eval"),
            sum("w_x2520").cast("long").as("sw"),
            sum(col("w_x2520") * col("cents")).cast("long").as("swc"))
        eval.join(broadcast(fit), Seq("event_type"))
          .withColumn("qhat_x100", expr(halfDivSpark("s_fit * 100", "n_fit")))
          .withColumn("ips_x1e4", expr(halfDivSpark(
            "CAST(swc AS DECIMAL(38,0)) * 10000", "2520 * n_eval")))
          .withColumn("dr_x1e4", expr(halfDivSpark(
            "(CAST(s_fit AS DECIMAL(38,0)) * 2520 * n_eval" +
              " + CAST(n_fit AS DECIMAL(38,0)) * swc" +
              " - CAST(s_fit AS DECIMAL(38,0)) * sw) * 10000",
            "CAST(n_fit AS DECIMAL(38,0)) * n_eval * 2520")))
          .select("event_type", "n_fit", "n_eval", "qhat_x100",
            "ips_x1e4", "dr_x1e4")
          .orderBy("event_type")
      },
      Some(s"""WITH ev AS (
              |  SELECT event_type, event_id,
              |         CAST(round(value * 100) AS BIGINT) AS cents,
              |         25200 // (${bucketSql("'prop:' || CAST(event_id AS VARCHAR)")} % 9 + 1) AS w
              |  FROM events),
              |fit AS (
              |  SELECT event_type, count(*) AS n_fit,
              |         CAST(sum(cents) AS HUGEINT) AS s_fit
              |  FROM ev WHERE event_id % 2 = 0 GROUP BY event_type),
              |ev2 AS (
              |  SELECT event_type, count(*) AS n_eval,
              |         CAST(sum(w) AS HUGEINT) AS sw,
              |         CAST(sum(w * cents) AS HUGEINT) AS swc
              |  FROM ev WHERE event_id % 2 = 1 GROUP BY event_type)
              |SELECT ev2.event_type, n_fit, n_eval,
              |       ${halfDivSql("s_fit * 100", "n_fit")} AS qhat_x100,
              |       ${halfDivSql("swc * 10000", "2520 * n_eval")} AS ips_x1e4,
              |       ${halfDivSql(
                 "(s_fit * 2520 * n_eval + n_fit * swc - s_fit * sw) * 10000",
                 "CAST(n_fit AS HUGEINT) * n_eval * 2520")} AS dr_x1e4
              |FROM ev2 JOIN fit ON ev2.event_type = fit.event_type
              |ORDER BY ev2.event_type""".stripMargin)),

    // Multi-touch attribution: every purchase's cents credited to the
    // view/click touches that preceded it in the same user timeline —
    // first-touch, last-touch, and linear (proportional) models in
    // ONE pass. All state is per-user windows over (ts, event_id)
    // total order (one shuffle on user_id, no self-join, no state
    // beyond the frame); linear credits are per-purchase exact
    // half-up integers summed — no float shares anywhere.
    GateQuery(
      "q_attribution",
      (s, d) => {
        val touch = when(col("event_type").isin("view", "click"),
          col("event_type"))
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val ev = events(s, d)
          .withColumn("cents", round(col("value") * 100).cast("long"))
          .withColumn("first_t", first(touch, ignoreNulls = true).over(w))
          .withColumn("last_t", last(touch, ignoreNulls = true).over(w))
          .withColumn("nv", coalesce(
            sum(when(col("event_type") === "view", 1L)).over(w), lit(0L)))
          .withColumn("nc", coalesce(
            sum(when(col("event_type") === "click", 1L)).over(w), lit(0L)))
        ev.filter(col("event_type") === "purchase")
          .agg(
            count(lit(1)).as("n_purchases"),
            coalesce(sum(when(col("nv") + col("nc") > 0, 1L)), lit(0L))
              .as("n_attributed"),
            coalesce(sum(when(col("first_t") === "view", col("cents"))), lit(0L))
              .as("first_view_cents"),
            coalesce(sum(when(col("first_t") === "click", col("cents"))), lit(0L))
              .as("first_click_cents"),
            coalesce(sum(when(col("last_t") === "view", col("cents"))), lit(0L))
              .as("last_view_cents"),
            coalesce(sum(when(col("last_t") === "click", col("cents"))), lit(0L))
              .as("last_click_cents"),
            coalesce(sum(when(col("nv") + col("nc") > 0,
              expr(halfDivSpark("cents * 100 * nv", "nv + nc")))), lit(0L))
              .cast("long").as("linear_view_x100"),
            coalesce(sum(when(col("nv") + col("nc") > 0,
              expr(halfDivSpark("cents * 100 * nc", "nv + nc")))), lit(0L))
              .cast("long").as("linear_click_x100"))
      },
      Some(s"""WITH ev AS (
              |  SELECT user_id, event_id, ts, event_type,
              |         CAST(round(value * 100) AS BIGINT) AS cents
              |  FROM events),
              |w AS (
              |  SELECT *,
              |         first_value(CASE WHEN event_type IN ('view', 'click')
              |                          THEN event_type END IGNORE NULLS)
              |           OVER win AS first_t,
              |         last_value(CASE WHEN event_type IN ('view', 'click')
              |                         THEN event_type END IGNORE NULLS)
              |           OVER win AS last_t,
              |         coalesce(sum(CASE WHEN event_type = 'view' THEN 1 END)
              |           OVER win, 0) AS nv,
              |         coalesce(sum(CASE WHEN event_type = 'click' THEN 1 END)
              |           OVER win, 0) AS nc
              |  FROM ev
              |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
              |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
              |p AS (SELECT * FROM w WHERE event_type = 'purchase')
              |SELECT count(*) AS n_purchases,
              |       CAST(coalesce(sum(CASE WHEN nv + nc > 0 THEN 1 END), 0) AS BIGINT) AS n_attributed,
              |       CAST(coalesce(sum(CASE WHEN first_t = 'view' THEN cents END), 0) AS BIGINT) AS first_view_cents,
              |       CAST(coalesce(sum(CASE WHEN first_t = 'click' THEN cents END), 0) AS BIGINT) AS first_click_cents,
              |       CAST(coalesce(sum(CASE WHEN last_t = 'view' THEN cents END), 0) AS BIGINT) AS last_view_cents,
              |       CAST(coalesce(sum(CASE WHEN last_t = 'click' THEN cents END), 0) AS BIGINT) AS last_click_cents,
              |       CAST(coalesce(sum(CASE WHEN nv + nc > 0 THEN ${halfDivSql("cents * 100 * nv", "nv + nc")} END), 0) AS BIGINT) AS linear_view_x100,
              |       CAST(coalesce(sum(CASE WHEN nv + nc > 0 THEN ${halfDivSql("cents * 100 * nc", "nv + nc")} END), 0) AS BIGINT) AS linear_click_x100
              |FROM p""".stripMargin)),

    // Exact rolling median (trailing-5 frame) per user timeline —
    // the robust sibling of q_rolling_stats' rolling sums. The frame
    // is BOUNDED (5 rows), so the per-row sorted-frame state is O(k),
    // not O(timeline); med2 = sum of the two middle order statistics
    // (2·median, exact integer — no even-count float averaging).
    GateQuery(
      "q_rolling_median",
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id")).rowsBetween(-4, 0)
        events(s, d)
          .withColumn("cents", round(col("value") * 100).cast("long"))
          .withColumn("_win", sort_array(collect_list("cents").over(w)))
          .withColumn("med2",
            element_at(col("_win"), expr("CAST((size(_win) + 1) div 2 AS INT)")) +
              element_at(col("_win"), expr("CAST((size(_win) + 2) div 2 AS INT)")))
          .groupBy("user_id")
          .agg(
            count(lit(1)).as("n_events"),
            sum("med2").cast("long").as("sum_med2"),
            max("med2").as("max_med2"))
          .orderBy("user_id")
      },
      Some("""WITH ev AS (
             |  SELECT user_id, event_id, ts,
             |         CAST(round(value * 100) AS BIGINT) AS cents
             |  FROM events),
             |r AS (
             |  SELECT user_id,
             |         list_sort(list(cents) OVER (PARTITION BY user_id
             |           ORDER BY ts, event_id
             |           ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)) AS l
             |  FROM ev),
             |m AS (
             |  SELECT user_id,
             |         l[CAST((len(l) + 1) // 2 AS INT)] +
             |         l[CAST((len(l) + 2) // 2 AS INT)] AS med2
             |  FROM r)
             |SELECT user_id, count(*) AS n_events,
             |       CAST(sum(med2) AS BIGINT) AS sum_med2,
             |       CAST(max(med2) AS BIGINT) AS max_med2
             |FROM m GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // A/B experiment readout: deterministic 50/50 user-hash split,
    // exact integer/decimal moments per variant, and the Welch
    // t-statistic from those exact moments — the q_outliers-class
    // double (correctly-rounded /,sqrt over identical exact-int
    // inputs, engine-identical; formula TEXT mirrored verbatim).
    // Mean difference is quantized as one exact rational, not a
    // difference of two roundings.
    GateQuery(
      "q_ab_readout",
      (s, d) => {
        val ev = events(s, d)
          .withColumn("cents", round(col("value") * 100).cast("long"))
          .withColumn("variant",
            pmod(Curation.hashBucket(
              concat(lit("ab:"), col("user_id").cast("string"))), lit(2)))
        val m = ev.agg(
          sum(when(col("variant") === 0, 1L).otherwise(0L)).as("na"),
          sum(when(col("variant") === 0, col("cents")).otherwise(0L))
            .cast("long").as("sa"),
          expr("sum(CASE WHEN variant = 0" +
            " THEN CAST(cents AS DECIMAL(38,0)) * cents ELSE 0 END)").as("ssa"),
          sum(when(col("variant") === 1, 1L).otherwise(0L)).as("nb"),
          sum(when(col("variant") === 1, col("cents")).otherwise(0L))
            .cast("long").as("sb"),
          expr("sum(CASE WHEN variant = 1" +
            " THEN CAST(cents AS DECIMAL(38,0)) * cents ELSE 0 END)").as("ssb"))
        m.withColumn("mean_a_x100", expr(halfDivSpark("sa * 100", "na")))
          .withColumn("mean_b_x100", expr(halfDivSpark("sb * 100", "nb")))
          .withColumn("diff_x100", expr(halfDivSpark(
            "(CAST(sa AS DECIMAL(38,0)) * nb - CAST(sb AS DECIMAL(38,0)) * na) * 100",
            "CAST(na AS DECIMAL(38,0)) * nb")))
          .withColumn("welch_t_x1e4", expr(
            "CAST(round((CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb)" +
              " / sqrt(((CAST(na AS DOUBLE) * CAST(ssa AS DOUBLE)" +
              "          - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))" +
              "         / (CAST(na AS DOUBLE) * (na - 1))) / na" +
              "        + ((CAST(nb AS DOUBLE) * CAST(ssb AS DOUBLE)" +
              "            - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))" +
              "           / (CAST(nb AS DOUBLE) * (nb - 1))) / nb)" +
              " * 10000) AS BIGINT)"))
          .select("na", "nb", "mean_a_x100", "mean_b_x100", "diff_x100",
            "welch_t_x1e4")
      },
      Some(s"""WITH ev AS (
              |  SELECT CAST(round(value * 100) AS BIGINT) AS cents,
              |         ${bucketSql("'ab:' || CAST(user_id AS VARCHAR)")} % 2 AS variant
              |  FROM events),
              |m AS (
              |  SELECT sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS na,
              |         CAST(sum(CASE WHEN variant = 0 THEN cents ELSE 0 END) AS HUGEINT) AS sa,
              |         sum(CASE WHEN variant = 0 THEN CAST(cents AS HUGEINT) * cents ELSE 0 END) AS ssa,
              |         sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS nb,
              |         CAST(sum(CASE WHEN variant = 1 THEN cents ELSE 0 END) AS HUGEINT) AS sb,
              |         sum(CASE WHEN variant = 1 THEN CAST(cents AS HUGEINT) * cents ELSE 0 END) AS ssb
              |  FROM ev)
              |SELECT CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
              |       ${halfDivSql("sa * 100", "na")} AS mean_a_x100,
              |       ${halfDivSql("sb * 100", "nb")} AS mean_b_x100,
              |       ${halfDivSql("(sa * nb - sb * na) * 100", "CAST(na AS HUGEINT) * nb")} AS diff_x100,
              |       CAST(round((CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb)
              |            / sqrt(((CAST(na AS DOUBLE) * CAST(ssa AS DOUBLE)
              |                     - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
              |                    / (CAST(na AS DOUBLE) * (na - 1))) / na
              |                   + ((CAST(nb AS DOUBLE) * CAST(ssb AS DOUBLE)
              |                       - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))
              |                      / (CAST(nb AS DOUBLE) * (nb - 1))) / nb)
              |            * 10000) AS BIGINT) AS welch_t_x1e4
              |FROM m""".stripMargin)),

    // CUPED variance-reduced A/B readout (Deng et al., WSDM'13): the
    // pre-period covariate adjustment every experimentation platform
    // applies before reading a diff. Per-user pre/post cent TOTALS
    // stay exact integers (day 19738 = 2024-01-16 splits the fixed
    // 30-day window); θ = pooled cov(x,y)/var(x) and the adjusted
    // diff are the accepted correctly-rounded-double class over exact
    // DECIMAL/HUGEINT moments (formula text mirrored verbatim); the
    // RAW diff ships as an exact rational for contrast. Only
    // user-level aggregates and one global moment row ever shuffle.
    GateQuery(
      "q_cuped",
      (s, d) => {
        val users = events(s, d)
          .withColumn("cents", round(col("value") * 100).cast("long"))
          .withColumn("day", expr("unix_micros(ts) div 86400000000L"))
          .groupBy("user_id")
          .agg(
            sum(when(col("day") < 19738, col("cents")).otherwise(0L))
              .cast("long").as("x"),
            sum(when(col("day") >= 19738, col("cents")).otherwise(0L))
              .cast("long").as("y"))
          .withColumn("variant",
            pmod(Curation.hashBucket(
              concat(lit("ab:"), col("user_id").cast("string"))), lit(2)))
        val m = users.agg(
          count(lit(1)).as("nu"),
          expr("sum(CAST(x AS DECIMAL(38,0)))").as("sx"),
          expr("sum(CAST(y AS DECIMAL(38,0)))").as("sy"),
          expr("sum(CAST(x AS DECIMAL(38,0)) * x)").as("sxx"),
          expr("sum(CAST(x AS DECIMAL(38,0)) * y)").as("sxy"),
          sum(when(col("variant") === 0, 1L).otherwise(0L)).as("na"),
          sum(when(col("variant") === 0, col("x")).otherwise(0L))
            .cast("long").as("sxa"),
          sum(when(col("variant") === 0, col("y")).otherwise(0L))
            .cast("long").as("sya"),
          sum(when(col("variant") === 1, 1L).otherwise(0L)).as("nb"),
          sum(when(col("variant") === 1, col("x")).otherwise(0L))
            .cast("long").as("sxb"),
          sum(when(col("variant") === 1, col("y")).otherwise(0L))
            .cast("long").as("syb"))
        m.withColumn("raw_diff_x100", expr(halfDivSpark(
            "(CAST(sya AS DECIMAL(38,0)) * nb - CAST(syb AS DECIMAL(38,0)) * na) * 100",
            "CAST(na AS DECIMAL(38,0)) * nb")))
          .withColumn("theta_x1e6", expr(
            "CAST(round((CAST(nu AS DOUBLE) * CAST(sxy AS DOUBLE)" +
              " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))" +
              " / (CAST(nu AS DOUBLE) * CAST(sxx AS DOUBLE)" +
              "    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))" +
              " * 1000000) AS BIGINT)"))
          .withColumn("adj_diff_x100", expr(
            "CAST(round(((CAST(sya AS DOUBLE) / na - CAST(syb AS DOUBLE) / nb)" +
              " - (CAST(nu AS DOUBLE) * CAST(sxy AS DOUBLE)" +
              "    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))" +
              "   / (CAST(nu AS DOUBLE) * CAST(sxx AS DOUBLE)" +
              "      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))" +
              "   * (CAST(sxa AS DOUBLE) / na - CAST(sxb AS DOUBLE) / nb))" +
              " * 100) AS BIGINT)"))
          .select("na", "nb", "raw_diff_x100", "theta_x1e6", "adj_diff_x100")
      },
      Some(s"""WITH ev AS (
              |  SELECT user_id,
              |         CAST(round(value * 100) AS BIGINT) AS cents,
              |         epoch_us(ts) // 86400000000 AS day
              |  FROM events),
              |u AS (
              |  SELECT user_id,
              |         CAST(sum(CASE WHEN day < 19738 THEN cents ELSE 0 END) AS HUGEINT) AS x,
              |         CAST(sum(CASE WHEN day >= 19738 THEN cents ELSE 0 END) AS HUGEINT) AS y,
              |         ${bucketSql("'ab:' || CAST(user_id AS VARCHAR)")} % 2 AS variant
              |  FROM ev GROUP BY user_id),
              |m AS (
              |  SELECT count(*) AS nu,
              |         sum(x) AS sx, sum(y) AS sy,
              |         sum(x * x) AS sxx, sum(x * y) AS sxy,
              |         sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS na,
              |         sum(CASE WHEN variant = 0 THEN x ELSE 0 END) AS sxa,
              |         sum(CASE WHEN variant = 0 THEN y ELSE 0 END) AS sya,
              |         sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS nb,
              |         sum(CASE WHEN variant = 1 THEN x ELSE 0 END) AS sxb,
              |         sum(CASE WHEN variant = 1 THEN y ELSE 0 END) AS syb
              |  FROM u)
              |SELECT CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
              |       ${halfDivSql("(sya * nb - syb * na) * 100", "CAST(na AS HUGEINT) * nb")} AS raw_diff_x100,
              |       CAST(round((CAST(nu AS DOUBLE) * CAST(sxy AS DOUBLE)
              |            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              |           / (CAST(nu AS DOUBLE) * CAST(sxx AS DOUBLE)
              |              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              |           * 1000000) AS BIGINT) AS theta_x1e6,
              |       CAST(round(((CAST(sya AS DOUBLE) / na - CAST(syb AS DOUBLE) / nb)
              |            - (CAST(nu AS DOUBLE) * CAST(sxy AS DOUBLE)
              |               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              |              / (CAST(nu AS DOUBLE) * CAST(sxx AS DOUBLE)
              |                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              |              * (CAST(sxa AS DOUBLE) / na - CAST(sxb AS DOUBLE) / nb))
              |            * 100) AS BIGINT) AS adj_diff_x100
              |FROM m""".stripMargin)),

    // Experiment POWER census: the minimum detectable effect at
    // α=0.05 / 80% power for the user-level metric, and the sample
    // size a target lift would need — the "is this experiment even
    // worth running" readout that completes the A/B family
    // (q_ab_readout, q_cuped). z constants are shared literals
    // rendered into both engines; σ² comes from exact DECIMAL/HUGEINT
    // user-total moments; the two published numbers are the accepted
    // correctly-rounded-double class (formula text mirrored).
    //   MDE = (z_a + z_b) · sqrt(2σ²/n_min)
    //   n_req(Δ = 10% of mean) = ceil(2σ²(z_a+z_b)² / Δ²)
    GateQuery(
      "q_power_mde",
      (s, d) => {
        val z = "2.8015971216" // z_{0.025} + z_{0.20} = 1.959964 + 0.841621
        val users = events(s, d)
          .withColumn("cents", round(col("value") * 100).cast("long"))
          .groupBy("user_id")
          .agg(sum("cents").cast("long").as("y"))
          .withColumn("variant",
            pmod(Curation.hashBucket(
              concat(lit("ab:"), col("user_id").cast("string"))), lit(2)))
        users.agg(
            count(lit(1)).as("nu"),
            expr("sum(CAST(y AS DECIMAL(38,0)))").as("sy"),
            expr("sum(CAST(y AS DECIMAL(38,0)) * y)").as("syy"),
            sum(when(col("variant") === 0, 1L).otherwise(0L)).as("na"),
            sum(when(col("variant") === 1, 1L).otherwise(0L)).as("nb"))
          .withColumn("var_x1", expr(
            "(CAST(nu AS DOUBLE) * CAST(syy AS DOUBLE)" +
              " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))" +
              " / (CAST(nu AS DOUBLE) * (nu - 1))"))
          .withColumn("mde_x100", expr(
            s"CAST(round($z * sqrt(2.0 * var_x1 / least(na, nb)) * 100) AS BIGINT)"))
          .withColumn("n_required", expr(
            s"CAST(ceil(2.0 * var_x1 * $z * $z" +
              " / ((CAST(sy AS DOUBLE) / nu * 0.1)" +
              "    * (CAST(sy AS DOUBLE) / nu * 0.1))) AS BIGINT)"))
          .select("nu", "na", "nb", "mde_x100", "n_required")
      },
      Some(s"""WITH ev AS (
              |  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents
              |  FROM events),
              |u AS (
              |  SELECT user_id, CAST(sum(cents) AS HUGEINT) AS y,
              |         ${bucketSql("'ab:' || CAST(user_id AS VARCHAR)")} % 2 AS variant
              |  FROM ev GROUP BY user_id),
              |m AS (
              |  SELECT count(*) AS nu, sum(y) AS sy, sum(y * y) AS syy,
              |         sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS na,
              |         sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS nb
              |  FROM u),
              |v AS (
              |  SELECT *,
              |         (CAST(nu AS DOUBLE) * CAST(syy AS DOUBLE)
              |          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
              |         / (CAST(nu AS DOUBLE) * (nu - 1)) AS var_x1
              |  FROM m)
              |SELECT CAST(nu AS BIGINT) AS nu, CAST(na AS BIGINT) AS na,
              |       CAST(nb AS BIGINT) AS nb,
              |       CAST(round(2.8015971216 * sqrt(2.0 * var_x1 / least(na, nb)) * 100) AS BIGINT) AS mde_x100,
              |       CAST(ceil(2.0 * var_x1 * 2.8015971216 * 2.8015971216
              |            / ((CAST(sy AS DOUBLE) / nu * 0.1)
              |               * (CAST(sy AS DOUBLE) / nu * 0.1))) AS BIGINT) AS n_required
              |FROM v""".stripMargin)),

    // Positional phrase search ("table value" adjacency): the engine
    // builds positional postings (posexplode) and answers the phrase
    // query as a postings SELF-JOIN on (doc_id, pos+1) — the
    // index-backed proximity-query plan, two filtered posting lists
    // meeting in one equi-join, never a full-document rescan per
    // query. The oracle is the opposite derivation (per-document
    // array scan), so the gate cross-checks plan families.
    GateQuery(
      "q_phrase_search",
      (s, d) => {
        val postings = documents(s, d)
          .withColumn("words", split(trim(col("text")), " "))
          .select(col("doc_id"), posexplode(col("words")).as(Seq("pos", "w")))
        // column renames on the second leg: both legs derive from the
        // SAME postings plan, so df-api column refs would be ambiguous
        val a = postings.filter(col("w") === "table")
          .select(col("doc_id"), col("pos").as("pos_a"))
        val b = postings.filter(col("w") === "value")
          .select(col("doc_id").as("doc_id_b"), col("pos").as("pos_b"))
        val hits = a.join(b,
          col("doc_id") === col("doc_id_b") && col("pos_b") === col("pos_a") + 1)
          .select("doc_id")
        val perDoc = hits.groupBy("doc_id").agg(count(lit(1)).as("n"))
        perDoc.agg(
          count(lit(1)).as("n_docs"),
          sum("n").cast("long").as("n_occurrences"),
          coalesce(sum(Curation.hashBucket(col("doc_id").cast("string"))), lit(0L))
            .cast("long").as("id_checksum"))
      },
      Some(s"""WITH w AS (
              |  SELECT doc_id, string_split(trim(text), ' ') AS words
              |  FROM documents),
              |c AS (
              |  SELECT doc_id,
              |         CASE WHEN len(words) >= 2 THEN
              |           len(list_filter(range(len(words) - 1),
              |                 i -> words[CAST(i + 1 AS INT)] = 'table'
              |                  AND words[CAST(i + 2 AS INT)] = 'value'))
              |         ELSE 0 END AS n
              |  FROM w)
              |SELECT count(*) FILTER (WHERE n > 0) AS n_docs,
              |       CAST(coalesce(sum(n), 0) AS BIGINT) AS n_occurrences,
              |       CAST(coalesce(sum(CASE WHEN n > 0 THEN ${bucketSql("CAST(doc_id AS VARCHAR)")} END), 0) AS BIGINT) AS id_checksum
              |FROM c""".stripMargin)),

    // Grouped exact WEIGHTED median — distributed order statistics
    // over a weight mass, the robust location estimate sampling-
    // weighted corpora need. The engine never single-partitions a
    // group: per-(type, cents) histogram → GROUPED exclusive prefix
    // sums (PrefixSum range architecture: one exchange, parallel
    // windows, bounded spine) → the crossing row where the cumulative
    // weight first reaches half the group total. Weights are
    // content-derived integers (1..5), the lower weighted median is
    // picked by exact integer inequalities — no interpolation floats.
    GateQuery(
      "q_weighted_median",
      (s, d) => {
        val ev = events(s, d)
          .withColumn("cents", round(col("value") * 100).cast("long"))
          .withColumn("w",
            pmod(Curation.hashBucket(
              concat(lit("wm:"), col("event_id").cast("string"))), lit(5)) + 1)
        RankStats.weightedMedian(ev, "cents", col("w"),
            groupCols = Seq("event_type"), medianCol = "median_cents")
          .select(col("event_type"), col("total").as("w_total"),
            col("median_cents"))
          .orderBy("event_type")
      },
      Some(s"""WITH ev AS (
              |  SELECT event_type,
              |         CAST(round(value * 100) AS BIGINT) AS cents,
              |         ${bucketSql("'wm:' || CAST(event_id AS VARCHAR)")} % 5 + 1 AS w
              |  FROM events),
              |h AS (
              |  SELECT event_type, cents, CAST(sum(w) AS BIGINT) AS wc
              |  FROM ev GROUP BY event_type, cents),
              |c AS (
              |  SELECT *,
              |         coalesce(sum(wc) OVER (PARTITION BY event_type
              |           ORDER BY cents
              |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              |           AS cum_excl,
              |         sum(wc) OVER (PARTITION BY event_type) AS w_total
              |  FROM h)
              |SELECT event_type, CAST(w_total AS BIGINT) AS w_total,
              |       cents AS median_cents
              |FROM c
              |WHERE 2 * (cum_excl + wc) >= w_total AND 2 * cum_excl < w_total
              |ORDER BY event_type""".stripMargin)),

    // Split-conformal prediction threshold (90% coverage): per
    // action, the reward model is the even-id fit-split mean kept as
    // the EXACT rational S/N, calibration residuals on the odd-id
    // split are |cents·N − S| (scaled ×N so they stay integers), and
    // the conformal quantile is the k-th smallest residual with
    // k = ceil(0.9·(n_cal+1)) — exact distributed rank selection over
    // the grouped residual histogram, same PrefixSum shape as the
    // weighted median, never a per-group sort on one partition.
    GateQuery(
      "q_conformal",
      (s, d) => {
        val ev = events(s, d)
          .withColumn("cents", round(col("value") * 100).cast("long"))
        val fit = ev.filter(pmod(col("event_id"), lit(2)) === 0)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_fit"), sum("cents").cast("long").as("s_fit"))
        val cal = ev.filter(pmod(col("event_id"), lit(2)) === 1)
          .join(broadcast(fit), Seq("event_type"))
          .withColumn("resid_xn", abs(col("cents") * col("n_fit") - col("s_fit")))
        // n_fit rides along as a group key (constant within
        // event_type), so the selected row still carries the scale
        RankStats.kthValue(cal, "resid_xn", lit(1L),
            groupCols = Seq("event_type", "n_fit"),
            k = expr("(9 * (total + 1) + 9) div 10"))
          .select(col("event_type"), col("n_fit"),
            col("total").as("n_cal"), col("k"),
            col("resid_xn").as("thresh_resid_xn"))
          .orderBy("event_type")
      },
      Some("""WITH ev AS (
             |  SELECT event_type, event_id,
             |         CAST(round(value * 100) AS BIGINT) AS cents
             |  FROM events),
             |fit AS (
             |  SELECT event_type, count(*) AS n_fit,
             |         CAST(sum(cents) AS BIGINT) AS s_fit
             |  FROM ev WHERE event_id % 2 = 0 GROUP BY event_type),
             |cal AS (
             |  SELECT ev.event_type, n_fit,
             |         abs(cents * n_fit - s_fit) AS resid_xn
             |  FROM ev JOIN fit ON ev.event_type = fit.event_type
             |  WHERE event_id % 2 = 1),
             |h AS (
             |  SELECT event_type, n_fit, resid_xn, count(*) AS cnt
             |  FROM cal GROUP BY event_type, n_fit, resid_xn),
             |c AS (
             |  SELECT *,
             |         coalesce(sum(cnt) OVER (PARTITION BY event_type
             |           ORDER BY resid_xn
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |           AS cum_excl,
             |         sum(cnt) OVER (PARTITION BY event_type) AS n_cal
             |  FROM h)
             |SELECT event_type, CAST(n_fit AS BIGINT) AS n_fit,
             |       CAST(n_cal AS BIGINT) AS n_cal,
             |       CAST((9 * (n_cal + 1) + 9) // 10 AS BIGINT) AS k,
             |       resid_xn AS thresh_resid_xn
             |FROM c
             |WHERE cum_excl < (9 * (n_cal + 1) + 9) // 10
             |  AND cum_excl + cnt >= (9 * (n_cal + 1) + 9) // 10
             |ORDER BY event_type""".stripMargin)),

    // Equi-DEPTH histogram (10 exact decile boundaries of lineitem
    // price cents) — the NDV-aware companion of q_histogram's
    // equi-width bins and the other CBO input next to q_table_stats.
    // Boundary j = the ceil(j·n/10)-th smallest value, selected
    // exactly: price histogram → GLOBAL exclusive prefix counts (one
    // range exchange, bounded spine) → a broadcast join against the
    // 10-row target-rank relation picks each crossing row. At 100 TB
    // the same plan stands — only the ≤|distinct price| histogram and
    // 10 target rows ever concentrate.
    GateQuery(
      "q_equidepth_hist",
      (s, d) => {
        // fanOut measured 2.5x WORSE here (range-exchange sampling over 32
        // input partitions dominates) — left on the plain scan
        val li = lineitem(s, d)
          .withColumn("cents",
            expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
        val cum = RankStats.cumHistogram(li, "cents", lit(1L), Nil)
        val targets = s.range(1, 11)
          .select(col("id").cast("long").as("bucket"))
        cum.crossJoin(broadcast(targets))
          .withColumn("target", expr("(bucket * total + 9) div 10"))
          .filter(col("cum_excl") < col("target") &&
            col("cum_excl") + col("mass") >= col("target"))
          .select(col("bucket"), col("total").as("n_rows"),
            col("target"), col("cents").as("boundary_cents"))
          .orderBy("bucket")
      },
      Some("""WITH li AS (
             |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
             |  FROM lineitem),
             |h AS (SELECT cents, count(*) AS cnt FROM li GROUP BY cents),
             |c AS (
             |  SELECT *,
             |         coalesce(sum(cnt) OVER (ORDER BY cents
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |           AS cum_excl,
             |         sum(cnt) OVER () AS n_rows
             |  FROM h),
             |t AS (SELECT range AS bucket FROM range(1, 11))
             |SELECT bucket, CAST(c.n_rows AS BIGINT) AS n_rows,
             |       CAST((bucket * c.n_rows + 9) // 10 AS BIGINT) AS target,
             |       cents AS boundary_cents
             |FROM c JOIN t
             |  ON cum_excl < (bucket * c.n_rows + 9) // 10
             | AND cum_excl + cnt >= (bucket * c.n_rows + 9) // 10
             |ORDER BY bucket""".stripMargin)),

    // Leave-one-source-out ablation (data valuation census): for each
    // document source, how the corpus-wide mean token count moves if
    // that source is dropped — the cheapest honest "is this source
    // pulling quality up or down" readout (the group-level analogue
    // of influence functions). Everything is exact rationals from ONE
    // scan: per-source (N_j, S_j) + the global (N, S) broadcast back;
    // delta = (S·N_j − S_j·N) / (N·(N−N_j)) quantized once, signed
    // half-away — never a difference of two roundings.
    GateQuery(
      "q_source_ablation",
      (s, d) => {
        val docs = documents(s, d)
          .withColumn("n_tok", size(split(trim(col("text")), " ")).cast("long"))
        val per = docs.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_tok").cast("long").as("sum_tok"))
        val tot = docs.agg(count(lit(1)).as("n_all"),
          sum("n_tok").cast("long").as("s_all"))
        per.crossJoin(broadcast(tot))
          .withColumn("mean_x100", expr(halfDivSpark("sum_tok * 100", "n_docs")))
          .withColumn("loo_mean_x100", expr(halfDivSpark(
            "(s_all - sum_tok) * 100", "n_all - n_docs")))
          .withColumn("delta_x1e4", expr(halfDivSpark(
            "(CAST(s_all AS DECIMAL(38,0)) * n_docs" +
              " - CAST(sum_tok AS DECIMAL(38,0)) * n_all) * 10000",
            "CAST(n_all AS DECIMAL(38,0)) * (n_all - n_docs)")))
          .select("source", "n_docs", "sum_tok", "mean_x100",
            "loo_mean_x100", "delta_x1e4")
          .orderBy("source")
      },
      Some(s"""WITH t AS (
              |  SELECT source,
              |         CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tok
              |  FROM documents),
              |per AS (
              |  SELECT source, count(*) AS n_docs,
              |         CAST(sum(n_tok) AS HUGEINT) AS sum_tok
              |  FROM t GROUP BY source),
              |tot AS (
              |  SELECT count(*) AS n_all, CAST(sum(n_tok) AS HUGEINT) AS s_all
              |  FROM t)
              |SELECT source, n_docs, CAST(sum_tok AS BIGINT) AS sum_tok,
              |       ${halfDivSql("sum_tok * 100", "n_docs")} AS mean_x100,
              |       ${halfDivSql("(s_all - sum_tok) * 100", "n_all - n_docs")} AS loo_mean_x100,
              |       ${halfDivSql("(s_all * n_docs - sum_tok * n_all) * 10000",
                 "CAST(n_all AS HUGEINT) * (n_all - n_docs)")} AS delta_x1e4
              |FROM per CROSS JOIN tot
              |ORDER BY source""".stripMargin)),

    // Exact 10%-trimmed mean per action — the outlier-robust mean
    // between the q_weighted_median point estimate and q_winsorize's
    // clamping. No per-group sort: the (type, cents) histogram gets
    // grouped exclusive prefix counts, and each histogram row
    // contributes the exact overlap of its rank interval
    // [cum_excl+1, cum_excl+cnt] with the retained band
    // [lo+1, n−lo] (lo = n div 10) — trimmed sum and mean fall out as
    // integer arithmetic over the NDV-bounded relation.
    GateQuery(
      "q_trimmed_mean",
      (s, d) => {
        val ev = events(s, d)
          .withColumn("cents", round(col("value") * 100).cast("long"))
        RankStats.trimmedSum(ev, "cents", lit(1L),
            groupCols = Seq("event_type"), num = 1, den = 10)
          .select(col("event_type"), col("total").as("n"), col("lo"),
            col("trim_sum"))
          .withColumn("trimmed_mean_x100", expr(halfDivSpark(
            "trim_sum * 100", "n - 2 * lo")))
          .orderBy("event_type")
      },
      Some(s"""WITH ev AS (
              |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
              |  FROM events),
              |h AS (
              |  SELECT event_type, cents, count(*) AS cnt
              |  FROM ev GROUP BY event_type, cents),
              |c AS (
              |  SELECT *,
              |         coalesce(sum(cnt) OVER (PARTITION BY event_type
              |           ORDER BY cents
              |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              |           AS cum_excl,
              |         sum(cnt) OVER (PARTITION BY event_type) AS n
              |  FROM h),
              |k AS (
              |  SELECT event_type, n, n // 10 AS lo,
              |         greatest(0, least(cum_excl + cnt, n - n // 10)
              |                      - greatest(cum_excl, n // 10)) * cents AS part
              |  FROM c)
              |SELECT event_type, CAST(n AS BIGINT) AS n,
              |       CAST(lo AS BIGINT) AS lo,
              |       CAST(sum(part) AS BIGINT) AS trim_sum,
              |       ${halfDivSql("CAST(sum(part) AS HUGEINT) * 100", "n - 2 * lo")} AS trimmed_mean_x100
              |FROM k GROUP BY event_type, n, lo
              |ORDER BY event_type""".stripMargin)),

    // Per-source percentile FILTER (keep each source's top decile by
    // token count) — the curation shape "per-domain quality bar":
    // the bar itself is an exact order statistic (smallest value with
    // cumulative count ≥ ceil(0.9·n), RankStats.kthValue), broadcast
    // back as a 20-row relation; the corpus pass is one scan + one
    // broadcast join + a filter. Census pins the exact surviving set.
    GateQuery(
      "q_percentile_filter",
      (s, d) => {
        val docs = documents(s, d)
          .withColumn("n_tok", size(split(trim(col("text")), " ")).cast("long"))
        val bars = RankStats.kthValue(docs, "n_tok", lit(1L),
            groupCols = Seq("source"), k = expr("(9 * total + 9) div 10"))
          .select(col("source"), col("n_tok").as("p90_tok"))
        docs.join(broadcast(bars), Seq("source"))
          .filter(col("n_tok") >= col("p90_tok"))
          .groupBy("source")
          .agg(
            count(lit(1)).as("n_kept"),
            min("n_tok").as("min_kept_tok"),
            max("n_tok").as("max_kept_tok"),
            sum(Curation.hashBucket(col("doc_id").cast("string")))
              .cast("long").as("id_checksum"))
          .orderBy("source")
      },
      Some(s"""WITH t AS (
              |  SELECT source, doc_id,
              |         CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tok
              |  FROM documents),
              |h AS (
              |  SELECT source, n_tok, count(*) AS cnt
              |  FROM t GROUP BY source, n_tok),
              |c AS (
              |  SELECT *,
              |         sum(cnt) OVER (PARTITION BY source ORDER BY n_tok) AS cum_incl,
              |         sum(cnt) OVER (PARTITION BY source) AS n
              |  FROM h),
              |bars AS (
              |  SELECT source, min(n_tok) AS p90_tok
              |  FROM c WHERE cum_incl >= (9 * n + 9) // 10
              |  GROUP BY source)
              |SELECT t.source, count(*) AS n_kept,
              |       CAST(min(n_tok) AS BIGINT) AS min_kept_tok,
              |       CAST(max(n_tok) AS BIGINT) AS max_kept_tok,
              |       CAST(sum(${bucketSql("CAST(doc_id AS VARCHAR)")}) AS BIGINT) AS id_checksum
              |FROM t JOIN bars ON t.source = bars.source
              |WHERE t.n_tok >= bars.p90_tok
              |GROUP BY t.source ORDER BY t.source""".stripMargin)),

    // Token-BUDGET greedy selection: keep the highest-quality
    // documents whose cumulative token cost fits a byte/token budget
    // (here 25% of the corpus) — the knapsack-greedy shape every
    // "best data under a training budget" curation sweep uses. The
    // greedy order is an exclusive prefix sum of token costs over a
    // UNIQUE packed key (score·2^40 + doc_id — score ≤ 1e6 so the
    // product fits a long, and doc_id stays < 2^40 even under the
    // x10 stress replicas' +r·10^7 id shift, so ties stay impossible;
    // PrefixSum requires distinct order keys and this constructs
    // them), and the cut is the exact
    // prefix-feasible rule cum_excl + cost ≤ B. One corpus scan, one
    // range exchange, broadcast totals.
    GateQuery(
      "q_budget_select",
      (s, d) => {
        val stop = Seq("the", "a", "and", "of", "to", "in", "is")
          .map(w => s"'$w'").mkString(", ")
        val docs = documents(s, d)
          .withColumn("words", split(trim(col("text")), " "))
          .withColumn("n_tok", size(col("words")).cast("long"))
          .withColumn("score",
            expr(s"(size(filter(words, w -> w IN ($stop))) * 1000000L)" +
              " div n_tok"))
          .withColumn("key", col("score") * lit(1L << 40) + col("doc_id"))
        val cum = PrefixSum.rangeExclusive(
          docs.select("doc_id", "n_tok", "score", "key"),
          "key", descending = true, Seq("n_tok" -> "cum_excl"))
        val budget = cum.agg(
          expr("max(cum_excl + n_tok) div 4").as("b"))
        cum.crossJoin(broadcast(budget))
          .filter(col("cum_excl") + col("n_tok") <= col("b"))
          .agg(
            count(lit(1)).as("n_kept"),
            sum("n_tok").cast("long").as("tok_used"),
            min("score").as("min_score_kept"),
            max("b").as("budget_tok"),
            sum(Curation.hashBucket(col("doc_id").cast("string")))
              .cast("long").as("id_checksum"))
      },
      Some(s"""WITH t AS (
              |  SELECT doc_id, string_split(trim(text), ' ') AS words
              |  FROM documents),
              |sc AS (
              |  SELECT doc_id,
              |         CAST(len(words) AS BIGINT) AS n_tok,
              |         (CAST(len(list_filter(words,
              |            w -> w IN ('the', 'a', 'and', 'of', 'to', 'in', 'is'))) AS BIGINT)
              |          * 1000000) // CAST(len(words) AS BIGINT) AS score
              |  FROM t),
              |k AS (
              |  SELECT *, score * 1099511627776 + doc_id AS key FROM sc),
              |c AS (
              |  SELECT *,
              |         coalesce(sum(n_tok) OVER (ORDER BY key DESC
              |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              |           AS cum_excl,
              |         sum(n_tok) OVER () AS total
              |  FROM k)
              |SELECT count(*) AS n_kept,
              |       CAST(sum(n_tok) AS BIGINT) AS tok_used,
              |       CAST(min(score) AS BIGINT) AS min_score_kept,
              |       CAST(min(total) // 4 AS BIGINT) AS budget_tok,
              |       CAST(sum(${bucketSql("CAST(doc_id AS VARCHAR)")}) AS BIGINT) AS id_checksum
              |FROM c
              |WHERE cum_excl + n_tok <= total // 4""".stripMargin)),

    // Recommendation-list quality census: catalog coverage@5 (how
    // much of the corpus the top-5 lists actually reach) and
    // intra-list diversity (mean pairwise cosine inside each list —
    // high = redundant lists) over the bounded anchor set. Beyond
    // nDCG/MRR's relevance-only view, these are the standard list-
    // health metrics. Anchors are absolutely bounded, so the scoring
    // scan is corpus-linear; the pair relation is |anchors|·k² — a
    // constant-sized relation joined back to the vectors twice.
    GateQuery(
      "q_reco_diversity",
      (s, d) => {
        val e = fanOut(embeddings(s, d)).withColumn("v",  // 1-file scan feeds anchors-x-corpus cosines (Tables.fanOut doc)
          transform(col("embedding"), x => x.cast("double")))
        def sumSq(v: org.apache.spark.sql.Column) =
          aggregate(transform(v, x => x * x), lit(0.0), (acc, x) => acc + x)
        def cosX1e4(a: org.apache.spark.sql.Column,
            b: org.apache.spark.sql.Column) =
          round(graft.operators.Ann.dot(a, b) /
            (sqrt(sumSq(a)) * sqrt(sumSq(b))) * 10000).cast("long")
        val anchors = broadcast(
          e.filter(col("vec_id") % 7 === 0 && col("vec_id") < 700)
            .select(col("vec_id").as("anchor_id"), col("v").as("av")))
        val w = Window.partitionBy("anchor_id")
          .orderBy(desc("cos_x1e4"), asc("n_id"))
        val lists = e.select(col("vec_id").as("n_id"), col("v"))
          .join(anchors, col("n_id") =!= col("anchor_id"))
          .withColumn("cos_x1e4", cosX1e4(col("v"), col("av")))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 5)
          .select("anchor_id", "rnk", "n_id")
        val pairs = lists.select(col("anchor_id"), col("rnk").as("r1"),
            col("n_id").as("id1"))
          .join(lists.select(col("anchor_id"), col("rnk").as("r2"),
            col("n_id").as("id2")), Seq("anchor_id"))
          .filter(col("r1") < col("r2"))
          .join(e.select(col("vec_id").as("id1"), col("v").as("v1")), Seq("id1"))
          .join(e.select(col("vec_id").as("id2"), col("v").as("v2")), Seq("id2"))
          .withColumn("pcos", cosX1e4(col("v1"), col("v2")))
        pairs.agg(
            countDistinct("anchor_id").as("n_anchors"),
            count(lit(1)).as("n_pairs"),
            sum("pcos").cast("long").as("_sp"))
          .withColumn("mean_pair_cos_x1e4", expr(halfDivSpark("_sp", "n_pairs")))
          .drop("_sp")
          .crossJoin(lists.agg(countDistinct("n_id").as("n_unique")))
          .crossJoin(e.agg(count(lit(1)).as("n_catalog")))
          .withColumn("coverage_x1e6", expr(halfDivSpark(
            "n_unique * 1000000", "n_catalog")))
      },
      Some(s"""WITH e AS (
              |  SELECT vec_id,
              |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              |  FROM embeddings),
              |a AS (SELECT vec_id AS anchor_id, v AS av
              |      FROM e WHERE vec_id % 7 = 0 AND vec_id < 700),
              |sc AS (
              |  SELECT a.anchor_id, e.vec_id AS n_id,
              |         CAST(round(
              |           list_sum(list_transform(list_zip(e.v, a.av),
              |                                   p -> struct_extract(p, 1) * struct_extract(p, 2)))
              |           / (sqrt(list_sum(list_transform(e.v, x -> x * x)))
              |              * sqrt(list_sum(list_transform(a.av, x -> x * x)))) * 10000)
              |         AS BIGINT) AS cos_x1e4
              |  FROM a JOIN e ON e.vec_id <> a.anchor_id),
              |top AS (
              |  SELECT * FROM (
              |    SELECT anchor_id, n_id,
              |           row_number() OVER (PARTITION BY anchor_id
              |             ORDER BY cos_x1e4 DESC, n_id ASC) AS rnk
              |    FROM sc) WHERE rnk <= 5),
              |pc AS (
              |  SELECT p.anchor_id,
              |         CAST(round(
              |           list_sum(list_transform(list_zip(e1.v, e2.v),
              |                                   q -> struct_extract(q, 1) * struct_extract(q, 2)))
              |           / (sqrt(list_sum(list_transform(e1.v, x -> x * x)))
              |              * sqrt(list_sum(list_transform(e2.v, x -> x * x)))) * 10000)
              |         AS BIGINT) AS pcos
              |  FROM (SELECT t1.anchor_id, t1.n_id AS id1, t2.n_id AS id2
              |        FROM top t1 JOIN top t2
              |          ON t1.anchor_id = t2.anchor_id AND t1.rnk < t2.rnk) p
              |  JOIN e e1 ON e1.vec_id = p.id1
              |  JOIN e e2 ON e2.vec_id = p.id2),
              |cov AS (SELECT count(DISTINCT n_id) AS n_unique FROM top),
              |cat AS (SELECT count(*) AS n_catalog FROM e)
              |SELECT count(DISTINCT anchor_id) AS n_anchors,
              |       count(*) AS n_pairs,
              |       ${halfDivSql("CAST(sum(pcos) AS HUGEINT)", "count(*)")} AS mean_pair_cos_x1e4,
              |       n_unique, n_catalog,
              |       ${halfDivSql("CAST(n_unique AS HUGEINT) * 1000000", "n_catalog")} AS coverage_x1e6
              |FROM pc, cov, cat
              |GROUP BY n_unique, n_catalog""".stripMargin)),

    // CUSUM change-point census (per action, daily means): the
    // classic drift detector the PSI/KS gates don't cover — a
    // SEQUENTIAL recurrence s_t = max(0, s_{t-1} + (m_t − μ)) whose
    // peak localizes when a shift started, not just that one exists.
    // The corpus work is ONE distributed daily aggregate; the
    // recurrence runs over the ≤|days|-row per-action sequence inside
    // an `aggregate()` fold (the bounded-spine exception — days, not
    // rows, and exact ×100 integers end to end). The oracle replays
    // the identical recurrence as a recursive CTE — same update, same
    // strict-improvement argmax, same empty-start conventions.
    GateQuery(
      "q_cusum_drift",
      (s, d) => cusumCensus(
        events(s, d)
          .withColumn("cents", round(col("value") * 100).cast("long"))
          .groupBy(col("event_type"),
            expr("unix_micros(ts) div 86400000000L").as("day"))
          .agg(count(lit(1)).as("n"), sum("cents").cast("long").as("sc"))),
      Some(CusumOracle)),

    // Forecast-baseline evaluation census: naive (yesterday) vs
    // seasonal-naive (same weekday last week) one-step forecasts of
    // each action's daily mean, scored by exact-integer MAE — the
    // baseline pair every forecasting pipeline must beat before a
    // model earns its keep. One distributed daily aggregate; the lag
    // windows run over the ≤|days|-row per-action relation (bounded
    // spine); absolute errors and counts ship as exact sums alongside
    // the quantized MAEs, so downstream comparisons need no
    // re-rounding.
    GateQuery(
      "q_forecast_baseline",
      (s, d) => {
        val w = Window.partitionBy("event_type").orderBy("day")
        val daily = events(s, d)
          .withColumn("cents", round(col("value") * 100).cast("long"))
          .groupBy(col("event_type"),
            expr("unix_micros(ts) div 86400000000L").as("day"))
          .agg(count(lit(1)).as("n"), sum("cents").cast("long").as("sc"))
          .withColumn("m", expr(halfDivSpark("sc * 100", "n")))
          .withColumn("p1", lag("m", 1).over(w))
          .withColumn("p7", lag("m", 7).over(w))
        daily.groupBy("event_type")
          .agg(
            count(lit(1)).as("n_days"),
            sum(when(col("p1").isNotNull, 1L)).cast("long").as("n1"),
            coalesce(sum(abs(col("m") - col("p1"))), lit(0L)).cast("long")
              .as("sum_abs1"),
            sum(when(col("p7").isNotNull, 1L)).cast("long").as("n7"),
            coalesce(sum(abs(col("m") - col("p7"))), lit(0L)).cast("long")
              .as("sum_abs7"))
          .withColumn("mae_naive_x100", expr(halfDivSpark("sum_abs1", "n1")))
          .withColumn("mae_seasonal_x100", expr(halfDivSpark("sum_abs7", "n7")))
          .orderBy("event_type")
      },
      Some(s"""WITH ev AS (
              |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
              |         CAST(round(value * 100) AS BIGINT) AS cents
              |  FROM events),
              |daily AS (
              |  SELECT event_type, day, count(*) AS n,
              |         CAST(sum(cents) AS HUGEINT) AS sc
              |  FROM ev GROUP BY event_type, day),
              |m AS (
              |  SELECT event_type, day, ${halfDivSql("sc * 100", "n")} AS m
              |  FROM daily),
              |l AS (
              |  SELECT event_type, m,
              |         lag(m, 1) OVER (PARTITION BY event_type ORDER BY day) AS p1,
              |         lag(m, 7) OVER (PARTITION BY event_type ORDER BY day) AS p7
              |  FROM m),
              |g AS (
              |  SELECT event_type, count(*) AS n_days,
              |         count(p1) AS n1,
              |         CAST(coalesce(sum(abs(m - p1)), 0) AS BIGINT) AS sum_abs1,
              |         count(p7) AS n7,
              |         CAST(coalesce(sum(abs(m - p7)), 0) AS BIGINT) AS sum_abs7
              |  FROM l GROUP BY event_type)
              |SELECT event_type, n_days, n1, sum_abs1, n7, sum_abs7,
              |       ${halfDivSql("sum_abs1", "n1")} AS mae_naive_x100,
              |       ${halfDivSql("sum_abs7", "n7")} AS mae_seasonal_x100
              |FROM g ORDER BY event_type""".stripMargin)),

    // Exact Spearman rank correlation (cents vs event time, per
    // action) — tie-correct: each row's DOUBLED average rank is the
    // integer 2p + c + 1 (p = strictly-smaller count, c = tie count),
    // derived for BOTH variables from grouped prefix counts over their
    // value histograms (PrefixSum — no per-group sort), joined back,
    // then Pearson over the exact integer doubled ranks. Only the
    // final rho is the accepted correctly-rounded /,sqrt double
    // (q_outliers class; formula text mirrored verbatim). The oracle
    // derives the same doubled ranks the OPPOSITE way
    // (2·rank_min + cnt − 1 via window functions) — equal by algebra,
    // so the gate cross-checks derivations, not one implementation.
    GateQuery(
      "q_spearman",
      (s, d) => {
        val ev = events(s, d)
          .withColumn("cents", round(col("value") * 100).cast("long"))
          .withColumn("tus", unix_micros(col("ts")))
        val r = ev
          .join(RankStats.doubledRanks(ev, "cents", Seq("event_type"), "rx"),
            Seq("event_type", "cents"))
          .join(RankStats.doubledRanks(ev, "tus", Seq("event_type"), "ry"),
            Seq("event_type", "tus"))
        r.groupBy("event_type")
          .agg(
            count(lit(1)).as("n"),
            expr("sum(CAST(rx AS DECIMAL(38,0)))").as("_sx"),
            expr("sum(CAST(ry AS DECIMAL(38,0)))").as("_sy"),
            expr("sum(CAST(rx AS DECIMAL(38,0)) * rx)").as("_sxx"),
            expr("sum(CAST(ry AS DECIMAL(38,0)) * ry)").as("_syy"),
            expr("sum(CAST(rx AS DECIMAL(38,0)) * ry)").as("_sxy"))
          .withColumn("rho_x1e6", expr(
            "CAST(round((CAST(n AS DOUBLE) * CAST(_sxy AS DOUBLE)" +
              " - CAST(_sx AS DOUBLE) * CAST(_sy AS DOUBLE))" +
              " / sqrt((CAST(n AS DOUBLE) * CAST(_sxx AS DOUBLE)" +
              "         - CAST(_sx AS DOUBLE) * CAST(_sx AS DOUBLE))" +
              "        * (CAST(n AS DOUBLE) * CAST(_syy AS DOUBLE)" +
              "           - CAST(_sy AS DOUBLE) * CAST(_sy AS DOUBLE)))" +
              " * 1000000) AS BIGINT)"))
          .select("event_type", "n", "rho_x1e6")
          .orderBy("event_type")
      },
      Some("""WITH ev AS (
             |  SELECT event_type,
             |         CAST(round(value * 100) AS BIGINT) AS cents,
             |         epoch_us(ts) AS tus
             |  FROM events),
             |r AS (
             |  SELECT event_type,
             |         2 * rank() OVER (PARTITION BY event_type ORDER BY cents)
             |           + count(*) OVER (PARTITION BY event_type, cents) - 1 AS rx,
             |         2 * rank() OVER (PARTITION BY event_type ORDER BY tus)
             |           + count(*) OVER (PARTITION BY event_type, tus) - 1 AS ry
             |  FROM ev),
             |m AS (
             |  SELECT event_type, count(*) AS n,
             |         sum(CAST(rx AS HUGEINT)) AS _sx,
             |         sum(CAST(ry AS HUGEINT)) AS _sy,
             |         sum(CAST(rx AS HUGEINT) * rx) AS _sxx,
             |         sum(CAST(ry AS HUGEINT) * ry) AS _syy,
             |         sum(CAST(rx AS HUGEINT) * ry) AS _sxy
             |  FROM r GROUP BY event_type)
             |SELECT event_type, n,
             |       CAST(round((CAST(n AS DOUBLE) * CAST(_sxy AS DOUBLE)
             |            - CAST(_sx AS DOUBLE) * CAST(_sy AS DOUBLE))
             |           / sqrt((CAST(n AS DOUBLE) * CAST(_sxx AS DOUBLE)
             |                   - CAST(_sx AS DOUBLE) * CAST(_sx AS DOUBLE))
             |                  * (CAST(n AS DOUBLE) * CAST(_syy AS DOUBLE)
             |                     - CAST(_sy AS DOUBLE) * CAST(_sy AS DOUBLE)))
             |           * 1000000) AS BIGINT) AS rho_x1e6
             |FROM m ORDER BY event_type""".stripMargin)),

    // Exact Gini concentration (Lorenz census) of value mass per
    // action — the inequality readout data-mixing diagnostics use
    // ("is 1% of sessions carrying 90% of reward?"). Tie-exact from
    // the value histogram alone: a tie block (v, c) at strictly-
    // smaller count p contributes v·(2cp + c² + c) to the doubled
    // rank-weighted sum, so G = (2Σi·x − (n+1)·T)/(n·T) is ONE exact
    // rational over grouped prefix counts — no per-group sort, no
    // per-row ranks, quantized once (half-away: G can round negative
    // at 0 only in theory; values are positive cents).
    GateQuery(
      "q_gini_value",
      (s, d) => {
        val ev = events(s, d)
          .withColumn("cents", round(col("value") * 100).cast("long"))
        RankStats.giniParts(ev, "cents", Seq("event_type"))
          .withColumn("gini_x1e6",
            expr(halfDivSpark("gini_num * 1000000", "gini_den")))
          .select(col("event_type"), col("n"),
            expr("CAST(total_value AS BIGINT)").as("total_cents"),
            col("gini_x1e6"))
          .orderBy("event_type")
      },
      Some(s"""WITH ev AS (
              |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
              |  FROM events),
              |h AS (
              |  SELECT event_type, cents, count(*) AS c
              |  FROM ev GROUP BY event_type, cents),
              |cu AS (
              |  SELECT *,
              |         coalesce(sum(c) OVER (PARTITION BY event_type
              |           ORDER BY cents
              |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              |           AS p
              |  FROM h),
              |m AS (
              |  SELECT event_type, CAST(sum(c) AS BIGINT) AS n,
              |         sum(CAST(cents AS HUGEINT) * c) AS _t,
              |         sum(CAST(cents AS HUGEINT) * (2 * c * p + c * c + c)) AS _a2
              |  FROM cu GROUP BY event_type)
              |SELECT event_type, n, CAST(_t AS BIGINT) AS total_cents,
              |       ${halfDivSql("(_a2 - (n + 1) * _t) * 1000000",
                 "CAST(n AS HUGEINT) * _t")} AS gini_x1e6
              |FROM m ORDER BY event_type""".stripMargin)),

    // Per-segment linear trend fit: exact closed-form OLS of daily
    // value-cents against the day index, entirely from the five
    // integer moments (n, Σx, Σy, Σx², Σxy, Σy²) — one scan, one agg,
    // no libm anywhere. slope/intercept are exact integer rationals
    // quantized by the house half-away division (DECIMAL(38,0) /
    // HUGEINT widening). R² = snum²/(sden·yden): the naive
    // snum²·1e6 numerator would overflow 38 digits at x10 (snum grows
    // ~n²), and Spark's `div` RETURNS BIGINT, so any single division
    // whose quotient exceeds 2^63 silently wraps. The published form
    // divides twice — t = snum² div yden (by Cauchy–Schwarz snum² ≤
    // sden·yden, so t ≤ sden: long-ranged through ~x1000), then
    // (t·1e6) div sden (≤ 1e6) — every intermediate inside 38 digits
    // through ~x100 segment sizes (n ≈ 2e6 at these value ranges;
    // beyond that, segment finer or pre-aggregate days). Both engines
    // truncate toward zero, so the value is identical on both and
    // within ~1e6/sden of exact R²·1e6 (≪ 1 unit here). Beyond the
    // envelope (|snum| ≥ 1e19, where snum² would exceed 38 digits)
    // BOTH engines emit an explicit NULL — Spark's silent decimal
    // NULL and DuckDB's HUGEINT overflow error would otherwise fail
    // DIFFERENTLY. The
    // per-segment regression readout a metrics warehouse runs daily —
    // map-side partial agg, scales by segment count not rows.
    GateQuery(
      "q_trend_fit",
      (s, d) =>
        events(s, d)
          .select(col("event_type"),
            datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
              .cast("long").as("x"),
            round(col("value") * 100).cast("long").as("y"))
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("y") * col("y")).as("syy"))
          .selectExpr(
            "event_type", "n",
            "CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS snum",
            "CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS sden",
            "CAST(sy AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sxy AS inum",
            "CAST(n AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy AS yden")
          .where("sden > 0 AND yden > 0")
          .selectExpr(
            "event_type", "n",
            s"${halfDivSpark("snum * 1000000", "sden")} AS slope_x1e6",
            s"${halfDivSpark("inum * 100", "sden")} AS intercept_x100",
            // magnitude guard: snum² needs < 38 digits; past |snum| ≥ 1e19
            // Spark's non-ANSI decimal would go silently NULL while DuckDB
            // HUGEINT raises — an EXPLICIT NULL on BOTH engines keeps them
            // identical and makes the envelope breach visible in output
            "CASE WHEN abs(snum) < 10000000000000000000 THEN " +
              "CAST((CAST((snum * snum) div yden AS DECIMAL(38,0)) * 1000000)" +
              " div sden AS BIGINT) ELSE NULL END AS r2_x1e6")
          .orderBy("event_type"),
      Some(s"""WITH ev AS (
              |  SELECT event_type,
              |         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS x,
              |         CAST(round(value * 100) AS BIGINT) AS y
              |  FROM events),
              |m AS (
              |  SELECT event_type, count(*) AS n,
              |         CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
              |         CAST(sum(x * x) AS HUGEINT) AS sxx,
              |         CAST(sum(x * y) AS HUGEINT) AS sxy,
              |         CAST(sum(y * y) AS HUGEINT) AS syy
              |  FROM ev GROUP BY 1),
              |f AS (
              |  SELECT event_type, n,
              |         n * sxy - sx * sy AS snum,
              |         n * sxx - sx * sx AS sden,
              |         sy * sxx - sx * sxy AS inum,
              |         n * syy - sy * sy AS yden
              |  FROM m)
              |SELECT event_type, n,
              |       ${halfDivSql("snum * 1000000", "sden")} AS slope_x1e6,
              |       ${halfDivSql("inum * 100", "sden")} AS intercept_x100,
              |       CASE WHEN abs(snum) < 10000000000000000000
              |            THEN CAST((CAST((snum * snum) // yden AS HUGEINT) * 1000000) // sden AS BIGINT)
              |            ELSE NULL END AS r2_x1e6
              |FROM f
              |WHERE sden > 0 AND yden > 0
              |ORDER BY event_type""".stripMargin))
  )
}
