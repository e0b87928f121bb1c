package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Metrics

/** Gate queries for the model-evaluation extension family: exact
  * distributed ROC-AUC (tie-aware Mann–Whitney), calibration /
  * expected-calibration-error census, and SQuAD-style token-overlap
  * F1. All metrics are exact integer arithmetic (×1e6 parts-per-
  * million, DECIMAL(38,0)/HUGEINT widening before any product) — no
  * float ever decides an ordering or a published digit, so every gate
  * hash-matches a DuckDB oracle bit-for-bit.
  *
  * Label/score fixtures derive deterministically from the embeddings
  * table: the binary label is the parity of the stored class label,
  * and the "model score" is a raw stored embedding component (both
  * engines read the identical float bits from parquet; the score is
  * only ever COMPARED, never aggregated as a float).
  */
object EvalOps {
  import Tables._

  /** THE scored-corpus fixture: y = parity of the class label, score =
    * raw 2nd embedding component (no arithmetic — comparisons only).
    */
  private[queries] def scored(s: org.apache.spark.sql.SparkSession, d: String) =
    embeddings(s, d)
      .filter(col("embedding").isNotNull && col("label").isNotNull)
      .select(
        col("vec_id"),
        when(col("label") % 2 === 0, 1).otherwise(0).as("y"),
        element_at(col("embedding"), 2).as("score"))

  private[queries] val ScoredSql =
    """SELECT vec_id,
      |       CASE WHEN label % 2 = 0 THEN 1 ELSE 0 END AS y,
      |       embedding[2] AS score
      |FROM embeddings
      |WHERE embedding IS NOT NULL AND label IS NOT NULL
      |  AND embedding[2] IS NOT NULL""".stripMargin

  /** The q_auc oracle — shared VERBATIM with the streaming AUC
    * monitor parity gate (same ground truth, one definition).
    */
  private[queries] val AucOracle: String =
    s"""WITH s AS ($ScoredSql),
             |h AS (
             |  SELECT score, CAST(sum(y) AS BIGINT) AS np,
             |         CAST(count(*) - sum(y) AS BIGINT) AS nn
             |  FROM s GROUP BY score),
             |w AS (
             |  SELECT np, nn,
             |         CAST(coalesce(sum(nn) OVER (ORDER BY score
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS HUGEINT) AS below
             |  FROM h)
             |SELECT CAST(sum(np) AS BIGINT) AS n_pos,
             |       CAST(sum(nn) AS BIGINT) AS n_neg,
             |       CASE WHEN sum(np) = 0 OR sum(nn) = 0 THEN NULL
             |            ELSE CAST(sum(CAST(np AS HUGEINT) * (2 * below + nn)) * 1000000
             |                      // (2 * CAST(sum(np) AS HUGEINT) * sum(nn)) AS BIGINT) END AS auc_x1e6
             |FROM w""".stripMargin

  val queries: Seq[GateQuery] = Seq(

    // Exact global ROC-AUC. The corpus compresses to a per-distinct-
    // score histogram in one map-side-combined agg; the rank prefix
    // sum runs over that histogram only (see Metrics.aucExact). The
    // oracle re-derives the same tie-aware rank-sum in SQL.
    GateQuery(
      "q_auc",
      (s, d) => Metrics.aucExact(scored(s, d), "y", "score"),
      Some(AucOracle)),

    // Per-cohort AUC: the window partitions by cohort, so each
    // prefix sum is cohort-local — the grouped-eval shape (per-slice
    // model monitoring) with zero extra passes.
    GateQuery(
      "q_auc_grouped",
      (s, d) =>
        Metrics.aucExact(
          scored(s, d).withColumn("cohort", pmod(col("vec_id"), lit(4L))),
          "y", "score", groupCols = Seq("cohort"))
          .orderBy("cohort"),
      Some(s"""WITH s AS ($ScoredSql),
             |h AS (
             |  SELECT vec_id % 4 AS cohort, score, CAST(sum(y) AS BIGINT) AS np,
             |         CAST(count(*) - sum(y) AS BIGINT) AS nn
             |  FROM s GROUP BY 1, 2),
             |w AS (
             |  SELECT cohort, np, nn,
             |         CAST(coalesce(sum(nn) OVER (PARTITION BY cohort ORDER BY score
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS HUGEINT) AS below
             |  FROM h)
             |SELECT cohort, CAST(sum(np) AS BIGINT) AS n_pos,
             |       CAST(sum(nn) AS BIGINT) AS n_neg,
             |       CASE WHEN sum(np) = 0 OR sum(nn) = 0 THEN NULL
             |            ELSE CAST(sum(CAST(np AS HUGEINT) * (2 * below + nn)) * 1000000
             |                      // (2 * CAST(sum(np) AS HUGEINT) * sum(nn)) AS BIGINT) END AS auc_x1e6
             |FROM w
             |GROUP BY cohort
             |ORDER BY cohort""".stripMargin)),

    // Reliability diagram + ECE. The claimed probability is derived
    // once as integer micro-units (floor of identical IEEE double
    // arithmetic on the stored float, mirrored token-for-token in the
    // oracle); binning and every published ratio are then pure integer
    // arithmetic. One agg to <= 10 bin rows.
    GateQuery(
      "q_calibration",
      (s, d) =>
        Metrics.calibration(
          embeddings(s, d)
            .filter(col("embedding").isNotNull && col("label").isNotNull)
            .select(
              when(col("label") % 2 === 0, 1).otherwise(0).as("y"),
              floor(
                (greatest(least(element_at(col("embedding"), 3).cast("double"),
                  lit(1.0)), lit(-1.0)) + lit(1.0)) / lit(2.0) * lit(1000000.0))
                .cast("long").as("p_x1e6")),
          "p_x1e6", "y", bins = 10)
          .orderBy("bin"),
      Some("""WITH s AS (
             |  SELECT CASE WHEN label % 2 = 0 THEN 1 ELSE 0 END AS y,
             |         CAST(floor((greatest(least(CAST(embedding[3] AS DOUBLE), 1.0), -1.0) + 1.0)
             |                    / 2.0 * 1000000.0) AS BIGINT) AS p
             |  FROM embeddings
             |  WHERE embedding IS NOT NULL AND label IS NOT NULL
             |    AND embedding[3] IS NOT NULL),
             |b AS (
             |  SELECT least(p // 100000, 9) AS bin, CAST(count(*) AS BIGINT) AS n,
             |         CAST(sum(y) AS BIGINT) AS n_pos,
             |         CAST(sum(CAST(p AS HUGEINT)) AS HUGEINT) AS sump
             |  FROM s GROUP BY 1),
             |e AS (
             |  SELECT bin, n, n_pos,
             |         CAST(CAST(n_pos AS HUGEINT) * 1000000 // n AS BIGINT) AS acc_x1e6,
             |         CAST(sump // n AS BIGINT) AS conf_x1e6
             |  FROM b),
             |g AS (
             |  SELECT *, abs(acc_x1e6 - conf_x1e6) AS gap_x1e6 FROM e),
             |t AS (
             |  SELECT CAST(sum(n) AS HUGEINT) AS ntot,
             |         sum(CAST(n AS HUGEINT) * gap_x1e6) AS wgap
             |  FROM g)
             |SELECT bin, n, n_pos, acc_x1e6, conf_x1e6, gap_x1e6,
             |       CAST(wgap // ntot AS BIGINT) AS ece_x1e6
             |FROM g, t
             |ORDER BY bin""".stripMargin)),


    // Brier score per cohort -- the proper scoring rule companion to
    // the calibration census, FULLY integer: residuals (p - y*1e6)
    // are exact in DECIMAL(38,0)/HUGEINT, so brier_x1e12 is a pure
    // function of the corpus with zero float accumulation anywhere.
    GateQuery(
      "q_brier",
      (s, d) =>
        graft.operators.Metrics.brier(
          embeddings(s, d)
            .filter(col("embedding").isNotNull && col("label").isNotNull)
            .select(
              pmod(col("vec_id"), lit(4L)).as("cohort"),
              when(col("label") % 2 === 0, 1).otherwise(0).as("y"),
              floor(
                (greatest(least(element_at(col("embedding"), 3).cast("double"),
                  lit(1.0)), lit(-1.0)) + lit(1.0)) / lit(2.0) * lit(1000000.0))
                .cast("long").as("p_x1e6")),
          "p_x1e6", "y", groupCols = Seq("cohort"))
          .orderBy("cohort"),
      Some("""WITH s AS (
             |  SELECT vec_id % 4 AS cohort,
             |         CASE WHEN label % 2 = 0 THEN 1 ELSE 0 END AS y,
             |         CAST(floor((greatest(least(CAST(embedding[3] AS DOUBLE), 1.0), -1.0) + 1.0)
             |                    / 2.0 * 1000000.0) AS BIGINT) AS p
             |  FROM embeddings
             |  WHERE embedding IS NOT NULL AND label IS NOT NULL
             |    AND embedding[3] IS NOT NULL)
             |SELECT cohort, CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(y) AS BIGINT) AS n_pos,
             |       CAST(sum(CAST(p - y * 1000000 AS HUGEINT) * (p - y * 1000000))
             |            // count(*) AS BIGINT) AS brier_x1e12
             |FROM s GROUP BY cohort ORDER BY cohort""".stripMargin)),

    // Equal-MASS reliability diagram: bins are the exact distributed
    // ntile over (p, vec_id) -- rank assignment rides the
    // range-partitioned prefix scan (curriculumStages), so a
    // concentrated score distribution cannot collapse the diagram
    // into one bin. The oracle re-derives with the PLAIN ntile window
    // (the scale-correct plan must reproduce textbook semantics).
    GateQuery(
      "q_calibration_em",
      (s, d) =>
        graft.operators.Metrics.calibrationEqualMass(
          embeddings(s, d)
            .filter(col("embedding").isNotNull && col("label").isNotNull)
            .select(
              col("vec_id"),
              when(col("label") % 2 === 0, 1).otherwise(0).as("y"),
              floor(
                (greatest(least(element_at(col("embedding"), 3).cast("double"),
                  lit(1.0)), lit(-1.0)) + lit(1.0)) / lit(2.0) * lit(1000000.0))
                .cast("long").as("p_x1e6")),
          "p_x1e6", "y", idCol = "vec_id", bins = 10)
          .orderBy("bin"),
      Some("""WITH s AS (
             |  SELECT vec_id,
             |         CASE WHEN label % 2 = 0 THEN 1 ELSE 0 END AS y,
             |         CAST(floor((greatest(least(CAST(embedding[3] AS DOUBLE), 1.0), -1.0) + 1.0)
             |                    / 2.0 * 1000000.0) AS BIGINT) AS p
             |  FROM embeddings
             |  WHERE embedding IS NOT NULL AND label IS NOT NULL
             |    AND embedding[3] IS NOT NULL),
             |r AS (
             |  SELECT y, p, ntile(10) OVER (ORDER BY p, vec_id) AS stage FROM s),
             |b AS (
             |  SELECT CAST(stage - 1 AS BIGINT) AS bin, CAST(count(*) AS BIGINT) AS n,
             |         CAST(sum(y) AS BIGINT) AS n_pos,
             |         CAST(sum(CAST(p AS HUGEINT)) AS HUGEINT) AS sump
             |  FROM r GROUP BY 1),
             |e AS (
             |  SELECT bin, n, n_pos,
             |         CAST(CAST(n_pos AS HUGEINT) * 1000000 // n AS BIGINT) AS acc_x1e6,
             |         CAST(sump // n AS BIGINT) AS conf_x1e6
             |  FROM b),
             |g AS (
             |  SELECT *, abs(acc_x1e6 - conf_x1e6) AS gap_x1e6 FROM e),
             |t AS (
             |  SELECT CAST(sum(n) AS HUGEINT) AS ntot,
             |         sum(CAST(n AS HUGEINT) * gap_x1e6) AS wgap
             |  FROM g)
             |SELECT bin, n, n_pos, acc_x1e6, conf_x1e6, gap_x1e6,
             |       CAST(wgap // ntot AS BIGINT) AS ece_x1e6
             |FROM g, t
             |ORDER BY bin""".stripMargin)),

    // Exact PR curve + average precision: the same distinct-score
    // histogram shape as q_auc (one map-side-combined agg, cumulative
    // windows over the histogram only); every published column is an
    // exact integer — the float threshold itself is never published
    // (thr_rank stands in), and AP quantizes each threshold's
    // precision to ppm BEFORE the integer-weighted sum, so no float
    // accumulation order exists to split engines.
    GateQuery(
      "q_pr_curve",
      (s, d) => Metrics.prCurve(scored(s, d), "y", "score")
        .orderBy("thr_rank"),
      Some(s"""WITH s AS ($ScoredSql),
             |h AS (
             |  SELECT score, CAST(sum(y) AS BIGINT) AS np,
             |         CAST(count(*) - sum(y) AS BIGINT) AS nn
             |  FROM s GROUP BY score),
             |c AS (
             |  SELECT np, nn,
             |         CAST(sum(np) OVER (ORDER BY score DESC
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tp,
             |         CAST(sum(nn) OVER (ORDER BY score DESC
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS fp,
             |         row_number() OVER (ORDER BY score DESC) AS thr_rank
             |  FROM h),
             |t AS (SELECT CAST(sum(np) AS HUGEINT) AS ptot FROM h),
             |curve AS (
             |  SELECT thr_rank, np, tp, fp,
             |         CAST(CAST(tp AS HUGEINT) * 1000000 // (tp + fp) AS BIGINT) AS prec_ppm,
             |         CASE WHEN ptot = 0 THEN NULL
             |              ELSE CAST(CAST(tp AS HUGEINT) * 1000000 // ptot AS BIGINT) END AS recall_ppm
             |  FROM c, t),
             |a AS (
             |  SELECT CASE WHEN (SELECT ptot FROM t) = 0 THEN NULL
             |              ELSE CAST(sum(CAST(np AS HUGEINT) * prec_ppm)
             |                        // (SELECT ptot FROM t) AS BIGINT) END AS ap_ppm
             |  FROM curve)
             |SELECT thr_rank, tp + fp AS n_pred, tp, fp, prec_ppm, recall_ppm, ap_ppm
             |FROM curve, a
             |ORDER BY thr_rank""".stripMargin)),

    // nDCG@10 + reciprocal rank of the sign-LSH bucketed retrieval,
    // graded by label agreement (2 = same label, 1 = same parity,
    // 0 = neither). The discount table is Metrics.discountsX1e6 —
    // ×1e6-quantized integers interpolated as LITERALS into this SQL,
    // so ranking arithmetic has zero runtime float ops on either
    // engine; ranking itself is by the ×1e4 integer cosine with id
    // tiebreak (the q_ann_recall convention). Queries are ABSOLUTELY
    // bounded (vec_id < 30), so the scored relation is linear in the
    // corpus.
    GateQuery(
      "q_ndcg_mrr",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val e = VectorOps.withVec(embeddings(s, d))
        val q = e.filter(col("vec_id") < 30)
          .select(col("vec_id").as("qid"), col("label").as("ql"),
            col("v").as("qv"), VectorOps.signBucket3(col("v")).as("qb"))
        val c = e.select(col("vec_id").as("cid"), col("label").as("cl"),
          col("v").as("cv"), VectorOps.signBucket3(col("v")).as("cb"))
        val retrieved = broadcast(q)
          .join(c, col("qb") === col("cb") && col("qid") =!= col("cid"))
          .withColumn("cos_x1e4",
            round(graft.operators.Ann.cosine(col("qv"), col("cv")) * 10000)
              .cast("long"))
          .withColumn("rank", row_number().over(
            Window.partitionBy("qid").orderBy(desc("cos_x1e4"), asc("cid"))))
          .filter(col("rank") <= 10)
          .withColumn("rel",
            when(col("ql") === col("cl"), 2)
              .when(col("ql") % 2 === col("cl") % 2, 1)
              .otherwise(0))
          .select("qid", "rank", "rel")
        Metrics.rankingMetrics(retrieved, "qid", "rank", "rel", k = 10)
          .orderBy("qid")
      },
      Some {
        val w = Metrics.discountsX1e6(10).mkString("[", ", ", "]")
        s"""WITH e AS (
           |  SELECT vec_id, label,
           |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
           |         ${VectorOps.signBucket3Sql("embedding")} AS b
           |  FROM embeddings),
           |scored AS (
           |  SELECT q.vec_id AS qid, c.vec_id AS cid, q.label AS ql, c.label AS cl,
           |         CAST(round(
           |           list_sum(list_transform(list_zip(q.v, c.v),
           |                                   p -> struct_extract(p, 1) * struct_extract(p, 2)))
           |           / (sqrt(list_sum(list_transform(q.v, x -> x * x)))
           |              * sqrt(list_sum(list_transform(c.v, x -> x * x)))) * 10000) AS BIGINT) AS cos_x1e4
           |  FROM e q JOIN e c ON q.b = c.b AND q.vec_id <> c.vec_id
           |  WHERE q.vec_id < 30),
           |ranked AS (
           |  SELECT qid, ql, cl,
           |         row_number() OVER (PARTITION BY qid
           |           ORDER BY cos_x1e4 DESC, cid ASC) AS rnk
           |  FROM scored QUALIFY rnk <= 10),
           |graded AS (
           |  SELECT qid, rnk,
           |         CASE WHEN ql = cl THEN 2
           |              WHEN ql % 2 = cl % 2 THEN 1 ELSE 0 END AS rel
           |  FROM ranked),
           |wtd AS (
           |  SELECT qid, rnk, rel,
           |         CAST((CAST(1 AS BIGINT) << rel) - 1 AS HUGEINT) AS gain,
           |         ($w)[rnk] AS wsys,
           |         ($w)[row_number() OVER (PARTITION BY qid
           |           ORDER BY rel DESC, rnk ASC)] AS wideal
           |  FROM graded),
           |agg AS (
           |  SELECT qid, CAST(count(*) AS BIGINT) AS n_ret,
           |         CAST(sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_rel,
           |         CAST(min(CASE WHEN rel > 0 THEN rnk END) AS BIGINT) AS first_rel_rank,
           |         sum(gain * wsys) AS dcg, sum(gain * wideal) AS idcg
           |  FROM wtd GROUP BY qid)
           |SELECT qid, n_ret, n_rel, first_rel_rank,
           |       CASE WHEN first_rel_rank IS NULL THEN CAST(0 AS BIGINT)
           |            ELSE CAST(1000000 // first_rel_rank AS BIGINT) END AS rr_x1e6,
           |       CAST(dcg AS BIGINT) AS dcg_x1e6,
           |       CAST(idcg AS BIGINT) AS idcg_x1e6,
           |       CASE WHEN idcg = 0 THEN NULL
           |            ELSE CAST(dcg * 1000000 // idcg AS BIGINT) END AS ndcg_ppm
           |FROM agg
           |ORDER BY qid""".stripMargin
      }),


    // Mutual information census between document source and language:
    // per-cell terms quantized to integer BEFORE the total (the float
    // sum over cells would be partial-agg-order-dependent -- the same
    // reason the drift chi2 terms ship unsummed); ln inputs are the
    // identical correctly-rounded double divisions on both engines
    // (the PMI precedent). One corpus scan; everything after is
    // cell-relation-sized.
    GateQuery(
      "q_mutual_info",
      (s, d) =>
        Metrics.mutualInformation(documents(s, d), "source", "lang")
          .orderBy("x", "y"),
      Some("""WITH s AS (
             |  SELECT source AS x, lang AS y FROM documents
             |  WHERE source IS NOT NULL AND lang IS NOT NULL),
             |cells AS (SELECT x, y, CAST(count(*) AS BIGINT) AS n_xy FROM s GROUP BY 1, 2),
             |mx AS (SELECT x, CAST(sum(n_xy) AS BIGINT) AS n_x FROM cells GROUP BY 1),
             |my AS (SELECT y, CAST(sum(n_xy) AS BIGINT) AS n_y FROM cells GROUP BY 1),
             |t AS (SELECT CAST(sum(n_xy) AS DOUBLE) AS n FROM cells),
             |terms AS (
             |  SELECT cells.x, cells.y, n_xy, n_x, n_y,
             |         CAST(round((n_xy / n) * ln((n_xy / n) / ((n_x / n) * (n_y / n))) * 1e9) AS BIGINT) AS mi_term_x1e9
             |  FROM cells JOIN mx ON cells.x = mx.x JOIN my ON cells.y = my.y, t),
             |mi AS (SELECT CAST(sum(mi_term_x1e9) AS BIGINT) AS mi_x1e9 FROM terms)
             |SELECT x, y, n_xy, n_x, n_y, mi_term_x1e9, mi_x1e9
             |FROM terms, mi
             |ORDER BY x, y""".stripMargin)),

    // Feature-relevance RANKING against the language label: `source`
    // vs a derived length bucket, each through ONE mutualInformation
    // pass, ranked by the chi-squared association statistic derived
    // ENTIRELY from the exact integer inputs the operator ships
    // (n_xy, n_x, n_y): per cell, (n·n_xy − n_x·n_y)²·1e6 div
    // (n·n_x·n_y) — exact integer multiply/divide on both engines, so
    // NO libm term (mutualInformation's mi_term_x1e9 is the one
    // accepted advisory class) ever decides a published order or
    // hash. The deliberately weak length feature must rank below
    // source — a swapped marginal or a mis-normalized term would
    // reorder them.
    GateQuery(
      "q_feature_rank",
      (s, d) => {
        def one(df: org.apache.spark.sql.DataFrame, name: String) = {
          val cells = Metrics.mutualInformation(df, "f", "lang")
            .select("n_xy", "n_x", "n_y")
          val tot = cells.agg(sum("n_xy").cast("long").as("_n"))
          cells.crossJoin(broadcast(tot))
            // d = n·n_xy − n_x·n_y fits a long (|d| ≤ n² ≈ 2.5e9 at
            // sf0.1); d²·1e6 needs DECIMAL(38,0) — exact, then the
            // integral div is exact and non-negative (no truncation
            // direction ambiguity across engines)
            .withColumn("_t", expr(
              "CAST((CAST(_n * n_xy - n_x * n_y AS DECIMAL(38,0)) *" +
                " (_n * n_xy - n_x * n_y) * 1000000)" +
                " div (CAST(_n AS DECIMAL(38,0)) * n_x * n_y) AS BIGINT)"))
            .agg(count(lit(1)).as("n_cells"),
              sum("_t").cast("long").as("chi2_x1e6"))
            .select(lit(name).as("feature"), col("n_cells"),
              col("chi2_x1e6"))
        }
        val docs = documents(s, d)
        one(docs.select(col("source").as("f"), col("lang")), "source")
          .unionByName(one(
            docs.select(expr("n_chars div 500").as("f"), col("lang")),
            "len_bucket"))
          .orderBy(desc("chi2_x1e6"), asc("feature"))
      },
      Some("""WITH
             |f1 AS (SELECT source AS f, lang AS y FROM documents
             |       WHERE source IS NOT NULL AND lang IS NOT NULL),
             |c1 AS (SELECT f, y, CAST(count(*) AS BIGINT) AS n_xy FROM f1 GROUP BY 1, 2),
             |x1 AS (SELECT f, CAST(sum(n_xy) AS BIGINT) AS n_x FROM c1 GROUP BY 1),
             |y1 AS (SELECT y, CAST(sum(n_xy) AS BIGINT) AS n_y FROM c1 GROUP BY 1),
             |t1 AS (SELECT CAST(sum(n_xy) AS HUGEINT) AS n FROM c1),
             |m1 AS (SELECT CAST(count(*) AS BIGINT) AS n_cells,
             |              CAST(sum((n * n_xy - CAST(n_x AS HUGEINT) * n_y) * (n * n_xy - CAST(n_x AS HUGEINT) * n_y) * 1000000 // (n * n_x * n_y)) AS BIGINT) AS chi2_x1e6
             |       FROM c1 JOIN x1 ON c1.f = x1.f JOIN y1 ON c1.y = y1.y, t1),
             |f2 AS (SELECT n_chars // 500 AS f, lang AS y FROM documents
             |       WHERE n_chars IS NOT NULL AND lang IS NOT NULL),
             |c2 AS (SELECT f, y, CAST(count(*) AS BIGINT) AS n_xy FROM f2 GROUP BY 1, 2),
             |x2 AS (SELECT f, CAST(sum(n_xy) AS BIGINT) AS n_x FROM c2 GROUP BY 1),
             |y2 AS (SELECT y, CAST(sum(n_xy) AS BIGINT) AS n_y FROM c2 GROUP BY 1),
             |t2 AS (SELECT CAST(sum(n_xy) AS HUGEINT) AS n FROM c2),
             |m2 AS (SELECT CAST(count(*) AS BIGINT) AS n_cells,
             |              CAST(sum((n * n_xy - CAST(n_x AS HUGEINT) * n_y) * (n * n_xy - CAST(n_x AS HUGEINT) * n_y) * 1000000 // (n * n_x * n_y)) AS BIGINT) AS chi2_x1e6
             |       FROM c2 JOIN x2 ON c2.f = x2.f JOIN y2 ON c2.y = y2.y, t2),
             |u AS (
             |  SELECT 'source' AS feature, n_cells, chi2_x1e6 FROM m1
             |  UNION ALL
             |  SELECT 'len_bucket' AS feature, n_cells, chi2_x1e6 FROM m2)
             |SELECT feature, n_cells, chi2_x1e6
             |FROM u
             |ORDER BY chi2_x1e6 DESC, feature ASC""".stripMargin)),


    // Per-source quantile normalization: every document's EXACT
    // length percentile within its source -- after it, "top 10%"
    // means the same thing in every source regardless of raw scale
    // (the batch-effect-correction precondition for cross-source
    // thresholds). Rank rides the GROUPED range-partitioned prefix
    // scan; the oracle is the plain percent_rank-style window the
    // scale-correct plan must reproduce row for row (5000 rows
    // hashed, not a summary).
    GateQuery(
      "q_quantile_normalize",
      (s, d) =>
        Metrics.quantileNormalize(
          documents(s, d).select("doc_id", "source", "n_chars"),
          "source", "n_chars", "doc_id")
          .select("doc_id", "source", "n_chars", "group_rank", "pct_x1e6")
          .orderBy("doc_id"),
      Some("""SELECT doc_id, source, n_chars,
             |       CAST(rnk AS BIGINT) AS group_rank,
             |       CASE WHEN cnt <= 1 THEN 0
             |            ELSE CAST(CAST(rnk - 1 AS HUGEINT) * 1000000 // (cnt - 1) AS BIGINT)
             |       END AS pct_x1e6
             |FROM (SELECT doc_id, source, n_chars,
             |             row_number() OVER (PARTITION BY source
             |               ORDER BY n_chars ASC NULLS FIRST, doc_id) AS rnk,
             |             count(*) OVER (PARTITION BY source) AS cnt
             |      FROM documents)
             |ORDER BY doc_id""".stripMargin)),

    // Token-overlap F1 between adjacent-document pairs (even doc_id =
    // prediction, its successor = reference): the QA eval-harness
    // match metric over a corpus of pairs. Multiset-intersection
    // overlap via one (pair, token) equi-join of two map-side-combined
    // count relations — work is token-sized, never pairs².
    GateQuery(
      "q_token_f1",
      (s, d) => {
        val docs = documents(s, d)
        val pairs = docs.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id").as("pair_id"), col("text").as("pred"))
          .join(
            docs.select((col("doc_id") - 1).as("pair_id"),
              col("text").as("ref")),
            Seq("pair_id"))
        Metrics.tokenF1(pairs, "pair_id", "pred", "ref")
          .orderBy("pair_id")
      },
      Some("""WITH pr AS (
             |  SELECT a.doc_id AS pair_id, a.text AS ptext, b.text AS rtext
             |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
             |  WHERE a.doc_id % 2 = 0),
             |tp AS (
             |  SELECT pair_id, u.t AS tok, count(*) AS cp
             |  FROM pr, unnest(list_filter(string_split(trim(ptext), ' '),
             |                              x -> len(x) > 0)) AS u(t)
             |  GROUP BY 1, 2),
             |tr AS (
             |  SELECT pair_id, u.t AS tok, count(*) AS cr
             |  FROM pr, unnest(list_filter(string_split(trim(rtext), ' '),
             |                              x -> len(x) > 0)) AS u(t)
             |  GROUP BY 1, 2),
             |ov AS (
             |  SELECT tp.pair_id, CAST(sum(least(cp, cr)) AS BIGINT) AS ov
             |  FROM tp JOIN tr ON tp.pair_id = tr.pair_id AND tp.tok = tr.tok
             |  GROUP BY 1),
             |lens AS (
             |  SELECT pair_id,
             |         CAST(len(list_filter(string_split(trim(ptext), ' '),
             |                              x -> len(x) > 0)) AS BIGINT) AS lp,
             |         CAST(len(list_filter(string_split(trim(rtext), ' '),
             |                              x -> len(x) > 0)) AS BIGINT) AS lr
             |  FROM pr)
             |SELECT lens.pair_id, lp AS n_pred, lr AS n_ref,
             |       coalesce(ov, 0) AS overlap,
             |       CASE WHEN lp <= 0 THEN NULL
             |            ELSE CAST(CAST(coalesce(ov, 0) AS HUGEINT) * 1000000 // lp AS BIGINT) END AS precision_x1e6,
             |       CASE WHEN lr <= 0 THEN NULL
             |            ELSE CAST(CAST(coalesce(ov, 0) AS HUGEINT) * 1000000 // lr AS BIGINT) END AS recall_x1e6,
             |       CASE WHEN lp + lr <= 0 THEN NULL
             |            ELSE CAST(2 * CAST(coalesce(ov, 0) AS HUGEINT) * 1000000 // (lp + lr) AS BIGINT) END AS f1_x1e6
             |FROM lens LEFT JOIN ov ON lens.pair_id = ov.pair_id
             |ORDER BY lens.pair_id""".stripMargin)))
}
