package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact model-evaluation metrics over scored corpora — the offline
  * eval pass every training pipeline runs on its validation tables
  * (the reference evaluates trained propensity models driver-side in
  * src/trainer/code/train.py; at 100 TB the scored frame never fits a
  * driver, so each metric is re-expressed as a distributed column
  * program).
  *
  * House rules: every ratio ships as integer parts-per-million
  * (`*_x1e6`), products that can exceed long range at cluster-scale
  * row counts are widened to DECIMAL(38,0) BEFORE multiplying, and no
  * float ever decides an ordering — ranks come from exact integer
  * counts per distinct score value, so the result is a pure function
  * of the corpus (layout/retry-stable and oracle-checkable).
  */
object Metrics {

  /** Exact ROC-AUC via the tie-aware Mann–Whitney rank-sum, computed
    * distributed: AUC = U / (P·N) where U counts positive–negative
    * pairs ordered correctly, ties at half weight.
    *
    * Scale shape: ONE hash aggregation compresses the corpus to a
    * per-distinct-score histogram (n_pos, n_neg) — map-side combined,
    * so the shuffle carries |distinct scores| rows, not |corpus| —
    * then the running negative-count below each score. Grouped eval
    * windows by the group key (one parallel partition per group);
    * GLOBAL eval uses the range-partitioned two-pass scan
    * ([[PrefixSum.rangeExclusive]]) so a continuous score — histogram
    * = corpus-sized — never hits a single-partition window.
    *
    * U is exact integer arithmetic throughout: with per-score counts
    * p_s, n_s and B_s = Σ negatives at strictly smaller scores,
    * 2U = Σ_s p_s · (2·B_s + n_s)  (the n_s term is the half-weight
    * tie credit), so `auc_x1e6 = 2U·1e6 div 2PN` needs no floats.
    * Rows with a null score or label are excluded (documented; an
    * oracle must filter identically). Output per group: `n_pos`,
    * `n_neg`, `auc_x1e6` (null when either class is empty — AUC is
    * undefined, not 0).
    */
  def aucExact(df: DataFrame, labelCol: String, scoreCol: String,
      groupCols: Seq[String] = Nil): DataFrame = {
    val grp = groupCols.map(col)
    val hist = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy((grp :+ col(scoreCol)): _*)
      .agg(
        sum(when(col(labelCol) =!= 0, 1L).otherwise(0L)).as("_np"),
        sum(when(col(labelCol) =!= 0, 0L).otherwise(1L)).as("_nn"))
    aucFromHistogram(hist, scoreCol, groupCols)
  }

  /** The rank-sum tail of [[aucExact]] over an ALREADY-BUILT
    * per-distinct-score histogram `(scoreCol, _np, _nn)` — exposed
    * because the histogram is a plain additive relation: per-unit
    * (per-day, per-micro-batch) histograms merged by summing `_np`/
    * `_nn` per score yield the IDENTICAL corpus histogram, which makes
    * exact AUC incrementally maintainable (the streaming monitor gate
    * rides this; the same holds for any rollup cadence).
    */
  def aucFromHistogram(hist0: DataFrame, scoreCol: String,
      groupCols: Seq[String] = Nil): DataFrame = {
    val grp = groupCols.map(col)
    val hist = hist0
    // the range-partitioned two-pass scan in BOTH modes: with a
    // continuous score the distinct-score histogram is corpus-sized,
    // and a single-partition window over it would be the scale
    // killer; grouped eval restarts the scan per group WITHOUT
    // pinning any group to one partition (a corpus-sized single
    // cohort — country, say — stays parallel).
    val contrib = PrefixSum.rangeExclusive(hist, scoreCol,
      descending = false, Seq("_nn" -> "_below"), groupCols = groupCols)
      // p_s·(2B_s + n_s): each factor ≤ n, the product ≤ 2n² — decimal
      // BEFORE the multiply so the arithmetic is exact at any n
      .withColumn("_u2",
        expr("CAST(_np AS DECIMAL(38,0)) * (2 * CAST(_below AS DECIMAL(38,0)) + _nn)"))
    contrib
      .groupBy(grp: _*)
      .agg(
        sum("_np").as("n_pos"),
        sum("_nn").as("n_neg"),
        sum("_u2").as("_u2s"))
      .withColumn("auc_x1e6",
        expr("CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL" +
          " ELSE CAST(_u2s * 1000000 div (2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg) AS BIGINT) END"))
      .drop("_u2s")
  }

  /** Calibration census (reliability diagram) + expected calibration
    * error over a scored corpus whose predicted probability arrives as
    * integer micro-units `probX1e6Col` ∈ [0, 1e6] (the house fixed-
    * point form — binning integer micro-probabilities sidesteps the
    * float-boundary flake class entirely).
    *
    * Output: one row per non-empty bin — `bin` (0-based, equi-width,
    * the p=1e6 edge folded into the last bin), `n`, `n_pos`,
    * `acc_x1e6` (empirical positive rate), `conf_x1e6` (mean claimed
    * probability, truncating div), `gap_x1e6` = |acc − conf| — plus
    * the scalar `ece_x1e6` = Σ_b n_b·gap_b div n repeated on every row
    * (exact integer weighting, no per-bin re-rounding).
    *
    * Scale shape: one map-side-combined aggregation to ≤ `bins` rows,
    * then a broadcast of the 1-row total for the ECE weighting — no
    * corpus-sized shuffle, no driver loop.
    */
  def calibration(df: DataFrame, probX1e6Col: String, labelCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    val width = 1000000L / bins
    calibrationTail(
      df.filter(col(probX1e6Col).isNotNull && col(labelCol).isNotNull)
        .withColumn("_bin",
          least(expr(s"$probX1e6Col div $width"), lit(bins - 1L)).cast("long")),
      probX1e6Col, labelCol)
  }

  /** Equal-MASS calibration: bins hold (as close as arithmetic
    * allows) the same number of rows instead of the same probability
    * width — the reliability diagram that stays readable when the
    * score distribution is concentrated (equi-width bins then put 99%
    * of rows in one bin). Bin assignment is the exact distributed
    * ntile ([[Curation.curriculumStages]] — histogram offset via the
    * range-partitioned prefix scan + within-score `idCol` tiebreak,
    * no corpus-wide window), so bins are a pure function of the
    * corpus. Ties on the probability may split across adjacent bins
    * (exact equal mass, the SQL ntile contract). Output schema and
    * every ratio match [[calibration]]; `bin` is 0-based rank order.
    */
  def calibrationEqualMass(df: DataFrame, probX1e6Col: String,
      labelCol: String, idCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    calibrationTail(
      Curation.curriculumStages(
        df.filter(col(probX1e6Col).isNotNull && col(labelCol).isNotNull),
        idCol, probX1e6Col, bins)
        .withColumn("_bin", (col("stage") - 1).cast("long")),
      probX1e6Col, labelCol)
  }

  /** Shared bin-census + ECE tail over a frame carrying `_bin` — ONE
    * definition for both binning policies.
    */
  private def calibrationTail(withBin: DataFrame, probX1e6Col: String,
      labelCol: String): DataFrame = {
    val binned = withBin
      .groupBy("_bin")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col(labelCol) =!= 0, 1L).otherwise(0L)).as("n_pos"),
        // Σ micro-probs ≤ n·1e6: decimal before the sum would be
        // overkill row-wise, but the SUM itself widens: at 1e12 rows
        // the total passes 2^63 — accumulate in decimal
        sum(col(probX1e6Col).cast("decimal(38,0)")).as("_sump"))
      .withColumn("acc_x1e6",
        expr("CAST(CAST(n_pos AS DECIMAL(38,0)) * 1000000 div n AS BIGINT)"))
      .withColumn("conf_x1e6", expr("CAST(_sump div n AS BIGINT)"))
      .withColumn("gap_x1e6", abs(col("acc_x1e6") - col("conf_x1e6")))
    val total = binned.agg(
      sum("n").as("_ntot"),
      sum(expr("CAST(n AS DECIMAL(38,0)) * gap_x1e6")).as("_wgap"))
    binned
      .crossJoin(broadcast(total))
      .withColumn("ece_x1e6", expr("CAST(_wgap div _ntot AS BIGINT)"))
      .select(col("_bin").as("bin"), col("n"), col("n_pos"),
        col("acc_x1e6"), col("conf_x1e6"), col("gap_x1e6"), col("ece_x1e6"))
  }

  /** Exact precision–recall curve + average precision over a scored
    * corpus — one row per distinct score threshold (descending), the
    * operating points a production classifier threshold is chosen
    * from.
    *
    * Rides the SAME distinct-score histogram shape as [[aucExact]]:
    * ONE map-side-combined agg compresses the corpus to per-score
    * (n_pos, n_neg), then cumulative windows run over that histogram
    * only (single-partition over the DISTINCT-SCORE relation — the
    * documented global-eval envelope; corpus-sized distinct scores
    * would swap in the two-pass range-partitioned prefix sum).
    *
    * Output per threshold: `thr_rank` (1 = highest score; the float
    * threshold itself is never published — float columns are the
    * cross-engine flake class), `n_pred` = rows predicted positive at
    * this threshold, `tp`, `fp`, `prec_ppm` = tp·1e6 div n_pred,
    * `recall_ppm` = tp·1e6 div P — plus the scalar `ap_ppm` repeated
    * on every row: AP = Σ_t Δtp_t · prec_ppm_t div P, the standard
    * step-interpolation with the per-threshold precision quantized to
    * ppm BEFORE the weighted sum (house integer form — no float sum
    * whose accumulation order could split engines). Products widen to
    * DECIMAL(38,0) first. Null-score/label rows are excluded;
    * `recall_ppm`/`ap_ppm` are null when the corpus has no positives
    * (undefined, not 0).
    */
  def prCurve(df: DataFrame, labelCol: String, scoreCol: String): DataFrame = {
    val hist = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(scoreCol))
      .agg(
        sum(when(col(labelCol) =!= 0, 1L).otherwise(0L)).as("_np"),
        sum(when(col(labelCol) =!= 0, 0L).otherwise(1L)).as("_nn"))
    // inclusive cumulatives and the threshold index all derive from
    // ONE exclusive range-partitioned prefix scan (three sums share
    // the single range exchange) — no corpus-sized single-partition
    // window even when every score is distinct
    val cum = PrefixSum.rangeExclusive(
      hist.withColumn("_one", lit(1L)), scoreCol, descending = true,
      Seq("_np" -> "_xtp", "_nn" -> "_xfp", "_one" -> "_xrk"))
      .withColumn("tp", col("_xtp") + col("_np"))
      .withColumn("fp", col("_xfp") + col("_nn"))
      .withColumn("thr_rank", (col("_xrk") + 1).cast("int"))
      .withColumn("prec_ppm",
        expr("CAST(CAST(tp AS DECIMAL(38,0)) * 1000000 div (tp + fp) AS BIGINT)"))
    val totals = hist.agg(sum("_np").as("_ptot"))
    val curve = cum
      .crossJoin(broadcast(totals))
      .withColumn("recall_ppm",
        expr("CASE WHEN _ptot = 0 THEN NULL" +
          " ELSE CAST(CAST(tp AS DECIMAL(38,0)) * 1000000 div _ptot AS BIGINT) END"))
    val ap = curve.agg(
      expr("CASE WHEN max(_ptot) = 0 THEN NULL" +
        " ELSE CAST(sum(CAST(_np AS DECIMAL(38,0)) * prec_ppm) div max(_ptot) AS BIGINT) END")
        .as("ap_ppm"))
    curve
      .crossJoin(broadcast(ap))
      .select(col("thr_rank"), (col("tp") + col("fp")).as("n_pred"),
        col("tp"), col("fp"), col("prec_ppm"), col("recall_ppm"),
        col("ap_ppm"))
  }

  /** Per-group quantile (rank) normalization — batch-effect
    * correction for scores from heterogeneous sources: each row gets
    * its EXACT percentile within its group, `pct_x1e6` =
    * (rank − 1)·1e6 div (n_g − 1) (SQL percent_rank ×1e6, truncating;
    * single-row groups pct 0), with rank the exact (value, id) order.
    * After it, "top 10% by quality" means the same thing in every
    * source no matter how each source's raw scorer is scaled — the
    * precondition for cross-source curation thresholds.
    *
    * Scale shape: the rank is curriculumStages' histogram-offset
    * form, per group — a (group, value) histogram agg, the GROUPED
    * range-partitioned prefix scan ([[PrefixSum.rangeExclusive]]: no
    * group ever pins to one partition), a within-(group, value)
    * row_number (partition = one tie set), and a group-size join.
    * Null values rank FIRST in their group (Spark's asc ordering —
    * an oracle must order NULLS FIRST explicitly); products widen to
    * DECIMAL(38,0) before ×1e6.
    */
  def quantileNormalize(df: DataFrame, groupCol: String, valueCol: String,
      idCol: String): DataFrame = {
    val hist = df.groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("_cnt"))
    val base = PrefixSum.rangeExclusive(hist, valueCol,
      descending = false, Seq("_cnt" -> "_base"), groupCols = Seq(groupCol))
      .select(col(groupCol).as("_bg"), col(valueCol).as("_bv"), col("_base"))
    val sizes = df.groupBy(col(groupCol)).agg(count(lit(1)).as("_ng"))
      .withColumnRenamed(groupCol, "_sg")
    val inTie = Window.partitionBy(col(groupCol), col(valueCol))
      .orderBy(col(idCol))
    df
      // null-safe joins: a null value (or group) is a real rank group
      .join(base, col(groupCol) <=> col("_bg") && col(valueCol) <=> col("_bv"))
      .drop("_bg", "_bv")
      .withColumn("group_rank",
        col("_base") + row_number().over(inTie).cast("long"))
      .join(sizes, col(groupCol) <=> col("_sg"))
      .drop("_sg")
      .withColumn("pct_x1e6",
        when(col("_ng") <= 1, lit(0L)).otherwise(
          expr("CAST(CAST(group_rank - 1 AS DECIMAL(38,0)) * 1000000" +
            " div (_ng - 1) AS BIGINT)")))
      .drop("_base", "_ng")
  }

  /** Brier score over integer micro-unit probabilities — the proper
    * scoring rule companion to [[calibration]], fully integer: with
    * p ∈ [0, 1e6] and y ∈ {0, 1}, each residual (p − y·1e6)² ≤ 1e12
    * is exact in DECIMAL(38,0), so `brier_x1e12` = Σ(p − y·1e6)²
    * div n is a pure function of the corpus (no float accumulation at
    * all). Grouped by `groupCols` when given (per-slice monitoring);
    * one map-side-combined aggregation either way. Null rows are
    * excluded; an empty group yields no row (not a 0 score).
    */
  def brier(df: DataFrame, probX1e6Col: String, labelCol: String,
      groupCols: Seq[String] = Nil): DataFrame = {
    val grp = groupCols.map(col)
    val base = df
      .filter(col(probX1e6Col).isNotNull && col(labelCol).isNotNull)
      .withColumn("_r",
        (col(probX1e6Col).cast("decimal(38,0)") -
          when(col(labelCol) =!= 0, 1000000L).otherwise(0L)))
    val agg = if (grp.isEmpty) base.groupBy() else base.groupBy(grp: _*)
    agg
      .agg(
        count(lit(1)).as("n"),
        sum(when(col(labelCol) =!= 0, 1L).otherwise(0L)).as("n_pos"),
        sum(expr("_r * _r")).as("_sq"))
      .withColumn("brier_x1e12", expr("CAST(_sq div n AS BIGINT)"))
      .drop("_sq")
  }

  /** The ×1e6-quantized DCG discount table 1e6/log2(r+1) for ranks
    * 1..k — computed ONCE here and embedded as integer literals in
    * BOTH engines' programs (the gate SQL interpolates these values),
    * so ranking metrics involve ZERO runtime float operations and
    * cannot hit the libm-ulp cross-engine class.
    */
  def discountsX1e6(k: Int): Seq[Long] =
    (1 to k).map(r =>
      Math.round(1000000.0 / (Math.log(r + 1.0) / Math.log(2.0))))

  /** Retrieval-ranking evaluation — nDCG@k and reciprocal rank per
    * query over a retrieved-list relation `(qid, rank, rel)` with
    * `rank` 1-based and unique per query and `rel` a small integer
    * relevance grade (exponential gain 2^rel − 1).
    *
    * All-integer: DCG@k = Σ gain(rel)·w[rank] over the quantized
    * discount table [[discountsX1e6]] — a sum of exact integers, so
    * partial-aggregation order cannot matter; IDCG re-ranks the SAME
    * retrieved list by (rel desc, rank asc) via a per-query window
    * (≤ k rows per partition); `ndcg_ppm` = dcg·1e6 div idcg (null
    * when idcg = 0 — no relevant item, undefined). `rr_x1e6` =
    * 1e6 div first_rel_rank, 0 when no relevant item retrieved (the
    * MRR convention — missing counts against the system). A fleet
    * mean is then exact integer arithmetic over these per-query
    * integers: avg of `ndcg_ppm`/`rr_x1e6` longs.
    *
    * Scale shape: one filter + one window + one agg over the
    * retrieved relation (|queries|·k rows) — the corpus itself is
    * never touched; gains widen to DECIMAL(38,0) before the product
    * so any rel grade is safe.
    */
  def rankingMetrics(retrieved: DataFrame, qidCol: String, rankCol: String,
      relCol: String, k: Int = 10): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = discountsX1e6(k)
    val wArr = array(w.map(lit): _*)
    val topk = retrieved
      .filter(col(rankCol).isNotNull && col(relCol).isNotNull &&
        col(rankCol) >= 1 && col(rankCol) <= k)
    val idealW = Window.partitionBy(col(qidCol))
      .orderBy(col(relCol).desc, col(rankCol).asc)
    topk
      .withColumn("_gain",
        expr(s"CAST(shiftleft(CAST(1 AS BIGINT), CAST($relCol AS INT)) - 1 AS DECIMAL(38,0))"))
      .withColumn("_wsys", element_at(wArr, col(rankCol).cast("int")))
      .withColumn("_wideal", element_at(wArr, row_number().over(idealW)))
      .groupBy(col(qidCol))
      .agg(
        count(lit(1)).as("n_ret"),
        sum(when(col(relCol) > 0, 1L).otherwise(0L)).as("n_rel"),
        min(when(col(relCol) > 0, col(rankCol).cast("long"))).as("first_rel_rank"),
        sum(expr("_gain * _wsys")).as("_dcg"),
        sum(expr("_gain * _wideal")).as("_idcg"))
      .select(
        col(qidCol), col("n_ret"), col("n_rel"), col("first_rel_rank"),
        expr("CASE WHEN first_rel_rank IS NULL THEN CAST(0 AS BIGINT)" +
          " ELSE 1000000 div first_rel_rank END").as("rr_x1e6"),
        col("_dcg").cast("long").as("dcg_x1e6"),
        col("_idcg").cast("long").as("idcg_x1e6"),
        expr("CASE WHEN _idcg = 0 THEN NULL" +
          " ELSE CAST(_dcg * 1000000 div _idcg AS BIGINT) END").as("ndcg_ppm"))
  }

  /** Mutual information between two categorical columns — the
    * feature-relevance census a trainer runs to rank candidate
    * features against the label before paying for an encoding
    * (the reference hand-picks its feature columns; at 100 TB
    * relevance ranking is a one-scan question worth asking first).
    *
    * Output: one row per observed (x, y) cell — `x`, `y`, `n_xy`,
    * `n_x`, `n_y`, `mi_term_x1e9` = round(p_xy·ln(p_xy/(p_x·p_y))·1e9)
    * — plus the scalar `mi_x1e9` = Σ of the QUANTIZED terms repeated
    * on every row. Like the drift monitors' chi2 terms, the statistic
    * is summed only AFTER per-cell integer quantization: a float sum
    * over cells would be partial-aggregation-order-dependent (the
    * engine-split class), while the integer sum is exact in any
    * order; each term's ln input is the same correctly-rounded double
    * divisions on both engines. Null x/y rows are excluded
    * (documented; oracles must filter identically).
    *
    * ACCEPTED FLAKE-CLASS EXCEPTION (same class as the PSI/chi2
    * terms): `mi_term_x1e9` quantizes a libm `ln` product, and libm
    * logs are not correctly rounded — a term within an ulp of a .5
    * boundary could round differently across engines (and a 1-unit
    * split would also flip any ranking summed from the terms). This
    * is why the output ALSO ships the exact integer inputs (`n_xy`,
    * `n_x`, `n_y`): a consumer who needs engine-exact comparison can
    * re-derive MI from those; `mi_term_x1e9` is the convenience
    * projection. No exact integer formulation of Σ p·ln(...) exists
    * without arbitrary-precision rational arithmetic.
    *
    * Scale shape: ONE map-side-combined corpus agg to the cell
    * relation (bounded by |X|·|Y| distinct pairs); marginals are two
    * keyed aggs OVER THE CELLS, the total a 1-row broadcast — the
    * corpus is scanned exactly once.
    */
  def mutualInformation(df: DataFrame, xCol: String, yCol: String)
      : DataFrame = {
    val cells = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(xCol).as("x"), col(yCol).as("y"))
      .agg(count(lit(1)).as("n_xy"))
    val mx = cells.groupBy("x").agg(sum("n_xy").as("n_x"))
    val my = cells.groupBy("y").agg(sum("n_xy").as("n_y"))
    val tot = cells.agg(sum("n_xy").cast("double").as("_n"))
    val terms = cells
      .join(mx, Seq("x")).join(my, Seq("y"))
      .crossJoin(broadcast(tot))
      .withColumn("mi_term_x1e9",
        round((col("n_xy") / col("_n")) *
          log((col("n_xy") / col("_n")) /
            ((col("n_x") / col("_n")) * (col("n_y") / col("_n")))) *
          1e9).cast("long"))
    val mi = terms.agg(sum("mi_term_x1e9").as("mi_x1e9"))
    terms
      .crossJoin(broadcast(mi))
      .select(col("x"), col("y"), col("n_xy"), col("n_x"), col("n_y"),
        col("mi_term_x1e9"), col("mi_x1e9"))
  }

  /** SQuAD-style token-overlap F1 between a prediction and a reference
    * text per pair — the standard QA/eval-harness match metric, as a
    * distributed relation program. Overlap is the MULTISET
    * intersection Σ_w min(count_pred(w), count_ref(w)); precision =
    * overlap/|pred|, recall = overlap/|ref|, F1 = 2·overlap/(|pred| +
    * |ref|) — all exact integers shipped ×1e6.
    *
    * Tokenization is the gate convention (single-space split of
    * trimmed text) so oracles join on identical token sets; empty or
    * null texts yield null metrics (score undefined, not 0 — a pair
    * with BOTH sides empty has no tokens to match).
    *
    * Scale shape: explode each side to (pair, token) and count — two
    * map-side-combined aggs — then ONE equi-join on (pair, token)
    * (both sides hash-partitioned on the same key, no broadcast of a
    * corpus-sized side) and a final per-pair agg. Work is
    * token-relation-sized, never pairs².
    */
  def tokenF1(pairs: DataFrame, pairIdCol: String, predCol: String,
      refCol: String): DataFrame = {
    def counts(c: String, as: String) = pairs
      .select(col(pairIdCol).as("_pid"),
        explode(split(trim(col(c)), " ")).as("_tok"))
      .filter(length(col("_tok")) > 0)
      .groupBy("_pid", "_tok")
      .agg(count(lit(1)).as(as))
    val cp = counts(predCol, "_cp")
    val cr = counts(refCol, "_cr")
    val overlap = cp.join(cr, Seq("_pid", "_tok"))
      .groupBy("_pid")
      .agg(sum(least(col("_cp"), col("_cr"))).as("_ov"))
    val lens = pairs.select(
      col(pairIdCol).as("_pid"),
      size(filter(split(trim(col(predCol)), " "), t => length(t) > 0))
        .cast("long").as("_lp"),
      size(filter(split(trim(col(refCol)), " "), t => length(t) > 0))
        .cast("long").as("_lr"))
    lens
      .join(overlap, Seq("_pid"), "left")
      .na.fill(0L, Seq("_ov"))
      .select(
        col("_pid").as(pairIdCol),
        col("_lp").as("n_pred"),
        col("_lr").as("n_ref"),
        col("_ov").as("overlap"),
        expr("CASE WHEN _lp <= 0 THEN NULL" +
          " ELSE CAST(CAST(_ov AS DECIMAL(38,0)) * 1000000 div _lp AS BIGINT) END")
          .as("precision_x1e6"),
        expr("CASE WHEN _lr <= 0 THEN NULL" +
          " ELSE CAST(CAST(_ov AS DECIMAL(38,0)) * 1000000 div _lr AS BIGINT) END")
          .as("recall_x1e6"),
        expr("CASE WHEN _lp + _lr <= 0 THEN NULL" +
          " ELSE CAST(2 * CAST(_ov AS DECIMAL(38,0)) * 1000000 div (_lp + _lr) AS BIGINT) END")
          .as("f1_x1e6"))
  }
}
