package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained n-gram language-model scoring — the CCNet-style
  * quality filter (Wenzek et al. 2020: a small LM scores every
  * document; the corpus is split into perplexity bands and the
  * low-quality tail is dropped or down-weighted).
  *
  * The reference pipeline has no LM filter (its records are structured
  * events); this is part of the extension surface a 100 TB
  * pretraining-data engine needs. The unigram variant ships as the
  * `q_lm_score` gate; this operator is the production-shaped upgrade:
  * a BIGRAM model with Jelinek–Mercer interpolation against an
  * add-one-smoothed unigram floor,
  *
  *   p(w | v) = λ · c(v,w)/c(v·) + (1 − λ) · (c(w) + 1)/(T + V)
  *
  * so unseen bigrams (held-out scoring) still get nonzero mass.
  *
  * Spark-first scale shape: the "model" IS two count relations
  * (unigrams, bigrams) built by one groupBy each over the exploded
  * token/bigram streams — corpus-sized tables, never a driver-side
  * vocabulary, never broadcast. Scoring is three hash-partitioned
  * equi-joins (bigram counts on (prev, tok), context totals on prev,
  * unigram counts on tok) plus a 1-row totals cross join kept IN the
  * plan, then one per-doc aggregation. Every step is a pure column
  * program (whole-stage codegen; the only non-arithmetic op is ln),
  * so the plan survives a 100× scale-up unchanged. Persist the two
  * relations as parquet to reuse a trained model across corpora.
  */
object LangModel {

  /** The trained model as relations + in-plan scalars:
    *   - `unigrams`: (tok, c_w) — token counts
    *   - `bigrams`: (prev, tok, c_vw) — adjacent-pair counts
    *   - `totals`: single row (_t total tokens, _v vocab size)
    * All three are lazy plans over the training corpus; callers that
    * score repeatedly should persist or write them out.
    */
  final case class Model(unigrams: DataFrame, bigrams: DataFrame,
      totals: DataFrame)

  /** One row per adjacent token pair per document: (id, prev, tok).
    * Tokenizes on runs of whitespace, the repo-wide convention.
    */
  private def bigramEvents(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val words = graft.core.Text.whitespaceTokens(col(textCol))
    df.filter(col(textCol).isNotNull)
      .select(col(idCol),
        explode(arrays_zip(
          slice(words, lit(1), greatest(size(words) - 1, lit(0))).as("prev"),
          slice(words, lit(2), greatest(size(words) - 1, lit(0))).as("tok")))
          .as("bg"))
      .select(col(idCol), col("bg.prev").as("prev"), col("bg.tok").as("tok"))
  }

  /** Train the bigram model: two groupBy passes over the exploded
    * streams. Empty/whitespace-only documents contribute nothing.
    */
  def train(df: DataFrame, idCol: String, textCol: String): Model = {
    val toks = df.filter(col(textCol).isNotNull)
      .select(explode(graft.core.Text.whitespaceTokens(col(textCol))).as("tok"))
      .filter(col("tok") =!= "")
    val unigrams = toks.groupBy("tok").agg(count(lit(1)).as("c_w"))
    val bigrams = bigramEvents(df, idCol, textCol)
      .groupBy("prev", "tok").agg(count(lit(1)).as("c_vw"))
    val totals = toks.agg(count(lit(1)).as("_t"),
      countDistinct(col("tok")).as("_v"))
    Model(unigrams, bigrams, totals)
  }

  /** Score documents under the model: one row per input row with
    *   - `n_bigrams`: scored events (token count − 1, 0 for short docs)
    *   - `xent`: cross-entropy in nats, −(1/m)·Σ ln p(w|v) — null for
    *     documents with no bigram (m = 0: a 0/0 has no defined score;
    *     callers census them separately rather than silently binning)
    *   - `ppl`: exp(xent)
    * Unseen bigrams/contexts/tokens (held-out corpora) fall back to
    * the interpolation floor via coalesce(count, 0).
    */
  def scorePerplexity(df: DataFrame, idCol: String, textCol: String,
      model: Model, lambda: Double = 0.9): DataFrame = {
    require(lambda >= 0 && lambda <= 1, s"lambda must be in [0,1], got $lambda")
    val events = bigramEvents(df, idCol, textCol)
    val pMl = coalesce(col("c_vw"), lit(0L)).cast("double") /
      coalesce(col("c_v"), lit(1L))
    val pUni = (coalesce(col("c_w"), lit(0L)) + 1).cast("double") /
      (col("_t") + col("_v"))
    val contexts = model.bigrams.groupBy("prev").agg(sum("c_vw").as("c_v"))
    val scored = events
      .join(model.bigrams, Seq("prev", "tok"), "left")
      .join(contexts, Seq("prev"), "left")
      .join(model.unigrams, Seq("tok"), "left")
      .crossJoin(model.totals)
      .withColumn("_lp", log(lit(lambda) * pMl + lit(1 - lambda) * pUni))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), (-avg("_lp")).as("xent"))
    df.join(scored, Seq(idCol), "left")
      .withColumn("n_bigrams", coalesce(col("n_bigrams"), lit(0L)))
      .withColumn("ppl", exp(col("xent")))
  }

  /** CCNet-style band labels over a scored frame: `head` below `lo`,
    * `tail` above `hi`, `middle` between, `short` for unscorable
    * (null-xent) documents. Thresholds are cross-entropy nats —
    * calibrate per corpus (CCNet uses per-language percentiles of a
    * held-out sample; percentile cutoffs stay reproducible only if
    * computed once and passed here as literals).
    */
  def perplexityBand(scored: DataFrame, lo: Double, hi: Double): DataFrame = {
    require(lo <= hi, s"lo must be <= hi, got $lo > $hi")
    scored.withColumn("band",
      when(col("xent").isNull, lit("short"))
        .when(col("xent") < lo, lit("head"))
        .when(col("xent") > hi, lit("tail"))
        .otherwise(lit("middle")))
  }
}
