package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection via importance resampling
  * (Xie et al. 2023, arXiv:2302.03169): rank a raw corpus by how much
  * more likely each document is under a hashed-n-gram bag-of-features
  * model of a small TARGET corpus than under the same model fit on the
  * raw corpus itself, then keep the top of the ranking (optionally with
  * Gumbel noise, which turns top-k into importance RESAMPLING).
  *
  * Cluster shape: the "model" is never driver state — it is one bucket
  * count RELATION per side plus a single-row totals frame that rides
  * the plan via a crossJoin (the same shape as the corpus-LM gates).
  * Scoring is explode → md5-bucket → two hash-partitioned left joins +
  * one per-doc agg: every stage is a keyed shuffle over token-sized
  * relations, no driver vocabulary, no collect. At 100 TB the bucket
  * relation is capped at 16^prefixLen rows per side and broadcasts.
  *
  * Buckets are md5-hex prefixes of the token (string keys, not
  * hash-mod-m integers) so an external SQL engine reproduces the exact
  * same feature map — the repo's shingle-key convention.
  */
object Dsir {

  /** (id, bucket) token stream: whitespace tokens → md5-hex-prefix
    * buckets (16^prefixLen distinct buckets).
    */
  private def buckets(df: DataFrame, idCol: String, textCol: String,
      prefixLen: Int, extra: Seq[String] = Nil): DataFrame =
    df.filter(col(textCol).isNotNull)
      .select((col(idCol) +: extra.map(col)) :+
        explode(graft.core.Text.whitespaceTokens(col(textCol))).as("_tok"): _*)
      .filter(col("_tok") =!= "")
      .withColumn("bucket", substring(md5(col("_tok")), 1, prefixLen))
      .drop("_tok")

  /** Fitted importance model: per-bucket counts on both sides (full
    * outer merged — absent side null) and the single-row totals frame
    * `(_t_target, _t_raw)`. `numBuckets` = 16^prefixLen is the
    * add-one-smoothing denominator term.
    */
  final case class Model(bucketCounts: DataFrame, totals: DataFrame,
      prefixLen: Int) {
    def numBuckets: Long = {
      var m = 1L; (0 until prefixLen).foreach(_ => m *= 16); m
    }
  }

  /** Fit bucket count relations for the target and raw corpora. The
    * two corpora may overlap (DSIR's raw side is the full corpus).
    */
  def fit(target: DataFrame, raw: DataFrame, idCol: String,
      textCol: String, prefixLen: Int = 4): Model = {
    val t = buckets(target, idCol, textCol, prefixLen)
      .groupBy("bucket").agg(count(lit(1)).as("_c_target"))
    val r = buckets(raw, idCol, textCol, prefixLen)
      .groupBy("bucket").agg(count(lit(1)).as("_c_raw"))
    val merged = t.join(r, Seq("bucket"), "full_outer")
    val totals = merged.agg(
      coalesce(sum("_c_target"), lit(0L)).as("_t_target"),
      coalesce(sum("_c_raw"), lit(0L)).as("_t_raw"))
    Model(merged, totals, prefixLen)
  }

  /** Per-document importance log-weight
    * `Σ_tokens ln p_target(bucket) − ln p_raw(bucket)` with add-one
    * smoothing over the 16^prefixLen bucket space, plus the raw token
    * count. Positive ⇒ the doc looks more like the target corpus than
    * like the raw corpus. Docs with null/empty text get no row (the
    * caller's census joins them back if it needs every input row).
    */
  def score(df: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame = {
    val m = lit(model.numBuckets.toDouble)
    val lp = (c: Column, t: Column) =>
      log((coalesce(c, lit(0L)).cast("double") + 1.0) / (t.cast("double") + m))
    buckets(df, idCol, textCol, model.prefixLen)
      .join(model.bucketCounts, Seq("bucket"), "left")
      .crossJoin(broadcast(model.totals))
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(lp(col("_c_target"), col("_t_target")) -
          lp(col("_c_raw"), col("_t_raw"))).as("log_weight"))
  }

  /** Length-normalized, corpus-centered importance score. Raw DSIR
    * log-weights are only defined up to an additive per-token constant
    * (the smoothing mass and the target/raw size imbalance shift every
    * doc by the same offset), so an absolute `log_weight > 0` cut is
    * meaningless — the paper's selection is rank-based for exactly this
    * reason. `rel_weight` = per-token log-weight minus the corpus mean
    * of the same quantity: positive means "more target-like than the
    * average raw document", a threshold that survives any smoothing
    * constant. The mean is a 1-row broadcast riding the plan.
    */
  def centered(scored: DataFrame): DataFrame = {
    val mu = scored.agg(
      avg(col("log_weight") / col("n_tokens")).as("_mu"))
    scored.crossJoin(broadcast(mu))
      .withColumn("rel_weight",
        col("log_weight") / col("n_tokens") - col("_mu"))
      .drop("_mu")
  }

  /** Gumbel top-k importance resampling over scored docs: key each row
    * by `log_weight + Gumbel(0,1)` and keep the k largest — equivalent
    * to sampling k docs without replacement with probability ∝ exp
    * (log_weight) (Vieira 2014, "Gumbel-max trick"). The noise is
    * derived from xxhash64(id, seed) so the draw is deterministic,
    * re-runnable, and independent of partitioning; one distributed
    * top-k (sort-limit), no RNG state, no collect.
    */
  def gumbelTopK(scored: DataFrame, idCol: String, k: Int,
      seed: Long): DataFrame = {
    // u ∈ (0,1): 53 uniform bits from the hash; shiftrightunsigned
    // keeps the double conversion exact
    val u = (shiftrightunsigned(xxhash64(col(idCol), lit(seed)), 11)
      .cast("double") + 0.5) / lit(9007199254740992.0) // 2^53
    val gumbel = -log(-log(u))
    scored.withColumn("_gkey", col("log_weight") + gumbel)
      .orderBy(col("_gkey").desc)
      .limit(k)
      .drop("_gkey")
  }
}
