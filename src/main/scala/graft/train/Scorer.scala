package graft.train

import org.apache.spark.sql.{DataFrame, functions => F}

import graft.encoding.Encoding
import graft.train.Trainer.DecisionModel

/** Scoring with a trained decision model — the engine-side analogue of
  * the reference's client ranking: encode candidate (item, context)
  * JSON pairs with the model's string tables and predict expected
  * (normalized) reward; `score` de-normalizes back to reward units.
  */
object Scorer {

  /** Adds `score` (reward units) to a DataFrame with item/context JSON
    * string columns. Encoding runs distributed; the model broadcasts.
    *
    * The flatten and vector-encode stages are the SAME
    * `Encoding.withFlatFeatures`/`withFeatureVector` calls the
    * training path makes (output columns redirected) — one encode
    * recipe, no training/serving skew; only MLlib's `transform`
    * prediction call remains opaque. Internals live in
    * `__score_`-prefixed columns (a RESERVED prefix: caller columns
    * named `__score_*` are clobbered), so ordinary caller columns —
    * including `features`, `prediction`, `nums`, `strs` — pass
    * through untouched; only a pre-existing `score` column is
    * replaced.
    */
  def score(df: DataFrame, dm: DecisionModel,
      itemCol: String = "item", contextCol: String = "context"): DataFrame = {
    val flat = Encoding.withFlatFeatures(df, itemCol, contextCol,
      numsCol = "__score_nums", strsCol = "__score_strs")
    val encoded = Encoding.withFeatureVector(
        flat, dm.featureNames, dm.stringTables, dm.modelSeed,
        numsCol = "__score_nums", strsCol = "__score_strs",
        outputCol = "__score_features")
      .drop("__score_nums", "__score_strs")
    val model = dm.model.copy(org.apache.spark.ml.param.ParamMap.empty)
      .setFeaturesCol("__score_features")
      .setPredictionCol("__score_prediction")
    model.transform(encoded)
      .withColumn("score",
        F.col("__score_prediction") * F.lit(dm.rewardStd) + F.lit(dm.rewardMean))
      .drop("__score_features", "__score_prediction")
  }

  /** Rank candidate items for one context: highest expected reward
    * first (deterministic tiebreak on the item payload).
    */
  def rank(spark: org.apache.spark.sql.SparkSession, dm: DecisionModel,
      itemsJson: Seq[String], contextJson: String): Seq[(String, Double)] = {
    import spark.implicits._
    score(itemsJson.toDF("item").withColumn("context", F.lit(contextJson)), dm)
      .select("item", "score")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .sortBy(p => (-p._2, p._1)).toSeq
  }
}
