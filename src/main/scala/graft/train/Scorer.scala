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
    * The flatten and vector-encode stages are the native codegen
    * expressions from the training path (no per-row Scala UDF of our
    * own); only MLlib's `transform` prediction call remains opaque.
    * Internals live in `__score_`-prefixed columns and the model copy
    * reads/writes those, so caller columns named `features`,
    * `prediction`, `nums`, etc. pass through untouched (only a
    * pre-existing `score` column is replaced).
    */
  def score(df: DataFrame, dm: DecisionModel,
      itemCol: String = "item", contextCol: String = "context"): DataFrame = {
    val flat = F.col("__score_flat")
    val encoded = df
      .withColumn("__score_flat",
        graft.functions.FlattenJsonExpression.flatten(F.col(itemCol), F.col(contextCol)))
      .withColumn("__score_features",
        graft.functions.EncodeExpressions.featureVector(
          flat.getField("nums"), flat.getField("strs"), F.lit(0.0),
          dm.featureNames, dm.stringTables, dm.modelSeed))
      .drop("__score_flat")
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
