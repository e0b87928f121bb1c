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
    * Intermediate columns (`nums`/`strs`/`features`/`prediction`) are
    * claimed during scoring and dropped from the result.
    */
  def score(df: DataFrame, dm: DecisionModel,
      itemCol: String = "item", contextCol: String = "context"): DataFrame = {
    val flat = Encoding.withFlatFeatures(df, itemCol, contextCol)
    val encoded = Encoding.withFeatureVector(
      flat, dm.featureNames, dm.stringTables, dm.modelSeed)
    dm.model.transform(encoded)
      .withColumn("score",
        F.col("prediction") * F.lit(dm.rewardStd) + F.lit(dm.rewardMean))
      .drop("nums", "strs", "features", "prediction")
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
