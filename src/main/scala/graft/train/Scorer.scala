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
    */
  def score(df: DataFrame, dm: DecisionModel,
      itemCol: String = "item", contextCol: String = "context"): DataFrame = {
    val enc = Encoding.makeVectorEncoder(dm.featureNames, dm.stringTables, dm.modelSeed)
    val model = dm.model
    val mean = dm.rewardMean
    val std = dm.rewardStd
    val scoreUdf = F.udf((item: String, context: String) => {
      val (nums, strs) = Encoding.flattenPair(item, context)
      model.predict(enc(nums, strs, 0.0)) * std + mean
    })
    df.withColumn("score", scoreUdf(F.col(itemCol), F.col(contextCol)))
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
