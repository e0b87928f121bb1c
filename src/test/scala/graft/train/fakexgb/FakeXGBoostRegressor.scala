package graft.train.fakexgb

import org.apache.spark.sql.Dataset

/** Test stand-in implementing exactly the reflective surface
  * `Boosters.trainNativeBooster` drives on xgboost4j-spark
  * (constructor taking a params Map, MLlib-style col setters, `fit`,
  * `nativeBooster.saveModel`) — so the probe's "jars present" mode is
  * exercised without the real jars on the zero-egress classpath.
  */
class FakeXGBoostRegressor(params: Map[String, Any]) {
  private var featuresCol = "features"
  private var labelCol = "label"
  private var weightCol = ""

  def setFeaturesCol(c: String): FakeXGBoostRegressor = { featuresCol = c; this }
  def setLabelCol(c: String): FakeXGBoostRegressor = { labelCol = c; this }
  def setWeightCol(c: String): FakeXGBoostRegressor = { weightCol = c; this }

  def fit(df: Dataset[_]): FakeXGBoostRegressionModel = {
    // touch the frame like a real estimator would — the columns must
    // actually exist
    val n = df.select(featuresCol, labelCol, weightCol).count()
    new FakeXGBoostRegressionModel(params, n)
  }
}

class FakeXGBoostRegressionModel(params: Map[String, Any], n: Long) {
  def nativeBooster: FakeBooster =
    new FakeBooster(s"""fake-xgb-booster rows=$n params=${
      params.toSeq.sortBy(_._1).mkString(",")}""")
}

class FakeBooster(content: String) {
  def saveModel(path: String): Unit =
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      content.getBytes("UTF-8"))
}
