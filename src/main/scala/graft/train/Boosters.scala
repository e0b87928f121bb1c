package graft.train

import org.apache.spark.sql.DataFrame

/** Runtime probe for XGBoost4J-Spark (reference booster parity:
  * model_utils.py:33-106, decision_trainer.py:28-36, 85-94).
  *
  * The reference ships `.xgb` native boosters, which iOS/consumer
  * tooling loads directly. The zero-egress classpath has no XGBoost4J
  * jars, so the engine's scoring model is MLlib GBT (objective parity
  * documented in COVERAGE §2.11) — but when XGBoost4J IS present on
  * the classpath (e.g. dropped into the Spark jars dir of a real
  * cluster), training ALSO emits a genuine native booster trained on
  * the same encoded frame with the mapped hyperparameters, so a user
  * of the reference can keep loading `.xgb` artifacts unchanged.
  *
  * Everything here is reflective: the engine must compile and run
  * without the jars, and their presence is strictly a runtime
  * property. The reflective surface is the stable public API of
  * xgboost4j-spark (constructor `new XGBoostRegressor(Map)`, MLlib
  * setters, `fit`, `nativeBooster.saveModel`). Both probe outcomes
  * are spec-exercised via a fake class implementing the same surface.
  */
object Boosters {

  /** xgboost4j-spark's regressor (stable since 1.x, incl. 2.x/3.x). */
  val XgbRegressorClass = "ml.dmlc.xgboost4j.scala.spark.XGBoostRegressor"

  def available(className: String = XgbRegressorClass,
      cl: ClassLoader = getClass.getClassLoader): Boolean =
    try { Class.forName(className, false, cl); true }
    catch { case _: ClassNotFoundException => false }

  /** Reference-mapped phase-2 hyperparameters (decision_trainer.py:85-94,
    * config.py:92-98): squared-error objective, hist tree method, no
    * early stop.
    */
  def decisionParams(config: Trainer.TrainConfig, seed: Long): Map[String, Any] = Map(
    "objective" -> "reg:squarederror",
    "tree_method" -> "hist",
    "max_depth" -> config.treeDepth,
    "num_round" -> config.maxTrees,
    "seed" -> seed)

  /** Train a native booster on an encoded (features, label, w) frame
    * and return its serialized `.xgb` bytes — None when XGBoost4J (or
    * the named stand-in) is not on the classpath. Reflection failures
    * AFTER a successful probe are real errors and propagate: silently
    * shipping no artifact when the user installed the jars would be a
    * silent contract break.
    */
  def trainNativeBooster(encoded: DataFrame, params: Map[String, Any],
      weightCol: String = graft.encoding.Encoding.WeightCol,
      className: String = XgbRegressorClass,
      cl: ClassLoader = getClass.getClassLoader): Option[Array[Byte]] = {
    if (!available(className, cl)) return None
    val cls = Class.forName(className, true, cl)
    val est = cls.getConstructor(classOf[Map[_, _]])
      .newInstance(params).asInstanceOf[AnyRef]

    def call1(target: AnyRef, name: String, arg: AnyRef): AnyRef =
      target.getClass.getMethods
        .find(m => m.getName == name && m.getParameterCount == 1)
        .getOrElse(throw new NoSuchMethodException(s"$name on ${target.getClass}"))
        .invoke(target, arg)

    val configured = call1(call1(call1(est,
      "setFeaturesCol", "features"),
      "setLabelCol", "label"),
      "setWeightCol", weightCol)
    val model = call1(configured, "fit", encoded)
    val nativeBooster = model.getClass.getMethod("nativeBooster").invoke(model)
    val tmp = java.nio.file.Files.createTempFile("graft_booster", ".xgb")
    try {
      call1(nativeBooster, "saveModel", tmp.toString)
      Some(java.nio.file.Files.readAllBytes(tmp))
    } finally { java.nio.file.Files.deleteIfExists(tmp); () }
  }

  /** The conventional artifact filename inside a model directory. */
  val NativeBoosterFile = "model.xgb"
}
