package graft.encoding

import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.{FlatValue, JsonFlattener, StringTable}
import graft.schema.Schema

/** Feature encoding pipeline (reference: src/trainer/code/
  * feature_flattener.py, feature_selection.py, string_encoder.py,
  * feature_encoder.py), re-expressed as DataFrame transforms:
  *
  *   - flatten: item/context JSON → numeric + string dot-path maps
  *     (bool → 1/0, null/{}/[] dropped);
  *   - feature selection (G3): Σ row-weight per feature, top-K —
  *     explode + hash-agg + orderBy/limit, all partial-aggregated;
  *   - string tables (G2/G4): per (feature, string) Σw / Σ(y·w) /
  *     count, pruned and ranked by Bayesian mean target, hashed
  *     collision-free (xxh3) — the tables are the ONLY driver-side
  *     materialization, bounded at maxFeatures × maxStringsPerFeature;
  *   - vector encode: feature maps → dense ml.Vector in a fixed
  *     feature order, strings via broadcast string tables, optional
  *     per-row "population id" noise (sprinkle).
  */
object Encoding {

  val WeightCol = "w"
  val TargetCol = "y"
  val TimestampFeature = "t"

  // ---- flatten -----------------------------------------------------------

  /** (item, context) JSON → (numeric features, string features). */
  def flattenPair(itemJson: String, contextJson: String): (Map[String, Double], Map[String, String]) = {
    val flat = JsonFlattener.flattenRecord(itemJson, contextJson)
    val nums = Map.newBuilder[String, Double]
    val strs = Map.newBuilder[String, String]
    flat.foreach {
      case (k, FlatValue.Num(v)) => nums += k -> v
      case (k, FlatValue.Str(v)) => strs += k -> v
    }
    (nums.result(), strs.result())
  }

  /** KSUID → epoch-seconds double, NaN for undecodable ids (NaN, not
    * null: the value lands in a non-null-valued feature map and the
    * vector encoder treats NaN as missing). Native codegen decode.
    */
  val ksuidTimestamp: Column => Column = c =>
    coalesce(
      graft.functions.KsuidExpressions.ksuidTimestamp(c).cast("double"),
      lit(Double.NaN))

  /** Adds `nums` / `strs` map columns from item+context JSON columns —
    * a native codegen expression (graft.functions.FlattenJsonExpression),
    * not a UDF: this projection runs on every row of both training
    * phases, so it must not break the WholeStageCodegen span or pay
    * per-row encoder conversions.
    */
  def withFlatFeatures(df: DataFrame, itemCol: String = Schema.Item,
      contextCol: String = Schema.Context,
      numsCol: String = "nums", strsCol: String = "strs"): DataFrame =
    df.withColumn("_flat",
        graft.functions.FlattenJsonExpression.flatten(col(itemCol), col(contextCol)))
      .withColumn(numsCol, col("_flat.nums"))
      .withColumn(strsCol, col("_flat.strs"))
      .drop("_flat")

  // ---- propensity row expansion (UDTF analogue) --------------------------

  /** One decision row → (chosen item, w=1, y=1) + (sample, w=count−1,
    * y=0) when count > 1; context and KSUID timestamp replicated
    * (reference propensities.py:130-165). Pure column program:
    * array(struct…) → filter(w > 0) → explode.
    */
  def expandForPropensity(df: DataFrame): DataFrame = {
    val rows = array(
      struct(col(Schema.Item).as("payload"), lit(1.0).as(WeightCol), lit(1.0).as(TargetCol)),
      struct(col(Schema.Sample).as("payload"),
        (coalesce(col(Schema.Count), lit(1.0)) - 1.0).as(WeightCol), lit(0.0).as(TargetCol)))
    df.select(
        col(Schema.DecisionId), col(Schema.Context),
        explode(filter(rows, r => r.getField(WeightCol) > 0)).as("_r"))
      .select(
        col(Schema.DecisionId),
        col("_r.payload").as(Schema.Item),
        col(Schema.Context),
        col("_r." + WeightCol).as(WeightCol),
        col("_r." + TargetCol).as(TargetCol))
      .withColumn("_t", ksuidTimestamp(col(Schema.DecisionId)))
  }

  // ---- feature selection (G3) --------------------------------------------

  /** Top-K feature names by Σ row weight (w/y excluded; `t` competes
    * like any numeric feature). Deterministic tiebreak by name.
    */
  def selectFeatures(df: DataFrame, maxFeatures: Int): Seq[String] = {
    val allKeys = concat(map_keys(col("nums")), map_keys(col("strs")))
    df.select(explode(allKeys).as("feature"), col(WeightCol))
      .filter(!col("feature").isin(WeightCol, TargetCol))
      .groupBy("feature").agg(sum(WeightCol).as("fw"))
      .orderBy(desc("fw"), asc("feature"))
      .limit(maxFeatures)
      .collect().map(_.getString(0)).toSeq
  }

  // ---- string tables (G2 + G4) -------------------------------------------

  /** Per-feature ranked string lists → collision-free hash tables.
    * Rank = Bayesian mean target with prior, descending; strings with
    * count ≤ pruneMinCount dropped; top maxStringsPerFeature by weight
    * kept (reference string_encoder.py:104-181).
    */
  def buildStringTables(df: DataFrame, featureNames: Seq[String], modelSeed: Long,
      priorMean: Double = 0.0, priorCount: Int = 0,
      pruneMinCount: Int = 20, maxStringsPerFeature: Int = 10000): Map[String, Seq[Long]] = {
    val allowed = featureNames.toSet
    // everything except the final (bounded) tables stays distributed:
    // non-selected features are filtered BEFORE aggregation and each
    // feature is truncated to its top-maxStrings by weight with a
    // window, so the driver never sees more than
    // |featureNames| × maxStringsPerFeature rows
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("feature").orderBy(desc("weight"), asc("value"))
    val stats = df
      .select(explode(col("strs")).as(Seq("feature", "value")), col(WeightCol), col(TargetCol))
      .filter(col("feature").isin(allowed.toSeq: _*))
      .groupBy("feature", "value")
      .agg(
        sum(WeightCol).as("weight"),
        sum(col(TargetCol) * col(WeightCol)).as("target"),
        count(lit(1)).as("cnt"))
      .filter(col("cnt") > pruneMinCount)
      .withColumn("_rank", row_number().over(w))
      .filter(col("_rank") <= maxStringsPerFeature)
      .drop("_rank")
      .collect()
      .groupBy(_.getString(0))

    stats.map { case (feature, rows) =>
      // rank by mean target with prior, descending; the value tiebreak
      // makes the key total, so no pre-sort is needed for determinism
      val ranked = rows.sortBy { r =>
        val (w, t, c) = (r.getDouble(2), r.getDouble(3), r.getLong(4))
        val priorWeight = priorCount * w / c
        (-((t + priorMean * priorWeight) / (w + priorWeight)), r.getString(1))
      }.map(_.getString(1)).toSeq
      feature -> StringTable.buildHashTable(ranked, modelSeed)
    }
  }

  // ---- noise / weights ---------------------------------------------------

  /** sprinkle: (x + shift) · scale with shift = u·2⁻¹⁴², scale =
    * 1 + u·2⁻¹⁷ — keeps values ~unchanged while making rows with the
    * same noise u distinguishable (feature_encoder.py:158-168).
    */
  private val SprinkleSmallNoise = math.pow(2, -142)
  private val SprinkleLargeNoise = math.pow(2, -17)

  def sprinkle(x: Double, noise: Double): Double =
    (x + noise * SprinkleSmallNoise) * (1 + noise * SprinkleLargeNoise)

  /** P(Poisson(1) > 0) = 1 − 1/e ≈ 0.632 — when exploring, the zero
    * mass of the bootstrap is realized by sampling records at THIS
    * rate at load time; survivors then get zero-rejected weights, so
    * the expected weight per original record stays 1
    * (reference exploration.py:8-25, decision_trainer.py:43-45).
    */
  val NonZeroPoissonProbability: Double = 1.0 - 1.0 / math.E

  /** Zero-rejected Poisson(1) weight via inverse CDF of u ∈ [0,1):
    * P(k | k>0) = e⁻¹/k! / (1 − e⁻¹) (exploration.py:8-25).
    */
  def nonZeroPoissonWeight(u: Double): Double = {
    var k = 1
    var pk = 1.0 / (math.E - 1) // P(1 | k>0)·… cumulative walk
    var cdf = pk
    while (u > cdf && k < 32) {
      k += 1
      pk /= k
      cdf += pk
    }
    k.toDouble
  }

  /** Native codegen spelling of [[nonZeroPoissonWeight]] — see
    * graft.functions.NonZeroPoissonExpression.
    */
  def nonZeroPoisson(u: Column): Column =
    graft.functions.EncodeExpressions.nonZeroPoisson(u)

  // ---- vector encoding ---------------------------------------------------

  /** Dense vector in `featureNames` order: numerics as-is, strings via
    * their table, missing → 0.0 (MLlib GBT cannot route NaN the way
    * XGBoost does — documented deviation), everything sprinkled with
    * the row's noise.
    */
  def makeVectorEncoder(featureNames: Seq[String], tables: Map[String, Seq[Long]],
      modelSeed: Long): (Map[String, Double], Map[String, String], Double) => Vector = {
    val names = featureNames.toArray
    val stringTables: Map[String, StringTable] =
      tables.map { case (k, v) => k -> new StringTable(v, modelSeed) }
    val emptyTable = new StringTable(Seq.empty, modelSeed)
    (nums, strs, noise) => {
      val arr = new Array[Double](names.length)
      var i = 0
      while (i < names.length) {
        val name = names(i)
        nums.get(name) match {
          // NaN (e.g. ksuidTimestamp's undecodable-id fallback) is
          // MISSING, not a value: sprinkling it would put NaN in the
          // dense vector, and MLlib GBT split evaluation cannot route
          // NaN (the documented 0.0-for-missing deviation)
          case Some(v) if !v.isNaN => arr(i) = sprinkle(v, noise)
          case Some(_) => arr(i) = 0.0
          case None => strs.get(name) match {
            case Some(s) =>
              arr(i) = sprinkle(stringTables.getOrElse(name, emptyTable).encode(s), noise)
            case None => arr(i) = 0.0
          }
        }
        i += 1
      }
      Vectors.dense(arr)
    }
  }

  /** Adds a `features` vector column (and keeps w/y). `noiseCol` null →
    * no sprinkle (noise 0). Native codegen expression (bit-identical
    * to [[makeVectorEncoder]], which remains the serving-path/spec
    * reference): the string tables ride the plan, the maps are read as
    * raw MapData, and the encode stage stays inside WholeStageCodegen.
    */
  def withFeatureVector(df: DataFrame, featureNames: Seq[String],
      tables: Map[String, Seq[Long]], modelSeed: Long,
      noiseCol: Option[Column] = None,
      numsCol: String = "nums", strsCol: String = "strs",
      outputCol: String = "features"): DataFrame =
    df.withColumn(outputCol,
      graft.functions.EncodeExpressions.featureVector(
        col(numsCol), col(strsCol), noiseCol.getOrElse(lit(0.0)),
        featureNames, tables, modelSeed))
}
