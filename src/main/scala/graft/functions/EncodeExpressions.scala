package graft.functions

import org.apache.spark.ml.linalg.{SQLDataTypes, Vector, Vectors}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.graftshim.GraftColumn
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.StringTable

/** Native codegen expressions for the last per-row UDFs on the
  * training hot path (reference: src/trainer/code/feature_encoder.py
  * and string_encoder.py:171-226 for the vector encode,
  * exploration.py:8-25 for the Poisson weight): the string-table /
  * dense-vector encode, the zero-rejected Poisson(1) weight, and the
  * probability-vector element extract. Each carries its model data
  * (feature order, string tables) on the expression — ≤ maxFeatures ×
  * maxStringsPerFeature longs, plan-literal-sized, shipped once with
  * the plan — so `q_rdr_train`'s encode stage stays inside
  * WholeStageCodegen with no per-row Map[String, _] re-boxing.
  *
  * Arithmetic is kept ORDER-IDENTICAL to the UDFs these replace
  * (same sprinkle placement, same miss-path scaling, same k-walk), so
  * every gate hash is unchanged; bit-identity is spec-proven
  * (`EncodeExpressionsSpec`).
  */
object EncodeExpressions {

  def featureVector(nums: Column, strs: Column, noise: Column,
      featureNames: Seq[String], tables: Map[String, Seq[Long]],
      modelSeed: Long): Column =
    GraftColumn.of(FeatureVectorExpression(
      GraftColumn.expr(nums), GraftColumn.expr(strs),
      GraftColumn.expr(noise.cast("double")),
      featureNames.toIndexedSeq,
      tables.map { case (k, v) => k -> v.toIndexedSeq },
      modelSeed))

  def nonZeroPoisson(u: Column): Column =
    GraftColumn.of(NonZeroPoissonExpression(GraftColumn.expr(u.cast("double"))))

  def vectorElement(v: Column, i: Int): Column =
    GraftColumn.of(VectorElementExpression(GraftColumn.expr(v), i))
}

/** feature maps → dense ml.Vector in `featureNames` order: numerics
  * as-is (NaN = missing → 0.0), strings via their table, absent → 0.0,
  * everything sprinkled with the row's noise — exactly
  * `Encoding.makeVectorEncoder`, evaluated on raw MapData. A feature
  * present in `nums` shadows the same key in `strs` (the encoder's
  * nums-first lookup order); null map values are treated as absent.
  */
case class FeatureVectorExpression(nums: Expression, strs: Expression, noise: Expression,
    featureNames: IndexedSeq[String], tables: Map[String, IndexedSeq[Long]],
    modelSeed: Long) extends TernaryExpression {

  override def first: Expression = nums
  override def second: Expression = strs
  override def third: Expression = noise

  override def dataType: DataType = SQLDataTypes.VectorType
  override def prettyName: String = "encode_feature_vector"

  override def checkInputDataTypes(): TypeCheckResult =
    (nums.dataType, strs.dataType, noise.dataType) match {
      case (MapType(StringType, DoubleType, _), MapType(StringType, StringType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (MAP<STRING,DOUBLE>, MAP<STRING,STRING>, DOUBLE), got $other")
    }

  @transient private lazy val vecUdt =
    SQLDataTypes.VectorType.asInstanceOf[UserDefinedType[Vector]]

  // UTF8String-keyed index: map entries compare bytes directly, no
  // per-entry String materialization on the numeric path
  @transient private lazy val nameIdx: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](featureNames.length * 2)
    var i = 0
    while (i < featureNames.length) {
      m.put(UTF8String.fromString(featureNames(i)), Integer.valueOf(i))
      i += 1
    }
    m
  }

  @transient private lazy val tableByIdx: Array[StringTable] =
    featureNames.map(n =>
      new StringTable(tables.getOrElse(n, IndexedSeq.empty), modelSeed)).toArray

  /** Per-row evaluation on raw MapData — called from generated code. */
  def apply(numsMap: MapData, strsMap: MapData, z: Double): InternalRow = {
    val arr = new Array[Double](featureNames.length)
    val fromNums = new Array[Boolean](featureNames.length)
    numsMap.foreach(StringType, DoubleType, (k, v) => {
      val idx = nameIdx.get(k.asInstanceOf[UTF8String])
      if (idx != null && v != null) {
        val d = v.asInstanceOf[Double]
        arr(idx) = if (d.isNaN) 0.0 else graft.encoding.Encoding.sprinkle(d, z)
        fromNums(idx) = true
      }
    })
    strsMap.foreach(StringType, StringType, (k, v) => {
      val idx = nameIdx.get(k.asInstanceOf[UTF8String])
      if (idx != null && !fromNums(idx) && v != null) {
        arr(idx) = graft.encoding.Encoding.sprinkle(
          tableByIdx(idx).encode(v.asInstanceOf[UTF8String].toString), z)
      }
    })
    vecUdt.serialize(Vectors.dense(arr)).asInstanceOf[InternalRow]
  }

  override protected def nullSafeEval(n: Any, s: Any, z: Any): Any =
    apply(n.asInstanceOf[MapData], s.asInstanceOf[MapData], z.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("featVec", this,
      classOf[FeatureVectorExpression].getName)
    nullSafeCodeGen(ctx, ev, (n, s, z) =>
      s"${ev.value} = $ref.apply($n, $s, $z);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(nums = newFirst, strs = newSecond, noise = newThird)
}

/** Zero-rejected Poisson(1) weight via inverse CDF — the codegen
  * spelling of `Encoding.nonZeroPoissonWeight` (same k-walk, same
  * 32-step cap).
  */
case class NonZeroPoissonExpression(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "nonzero_poisson"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects DOUBLE, got ${other.sql}")
  }

  override protected def nullSafeEval(u: Any): Any =
    graft.encoding.Encoding.nonZeroPoissonWeight(u.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // object methods get static forwarders on the companion class, so
    // generated Java calls the same body eval() does
    defineCodeGen(ctx, ev, c => s"graft.encoding.Encoding.nonZeroPoissonWeight($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `v(i)` on an ml.Vector column (dense or sparse) — replaces the
  * probability-element UDF on the propensity-inference path.
  */
case class VectorElementExpression(child: Expression, index: Int) extends UnaryExpression {
  require(index >= 0, s"element index must be >= 0, got $index")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_element"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case t: UserDefinedType[_] if t.userClass == classOf[Vector] =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ${SQLDataTypes.VectorType.sql}, got ${other.sql}")
  }

  @transient private lazy val vecUdt =
    SQLDataTypes.VectorType.asInstanceOf[UserDefinedType[Vector]]

  def apply(row: Any): Double = vecUdt.deserialize(row).apply(index)

  override protected def nullSafeEval(v: Any): Any = apply(v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vecElem", this,
      classOf[VectorElementExpression].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.apply($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
