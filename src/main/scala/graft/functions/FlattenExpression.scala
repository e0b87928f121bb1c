package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftColumn
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.{CanonicalJson, FlatValue, JsonFlattener}

/** (item JSON, context JSON) → struct<nums: map<string,double>,
  * strs: map<string,string>> as ONE native expression — the engine's
  * feature-flatten projection (reference semantics:
  * src/trainer/code/feature_flattener.py:22-63, roots `item` /
  * `context`), which sits on EVERY row of both training phases.
  *
  * Versus the previous Scala UDF this removes the per-row encoder
  * round trip (UTF8String → String → Jackson → scala Maps →
  * CatalystTypeConverters back to MapData) on the output side: the
  * flattened features are written straight into Catalyst
  * ArrayBasedMapData, and Jackson parses the raw UTF-8 bytes of the
  * input without materializing an intermediate java.lang.String. The
  * generated code is a single method call on a plan-referenced object,
  * so the projection stays inside the surrounding WholeStageCodegen
  * span instead of forcing a ScalaUDF boundary.
  *
  * Null semantics match `Encoding.flattenPair` exactly: a null or
  * unparseable side contributes no features; the result struct is
  * never null (both maps empty at worst).
  */
case class FlattenJsonExpression(item: Expression, context: Expression)
    extends Expression {

  override def children: Seq[Expression] = Seq(item, context)
  override def nullable: Boolean = false
  override def dataType: DataType = FlattenJsonExpression.OutType
  override def prettyName: String = "flatten_features"

  override def checkInputDataTypes(): TypeCheckResult =
    if (item.dataType == StringType && context.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"flatten_features expects (STRING, STRING), got " +
        s"(${item.dataType.sql}, ${context.dataType.sql})")

  override def eval(input: InternalRow): Any =
    flattenRow(
      item.eval(input).asInstanceOf[UTF8String],
      context.eval(input).asInstanceOf[UTF8String])

  /** Row builder shared by interpreted eval and generated code. */
  def flattenRow(itemJson: UTF8String, contextJson: UTF8String): InternalRow = {
    val out = mutable.LinkedHashMap.empty[String, FlatValue]
    if (itemJson != null)
      CanonicalJson.tryParseBytes(itemJson.getBytes).foreach(
        JsonFlattener.flattenInto(_, "item", out))
    if (contextJson != null)
      CanonicalJson.tryParseBytes(contextJson.getBytes).foreach(
        JsonFlattener.flattenInto(_, "context", out))

    var numCount = 0
    out.valuesIterator.foreach {
      case FlatValue.Num(_) => numCount += 1
      case _ => ()
    }
    val nk = new Array[Any](numCount)
    val nv = new Array[Any](numCount)
    val sk = new Array[Any](out.size - numCount)
    val sv = new Array[Any](out.size - numCount)
    var ni = 0
    var si = 0
    out.foreach {
      case (k, FlatValue.Num(v)) =>
        nk(ni) = UTF8String.fromString(k); nv(ni) = v; ni += 1
      case (k, FlatValue.Str(v)) =>
        sk(si) = UTF8String.fromString(k); sv(si) = UTF8String.fromString(v); si += 1
    }
    new GenericInternalRow(Array[Any](
      new ArrayBasedMapData(new GenericArrayData(nk), new GenericArrayData(nv)),
      new ArrayBasedMapData(new GenericArrayData(sk), new GenericArrayData(sv))))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("flattenExpr", this,
      classOf[FlattenJsonExpression].getName)
    val itemGen = item.genCode(ctx)
    val ctxGen = context.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    val u = classOf[UTF8String].getName
    val resultCode =
      code"""
        ${itemGen.code}
        ${ctxGen.code}
        final $javaType ${ev.value} = $ref.flattenRow(
          ${itemGen.isNull} ? ($u) null : ${itemGen.value},
          ${ctxGen.isNull} ? ($u) null : ${ctxGen.value});
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(item = newChildren(0), context = newChildren(1))
}

object FlattenJsonExpression {

  val OutType: StructType = StructType(Seq(
    StructField("nums", MapType(StringType, DoubleType, valueContainsNull = false),
      nullable = false),
    StructField("strs", MapType(StringType, StringType, valueContainsNull = false),
      nullable = false)))

  /** DataFrame-API entry point. */
  def flatten(item: Column, context: Column): Column =
    GraftColumn.of(FlattenJsonExpression(GraftColumn.expr(item), GraftColumn.expr(context)))
}
