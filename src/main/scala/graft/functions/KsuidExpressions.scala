package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftColumn
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.Ksuid

/** ksuid_timestamp(id) → epoch seconds (BIGINT), null for anything
  * that is not a canonical 27-char base62 KSUID — as a native codegen
  * expression: the decode is fixed limb arithmetic over the raw ASCII
  * bytes (Ksuid.timestampSecondsFast — no BigInteger, no String), and
  * the call stays inside WholeStageCodegen instead of paying the
  * ScalaUDF boxing it replaced (reference semantics:
  * src/ingest/utils.py:53-59, src/ingest/partition.py:428-429).
  */
case class KsuidTimestampExpression(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ksuid_timestamp expects STRING, got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "ksuid_timestamp"

  override protected def nullSafeEval(id: Any): Any = {
    val ts = Ksuid.timestampSecondsFast(id.asInstanceOf[UTF8String].getBytes)
    if (ts < 0) null else ts
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val t = ctx.freshName("ts")
      s"""
         |final long $t = graft.core.Ksuid.timestampSecondsFast($c.getBytes());
         |if ($t < 0) { ${ev.isNull} = true; } else { ${ev.value} = $t; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ksuid_basic_iso(id) → `yyyyMMdd'T'HHmmss'Z'` UTC rendering of the
  * KSUID's timestamp — the partition store's filename/chunk timestamp
  * (PartitionFilename.timestampOf) as a native expression. THROWS on
  * an invalid id, exactly like timestampOf: a corrupt decision_id in
  * the store-write path must fail the task, not silently route the
  * row to a null chunk.
  */
case class KsuidBasicIsoExpression(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ksuid_basic_iso expects STRING, got ${child.dataType.sql}")

  override def dataType: DataType = StringType
  override def prettyName: String = "ksuid_basic_iso"

  override protected def nullSafeEval(id: Any): Any =
    KsuidBasicIsoExpression.render(id.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.KsuidBasicIsoExpression.render($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object KsuidBasicIsoExpression {
  /** Shared by interpreted eval and generated code. */
  def render(id: UTF8String): UTF8String = {
    val ts = Ksuid.timestampSecondsFast(id.getBytes)
    if (ts < 0) throw new IllegalArgumentException(s"invalid ksuid $id")
    UTF8String.fromString(Ksuid.basicIsoUtc(ts))
  }
}

/** ksuid_deterministic(epochSeconds, seed) → canonical 27-char KSUID
  * with a seed-derived payload — the synthetic-id generator
  * (Ksuid.deterministic) as a native expression, so fixture/pipeline
  * id derivation stays inside WholeStageCodegen.
  */
case class KsuidDeterministicExpression(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ksuid_deterministic expects (BIGINT, BIGINT), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def dataType: DataType = StringType
  override def prettyName: String = "ksuid_deterministic"

  override protected def nullSafeEval(ts: Any, seed: Any): Any =
    KsuidDeterministicExpression.render(ts.asInstanceOf[Long], seed.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, s) =>
      s"graft.functions.KsuidDeterministicExpression.render($t, $s)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object KsuidDeterministicExpression {
  /** Shared by interpreted eval and generated code. */
  def render(ts: Long, seed: Long): UTF8String =
    UTF8String.fromString(Ksuid.deterministic(ts, seed))
}

object KsuidExpressions {
  /** Epoch seconds (BIGINT, null on invalid id). */
  def ksuidTimestamp(id: Column): Column =
    GraftColumn.of(KsuidTimestampExpression(GraftColumn.expr(id)))

  /** Basic-ISO UTC timestamp string (throws on invalid id). */
  def ksuidBasicIso(id: Column): Column =
    GraftColumn.of(KsuidBasicIsoExpression(GraftColumn.expr(id)))

  /** Deterministic KSUID from (epoch seconds, seed). */
  def ksuidDeterministic(ts: Column, seed: Column): Column =
    GraftColumn.of(KsuidDeterministicExpression(
      GraftColumn.expr(ts.cast("long")), GraftColumn.expr(seed.cast("long"))))
}
