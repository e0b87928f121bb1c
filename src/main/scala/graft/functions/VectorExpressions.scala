package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftColumn
import org.apache.spark.sql.types._

/** cosine(a, b) over two double arrays as ONE native codegen'd loop —
  * dot product and both norms in a single pass over the arrays.
  *
  * The HOF spelling (`aggregate(zip_with(a,b,*)) / (sqrt(aggregate(
  * transform(a,sq))) * ...)`) is codegen'd too but materializes the
  * zip/transform intermediate arrays and walks the inputs five times;
  * this expression walks them once with three scalar accumulators —
  * the difference is the hot inner loop of every brute-force /
  * verify / rerank path in the ANN stack.
  *
  * Null semantics mirror the HOF version exactly (so gate hashes are
  * unchanged): null input → null, length mismatch → null (zip_with
  * pads with null), null element → null; zero norms fall through to
  * IEEE division (NaN/∞) identically. Summation order is
  * left-to-right in both, so results are bit-identical.
  */
case class ArrayCosineExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isDoubleArray(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isDoubleArray(left.dataType) && isDoubleArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"array_cosine expects (ARRAY<DOUBLE>, ARRAY<DOUBLE>), " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "array_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $xi = $a.getDouble($i);
         |    final double $yi = $b.getDouble($i);
         |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Asymmetric-distance (ADC) score for product quantization: with the
  * query×codeword inner-product table flattened row-major (subspace i,
  * codeword c at `i·codesPerSub + c`), the score of a code array is
  * Σᵢ table[i·codesPerSub + codeᵢ]. As a native codegen loop this
  * replaces the per-row Scala UDF (which boxed every code array into a
  * Seq[Int]) in the hottest scoring path of the PQ/IVF-PQ stack; the
  * table rides the plan as one literal (m·k doubles — kilobytes,
  * query-sized, corpus-independent).
  */
case class AdcScoreExpression(code: Expression, table: Expression,
    codesPerSub: Expression) extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def first: Expression = code
  override def second: Expression = table
  override def third: Expression = codesPerSub

  override def checkInputDataTypes(): TypeCheckResult = (code.dataType,
      table.dataType, codesPerSub.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(DoubleType, _), IntegerType) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"adc_score expects (ARRAY<INT>, ARRAY<DOUBLE>, INT), got $other")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "adc_score"

  override protected def nullSafeEval(codeV: Any, tableV: Any, kV: Any): Any = {
    val c = codeV.asInstanceOf[ArrayData]
    val t = tableV.asInstanceOf[ArrayData]
    val k = kV.asInstanceOf[Int]
    var s = 0.0
    var i = 0
    val m = c.numElements()
    val tn = t.numElements()
    while (i < m) {
      if (c.isNullAt(i)) return null
      val code = c.getInt(i)
      val idx = i * k + code
      // a public SQL function must not read out of range (unchecked
      // UnsafeArrayData access would return garbage): a code outside
      // [0, k) or a table too small for m·k is invalid input → null
      if (code < 0 || code >= k || idx >= tn) return null
      s += t.getDouble(idx)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, t, k) => {
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      val codeVar = ctx.freshName("cd")
      val idx = ctx.freshName("idx")
      s"""
         |final int $m = $c.numElements();
         |final int ${idx}_tn = $t.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $m; $i++) {
         |  if ($c.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  final int $codeVar = $c.getInt($i);
         |  final int $idx = $i * $k + $codeVar;
         |  if ($codeVar < 0 || $codeVar >= $k || $idx >= ${idx}_tn) {
         |    ${ev.isNull} = true; break;
         |  }
         |  $s += $t.getDouble($idx);
         |}
         |if (!${ev.isNull}) { ${ev.value} = $s; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(code = newFirst, table = newSecond, codesPerSub = newThird)
}

object VectorExpressions {
  /** DataFrame-API entry point — no session/registry needed. */
  def arrayCosine(a: Column, b: Column): Column =
    GraftColumn.of(ArrayCosineExpression(GraftColumn.expr(a), GraftColumn.expr(b)))

  /** ADC score of a code column against a flattened (row-major)
    * query×codeword table with `codesPerSub` codewords per subspace.
    */
  def adcScore(code: Column, table: Array[Double], codesPerSub: Int): Column = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    GraftColumn.of(AdcScoreExpression(
      GraftColumn.expr(code),
      Literal.create(table.toSeq, ArrayType(DoubleType, containsNull = false)),
      Literal(codesPerSub)))
  }
}
