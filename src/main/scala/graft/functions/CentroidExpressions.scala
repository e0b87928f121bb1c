package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftColumn
import org.apache.spark.sql.types._

/** Native codegen expressions for the ANN / PQ / LSH vector paths that
  * previously ran as Scala UDFs. Each carries its model data
  * (centroids, codebook, hyperplanes) as a field on the expression —
  * query/model-sized, corpus-independent, shipped once with the plan —
  * and evaluates per row with a single method call on the
  * plan-referenced object, so the pass stays inside WholeStageCodegen
  * and reads the input ArrayData directly (no Seq[Double] boxing per
  * row, which dominated the corpus-wide assignment pass).
  *
  * Scoring arithmetic is kept ORDER-IDENTICAL to the UDFs it replaces
  * (left-to-right accumulation, the same epsilon placement), so every
  * gate hash is unchanged; bit-identity is spec-proven.
  */
abstract class VectorModelExpression extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<DOUBLE>, got ${other.sql}")
  }

  /** Per-row evaluation on raw ArrayData — called from generated code. */
  def apply(v: ArrayData): Any

  // subclasses whose apply() can decline a row keep the null channel
  // open (dimension MISMATCHES throw — see nearest_cell/pq_encode)
  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any): Any =
    apply(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vecModel", this,
      classOf[VectorModelExpression].getName)
    val obj = ctx.freshName("res")
    val unwrap = dataType match {
      case IntegerType => s"((Integer) $obj).intValue()"
      case LongType => s"((Long) $obj).longValue()"
      case _ => s"(${classOf[ArrayData].getName}) $obj"
    }
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |final Object $obj = $ref.apply($c);
         |if ($obj == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $unwrap; }
       """.stripMargin)
  }
}

/** Index of the cosine-nearest centroid (IVF cell assignment) —
  * replaces `Ann.withCell`'s UDF. `norms(c)` is precomputed as
  * sqrt(Σ cent² + 1e-12) exactly like the UDF did.
  */
case class NearestCellExpression(child: Expression,
    cents: Array[Array[Double]], norms: Array[Double])
    extends VectorModelExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_cell"

  override def apply(v: ArrayData): Any = {
    val vn = v.numElements()
    var best = 0
    var bestScore = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      if (cent.length > vn)
        // THROW like the UDF this replaced: a dimension-mismatched
        // vector silently assigned a null cell would vanish from IVF
        // index builds/appends and corrupt recall with no signal
        throw new IllegalArgumentException(
          s"nearest_cell: vector has $vn dims, centroid needs ${cent.length}")
      var s = 0.0
      var i = 0
      while (i < cent.length) { s += v.getDouble(i) * cent(i); i += 1 }
      val score = s / norms(c)
      if (score > bestScore) { bestScore = score; best = c }
      c += 1
    }
    best
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The `nprobe` cell indices whose centroids are cosine-nearest to the
  * query, ordered (score desc, index asc) — replaces the probe UDFs in
  * `Ann.topKJoin` / `IvfIndex.topKJoin`. Scoring matches
  * `Ann.nearestCells`: qn over the FULL query, dot over the zip-
  * truncated prefix, denominator qn·cn + 1e-12, stable descending sort.
  */
case class NearestCellsExpression(child: Expression,
    cents: Array[Array[Double]], norms: Array[Double], nprobe: Int)
    extends VectorModelExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  override def apply(v: ArrayData): Any = {
    val vn = v.numElements()
    var qsum = 0.0
    var i = 0
    while (i < vn) { val x = v.getDouble(i); qsum += x * x; i += 1 }
    val qn = math.sqrt(qsum)

    val take = math.min(nprobe, cents.length)
    val topScore = new Array[Double](take)
    val topIdx = new Array[Int](take)
    var filled = 0
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      val lim = math.min(cent.length, vn) // zip truncates to the shorter
      var s = 0.0
      i = 0
      while (i < lim) { s += v.getDouble(i) * cent(i); i += 1 }
      val score = s / (qn * norms(c) + 1e-12)
      // insertion keeping (score desc, index asc): strictly-greater
      // entries stay ahead, equal scores keep the earlier index
      if (filled < take || score > topScore(take - 1)) {
        var pos = if (filled < take) filled else take - 1
        while (pos > 0 && topScore(pos - 1) < score) {
          topScore(pos) = topScore(pos - 1); topIdx(pos) = topIdx(pos - 1); pos -= 1
        }
        topScore(pos) = score
        topIdx(pos) = c
        if (filled < take) filled += 1
      }
      c += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(topIdx, filled))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Product-quantization encode: per subspace, the index of the nearest
  * codeword by squared L2 — replaces `Pq.encode`'s UDF.
  */
case class PqEncodeExpression(child: Expression,
    codebook: Array[Array[Array[Double]]]) extends VectorModelExpression {

  private val sub = codebook(0)(0).length

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def apply(v: ArrayData): Any = {
    val m = codebook.length
    if (v.numElements() < m.toLong * sub)
      // THROW like Pq.encode's UDF: a short vector means the codebook
      // and corpus disagree — silently dropping the row corrupts the
      // index without signal
      throw new IllegalArgumentException(
        s"pq_encode: vector has ${v.numElements()} dims, codebook needs ${m.toLong * sub}")
    val out = new Array[Int](m)
    var i = 0
    while (i < m) {
      val cb = codebook(i)
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        var d = 0.0
        var j = 0
        while (j < sub) {
          val diff = v.getDouble(i * sub + j) - cb(c)(j); d += diff * diff; j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(i) = best
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Random-hyperplane (sign-LSH) 64-bit signature: bit p =
  * sign(v · plane_p) — replaces the sign UDF in
  * `Dedup.embeddingNearDupPairs`. Dot runs over the zip-truncated
  * prefix exactly like the UDF (`i < dim && i < v.length`).
  */
case class SignLshExpression(child: Expression, planes: Array[Array[Double]])
    extends VectorModelExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "sign_lsh"

  override def apply(v: ArrayData): Any = {
    val vn = v.numElements()
    var sig = 0L
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      val lim = math.min(plane.length, vn)
      var s = 0.0
      var i = 0
      while (i < lim) { s += v.getDouble(i) * plane(i); i += 1 }
      if (s > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** SimHash over a word array: majority vote across the 64 bits of
  * each word's hash — replaces the UDF in `Dedup.withSimHash`. The
  * word hash is a NAMED enum member ([[graft.core.WordHash]]), not a
  * closure: expression data must have value equality for plan
  * canonicalization, and must never smuggle non-serializable capture.
  * Elements are hashed straight off the ArrayData.
  */
case class SimHashExpression(child: Expression, wordHash: graft.core.WordHash)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash expects ARRAY<STRING>, got ${other.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"

  def apply(words: ArrayData): Any = {
    val v = new Array[Int](64)
    val n = words.numElements()
    var w = 0
    while (w < n) {
      if (!words.isNullAt(w)) {
        val h = wordHash(words.getUTF8String(w).toString)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) v(i) += 1 else v(i) -= 1
          i += 1
        }
      }
      w += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (v(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  override protected def nullSafeEval(words: Any): Any =
    apply(words.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhashExpr", this,
      classOf[SimHashExpression].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ((Long) $ref.apply($c)).longValue();")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CentroidExpressions {

  private def centNorms(cents: Array[Seq[Double]], eps: Double): Array[Double] =
    cents.map(c => math.sqrt(c.map(x => x * x).sum + eps))

  /** Cell assignment column (Ann.withCell semantics). */
  def nearestCell(vec: Column, cents: Array[Seq[Double]]): Column =
    GraftColumn.of(NearestCellExpression(GraftColumn.expr(vec),
      cents.map(_.toArray), centNorms(cents, 1e-12)))

  /** Probe-cell array column (Ann.nearestCells semantics). */
  def nearestCells(vec: Column, cents: Array[Seq[Double]], nprobe: Int): Column =
    GraftColumn.of(NearestCellsExpression(GraftColumn.expr(vec),
      cents.map(_.toArray), centNorms(cents, 0.0), nprobe))

  /** PQ code array column (Pq.encode semantics). */
  def pqEncode(vec: Column, codebook: Array[Array[Array[Double]]]): Column =
    GraftColumn.of(PqEncodeExpression(GraftColumn.expr(vec), codebook))

  /** 64-bit sign-LSH signature column. */
  def signLsh(vec: Column, planes: Array[Array[Double]]): Column =
    GraftColumn.of(SignLshExpression(GraftColumn.expr(vec), planes))

  /** SimHash of a word-array column under `wordHash`. */
  def simHash(words: Column, wordHash: graft.core.WordHash): Column =
    GraftColumn.of(SimHashExpression(GraftColumn.expr(words), wordHash))
}
