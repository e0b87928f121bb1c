package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftColumn
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass BPE application: rewrite a token array by repeatedly
  * fusing the LOWEST-RANK adjacent pair present (all occurrences,
  * left-to-right) until none of the learned pairs remains — the
  * standard rank-greedy tokenizer encode.
  *
  * Equivalent to `Bpe.applyMerges`'s replay of the merge list in
  * training order (spec-proven on learned merges): fusing pair p can
  * only create pairs that contain p's new token, and any such pair
  * was learned AFTER p, so ranks of newly-present pairs are always
  * higher — the greedy loop visits pairs in exactly training order,
  * skipping absent ones. The difference is cost: one pass over the
  * corpus with O(len²_word · merges-present) local work, instead of
  * one full column rewrite per LEARNED rule — at a production merge
  * list (10⁴–10⁵ rules) the replay shape is 10⁴ plan rewrites over
  * the corpus while this stays a single projection.
  *
  * The rank table rides the plan as expression data (like the
  * centroid/codebook expressions): vocabulary-bounded, shipped once,
  * corpus-independent.
  */
case class BpeEncodeExpression(child: Expression,
    ranks: Map[(String, String), Int]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode expects ARRAY<STRING>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  def apply(words: ArrayData): Any = {
    val n = words.numElements()
    var cur = new Array[String](n)
    var i = 0
    while (i < n) {
      cur(i) = if (words.isNullAt(i)) "" else words.getUTF8String(i).toString
      i += 1
    }
    var continue = cur.length >= 2
    while (continue) {
      // lowest-rank pair present
      var bestRank = Int.MaxValue
      var bestA: String = null
      var bestB: String = null
      i = 0
      while (i < cur.length - 1) {
        ranks.get((cur(i), cur(i + 1))) match {
          case Some(r) if r < bestRank =>
            bestRank = r; bestA = cur(i); bestB = cur(i + 1)
          case _ => ()
        }
        i += 1
      }
      if (bestA == null) continue = false
      else {
        // fuse ALL occurrences left-to-right — the same fold the
        // trainer used ("aaa" under (a,a) → [aa, a])
        val out = new Array[String](cur.length)
        var w = 0
        i = 0
        while (i < cur.length) {
          if (i < cur.length - 1 && cur(i) == bestA && cur(i + 1) == bestB) {
            out(w) = bestA + bestB; w += 1; i += 2
          } else {
            out(w) = cur(i); w += 1; i += 1
          }
        }
        cur = java.util.Arrays.copyOf(out, w)
        continue = cur.length >= 2
      }
    }
    new GenericArrayData(cur.map(t => UTF8String.fromString(t): Any))
  }

  override protected def nullSafeEval(words: Any): Any =
    apply(words.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeExpr", this,
      classOf[BpeEncodeExpression].getName)
    val adt = classOf[ArrayData].getName
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ($adt) $ref.apply($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeEncodeExpression {
  def encode(toks: Column, merges: Seq[(String, String)]): Column =
    GraftColumn.of(BpeEncodeExpression(GraftColumn.expr(toks),
      merges.zipWithIndex.toMap))
}
