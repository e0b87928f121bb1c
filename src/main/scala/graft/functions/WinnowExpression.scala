package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftColumn
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document winnowed fingerprints (Schleimer, Wilkerson, Aiken
  * 2003) as ONE native expression: k-gram md5 prefixes + sliding
  * w-window minima + per-document dedup, all in a single O(tokens)
  * local pass (monotonic-deque sliding minimum, each gram hashed
  * exactly once).
  *
  * Why an expression and not the column program it replaces: the
  * declarative form must either posexplode the gram relation and run
  * a per-document window (one corpus-tokens-sized SHUFFLE, the
  * measured dominant cost of every winnow-shaped gate), or slice a
  * gram array inside a lambda (CollapseProject re-inlines the array
  * definition into every window — O(len²) md5 calls per document).
  * Winnowing is a per-ROW computation; giving it to the executor as
  * one scalar expression keeps the corpus scan shuffle-free and the
  * fingerprint relation is born w-fold smaller than the gram stream.
  *
  * Semantics are BIT-IDENTICAL to the declarative derivation (spec
  * asserts equality on corpus + adversarial fixtures):
  * words = split(trim-spaces(text), " ") with Spark's regex-split
  * keep-trailing-empties convention; gram i = first 16 hex chars of
  * md5(words[i..i+k-1] joined " "); window p (full windows only)
  * selects the LEXICOGRAPHIC minimum gram; output = first-occurrence-
  * ordered distinct minima, empty when words < k + w - 1.
  */
case class WinnowExpression(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fps expects STRING, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnow_fps"

  def apply(text: UTF8String): Any = {
    // Spark's trim(e) trims the SPACE character only (not \t/\n) —
    // match it exactly, not String.trim's <= 0x20 rule
    val s = text.trim().toString
    // Java's split(regex) drops trailing empties; Spark's StringSplit
    // uses limit -1 and keeps them — and "" yields one empty word
    val words = java.util.regex.Pattern.compile(" ").split(s, -1)
    val nGrams = words.length - k + 1
    val nWins = nGrams - w + 1
    if (nWins <= 0) return new GenericArrayData(Array.empty[Any])
    val md = MessageDigest.getInstance("MD5")
    val grams = new Array[String](nGrams)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < nGrams) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      md.reset()
      val digest = md.digest(sb.toString.getBytes(StandardCharsets.UTF_8))
      // first 16 hex chars = first 8 digest bytes, lowercase hex
      val hex = new Array[Char](16)
      var b = 0
      while (b < 8) {
        val v = digest(b) & 0xff
        hex(2 * b) = Character.forDigit(v >>> 4, 16)
        hex(2 * b + 1) = Character.forDigit(v & 0xf, 16)
        b += 1
      }
      grams(i) = new String(hex)
      i += 1
    }
    // sliding minimum via monotonic deque of indices: amortized O(1)
    // per window; ties keep the EARLIEST index (<= eviction), which
    // is value-identical either way — the selected STRING is what the
    // declarative min() emits
    val deque = new Array[Int](nGrams)
    var head = 0
    var tail = 0 // exclusive
    val seen = new java.util.HashSet[String]()
    val out = new java.util.ArrayList[Any]()
    i = 0
    while (i < nGrams) {
      while (tail > head && grams(deque(tail - 1)).compareTo(grams(i)) > 0)
        tail -= 1
      deque(tail) = i; tail += 1
      val p = i - w + 1 // window starting at p just completed
      if (p >= 0) {
        if (deque(head) < p) head += 1
        val m = grams(deque(head))
        if (seen.add(m)) out.add(UTF8String.fromString(m))
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def nullSafeEval(text: Any): Any =
    apply(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnowExpr", this,
      classOf[WinnowExpression].getName)
    val adt = classOf[ArrayData].getName
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ($adt) $ref.apply($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowExpression {
  /** Distinct winnowed fingerprints of a text column, first-occurrence
    * order; empty array below the k + w − 1 word minimum.
    */
  def winnowFps(text: Column, k: Int, w: Int): Column = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(w >= 1, s"w must be >= 1, got $w")
    GraftColumn.of(WinnowExpression(GraftColumn.expr(text), k, w))
  }
}
