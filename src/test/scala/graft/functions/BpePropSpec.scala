package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/** Property check of the rank-greedy BPE encoder against the in-order
  * merge-list replay, on random TRAINING-SHAPED merge lists: each
  * rule's two sides are drawn from the token universe its predecessors
  * created (alphabet ∪ earlier concatenations) — the invariant real
  * training guarantees (a rule can only be learned once its pair is
  * present). Equivalence does NOT hold for arbitrary lists (a rule
  * whose side is produced only by a LATER rule fires under rank-greedy
  * but not under replay), so the generator encodes the invariant
  * rather than sampling free pairs.
  */
object BpePropSpec extends Properties("BpeEncode") {

  private val alphabet = Vector("a", "b", "c", "d")

  private val genCase: Gen[(List[String], List[(String, String)])] = for {
    nMerges <- Gen.choose(0, 10)
    merges <- (0 until nMerges).foldLeft(Gen.const(List.empty[(String, String)])) {
      (acc, _) =>
        acc.flatMap { ms =>
          val universe = alphabet ++ ms.map { case (a, b) => a + b }
          for {
            a <- Gen.oneOf(universe)
            b <- Gen.oneOf(universe)
          } yield
            // learned lists never repeat a rule: once fully fused a
            // pair's count is zero forever (its side tokens can only
            // be created by EARLIER rules), so a duplicate would
            // re-rank the pair and legitimately diverge from replay
            if (ms.contains((a, b))) ms else ms :+ ((a, b))
        }
    }
    n <- Gen.choose(0, 30)
    toks <- Gen.listOfN(n, Gen.oneOf(alphabet))
  } yield (toks, merges)

  /** The trainer's greedy left-to-right fold, in pure Scala. */
  private def foldOnce(toks: List[String], a: String, b: String): List[String] = {
    val out = List.newBuilder[String]
    var rest = toks
    while (rest.nonEmpty) {
      rest match {
        case x :: y :: tail if x == a && y == b =>
          out += (a + b); rest = tail
        case x :: tail =>
          out += x; rest = tail
        case Nil => ()
      }
    }
    out.result()
  }

  private def replay(toks: List[String], merges: List[(String, String)]): List[String] =
    merges.foldLeft(toks) { case (t, (a, b)) => foldOnce(t, a, b) }

  private def encode(toks: List[String], merges: List[(String, String)]): List[String] = {
    val expr = BpeEncodeExpression(
      org.apache.spark.sql.catalyst.expressions.Literal.create(null,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)),
      merges.zipWithIndex.toMap)
    val in = new GenericArrayData(toks.map(t => UTF8String.fromString(t): Any).toArray)
    expr.apply(in).asInstanceOf[GenericArrayData]
      .toArray[UTF8String](org.apache.spark.sql.types.StringType)
      .map(_.toString).toList
  }

  property("rank-greedy encode == in-order replay on training-shaped merges") =
    Prop.forAll(genCase) { case (toks, merges) =>
      val got = encode(toks, merges)
      val want = replay(toks, merges)
      Prop(got == want) :| s"got=$got want=$want merges=$merges"
    }
}
