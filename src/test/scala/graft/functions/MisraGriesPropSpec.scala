package graft.functions

import org.scalacheck.{Gen, Prop, Properties}

/** Property-based checks of the Misra–Gries invariants under random
  * streams and random merge trees — the guarantees the two-pass exact
  * heavy hitters relies on (operators/Frequency): bounded state, no
  * false negatives above n/(k+1), counts never overestimated.
  */
object MisraGriesPropSpec extends Properties("MisraGries") {

  private val genStream: Gen[(Int, List[String])] = for {
    k <- Gen.choose(1, 12)
    n <- Gen.choose(0, 400)
    // small alphabet ⇒ real heavy hitters; Zipf-ish skew via prefix
    items <- Gen.listOfN(n, Gen.frequency(
      (6, Gen.const("a")), (3, Gen.const("b")), (2, Gen.const("c")),
      (1, Gen.choose(0, 30).map(i => s"t$i"))))
  } yield (k, items)

  private def runSketch(k: Int, items: List[String],
      splits: List[Int]): Seq[MgHit] = {
    val agg = new MisraGries(k)
    // partition the stream at the random split points and merge the
    // partial sketches — any merge tree must keep the guarantees
    val parts = splits.distinct.sorted.foldRight(List(items)) { (s, acc) =>
      val (before, after) = acc.head.splitAt(math.min(s, acc.head.length))
      before :: after :: acc.tail
    }
    val merged = parts
      .map(p => p.foldLeft(agg.zero)(agg.reduce))
      .reduceLeft(agg.merge)
    agg.finish(merged)
  }

  property("state bounded by k; heavy items survive; counts are lower bounds") =
    Prop.forAll(genStream, Gen.listOfN(3, Gen.choose(0, 400))) {
      case ((k, items), splits) =>
        val hits = runSketch(k, items, splits)
        val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val n = items.size.toLong
        val bounded = hits.size <= k
        val noFalseNegatives = exact.forall { case (item, c) =>
          c * (k + 1) <= n || hits.exists(_.item == item)
        }
        val lowerBounds = hits.forall(h => h.count <= exact.getOrElse(h.item, 0L))
        val errorBound = hits.forall(h =>
          exact.getOrElse(h.item, 0L) - h.count <= n / (k + 1))
        (Prop(bounded) :| "state exceeded k") &&
          (Prop(noFalseNegatives) :| "dropped an item above n/(k+1)") &&
          (Prop(lowerBounds) :| "overestimated a count") &&
          (Prop(errorBound) :| "undercount exceeded n/(k+1)")
    }
}
