package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One surviving Misra–Gries counter: a candidate item and its
  * (under-)count lower bound.
  */
case class MgHit(item: String, count: Long)

/** Misra–Gries heavy-hitters sketch as a typed `Aggregator` — the
  * engine's mergeable frequent-items summary (reference has per-batch
  * pandas `value_counts` driver-side, e.g. stats in
  * src/trainer/code/train.py; at 100 TB the vocabulary does not fit
  * anywhere, so the sketch is the operator).
  *
  * Guarantees (Misra & Gries 1982; mergeability per Agarwal et al.,
  * "Mergeable Summaries", PODS 2012):
  *  - state is AT MOST `k` counters regardless of input size — the
  *    aggregation buffer is O(k), never vocabulary-sized;
  *  - every item with true frequency > N/(k+1) is present in the
  *    output (no false negatives above the threshold);
  *  - each reported count is a lower bound, short by ≤ N/(k+1).
  *
  * The candidate SET depends on partitioning/merge order (as with any
  * MG merge tree), so downstream exact gates must re-count candidates
  * — see `operators/Frequency.heavyHitters`, which makes the final
  * answer exact and order-independent.
  *
  * Spark runs `reduce` per partition and `merge` across partitions
  * (partial aggregation), so the sketch shuffles ≤ k counters per
  * partition — map-side combine for a problem groupBy cannot bound.
  */
class MisraGries(k: Int)
    extends Aggregator[String, mutable.HashMap[String, Long], Seq[MgHit]] {
  require(k > 0, s"capacity must be positive, got $k")

  override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  override def reduce(b: mutable.HashMap[String, Long], item: String): mutable.HashMap[String, Long] = {
    if (item == null) return b
    b.get(item) match {
      case Some(c) => b.update(item, c + 1L)
      case None if b.size < k => b.update(item, 1L)
      case None =>
        // classic MG step: a non-resident item with all k slots taken
        // decrements every counter (the new item's single occurrence
        // cancels against one of each resident's). Keys are snapshot
        // first: updating a mutable.HashMap while iterating it —
        // even value-only updates — silently truncates the iterator
        // in Scala 2.13, which left counters undecremented and broke
        // the O(k) state bound.
        val keys = b.keysIterator.toArray
        var i = 0
        while (i < keys.length) {
          val key = keys(i)
          val c = b(key) - 1L
          if (c <= 0L) b.remove(key) else b.update(key, c)
          i += 1
        }
    }
    b
  }

  override def merge(a: mutable.HashMap[String, Long], c: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    val (into, from) = if (a.size >= c.size) (a, c) else (c, a)
    from.foreach { case (item, n) =>
      into.update(item, into.getOrElse(item, 0L) + n)
    }
    if (into.size > k) {
      // mergeable-summaries step: subtract the (k+1)-th largest count
      // from everything and drop the non-positive — error stays ≤
      // N/(k+1) under any merge tree
      val counts = into.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - (k + 1))
      // snapshot keys before mutating (same 2.13 iterator pitfall as
      // in reduce): the un-snapshotted loop visited only a prefix of
      // the map, leaving the merged sketch above k counters
      val keys = into.keysIterator.toArray
      var i = 0
      while (i < keys.length) {
        val key = keys(i)
        val c2 = into(key) - cut
        if (c2 <= 0L) into.remove(key) else into.update(key, c2)
        i += 1
      }
    }
    into
  }

  override def finish(b: mutable.HashMap[String, Long]): Seq[MgHit] =
    b.toSeq
      .sortBy { case (item, c) => (-c, item) } // deterministic render
      .map { case (item, c) => MgHit(item, c) }

  override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    Encoders.kryo[mutable.HashMap[String, Long]]

  override def outputEncoder: Encoder[Seq[MgHit]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[MgHit]]()
}
