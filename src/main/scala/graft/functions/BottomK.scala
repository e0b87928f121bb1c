package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One bottom-k sample entry: the content-derived hash that ranks it,
  * the unique row id that breaks 28-bit hash collisions, and the
  * carried value.
  */
case class KmvEntry(h: Long, id: Long, v: Long)

/** Bottom-k-by-hash (KMV) sample sketch as a typed `Aggregator`: keeps
  * the `k` rows with the SMALLEST (hash, id) key — a deterministic
  * uniform random sample seeded by content, the mergeable building
  * block for quantile/sample rollups (Bar-Yossef et al. 2002 KMV;
  * mergeability per Agarwal et al., "Mergeable Summaries", PODS 2012).
  *
  * Properties the engine relies on:
  *  - state is ≤ 2k entries at any moment (reduce/merge trim back to k
  *    once the buffer doubles — amortized O(log k) per row), so the
  *    aggregation buffer never scales with group size;
  *  - bottom-k of a union is the bottom-k of the unions' bottom-k's:
  *    ANY merge tree (partition layout, rollup order) yields the exact
  *    same final sample — KmvSpec pins sketch(A ∪ B) == merge(sketch A,
  *    sketch B) and the gate's DuckDB oracle re-derives the identical
  *    sample relationally;
  *  - Spark runs `reduce` per partition and `merge` across partitions,
  *    so ≤ k entries shuffle per partition (map-side combine).
  *
  * The (hash, id) key is totally ordered because `id` is unique —
  * without the tiebreak, 28-bit md5-prefix collisions (expected at
  * ~10^5 rows) would make the sample partition-order-dependent.
  */
class BottomK(k: Int)
    extends Aggregator[KmvEntry, mutable.ArrayBuffer[KmvEntry], Seq[KmvEntry]] {
  require(k > 0, s"sample capacity must be positive, got $k")

  private def lt(a: KmvEntry, b: KmvEntry): Boolean =
    a.h < b.h || (a.h == b.h && a.id < b.id)

  /** Sort ascending by (h, id) and keep the first k (in place). */
  private def trim(b: mutable.ArrayBuffer[KmvEntry]): mutable.ArrayBuffer[KmvEntry] = {
    if (b.length > k) {
      val arr = b.toArray
      java.util.Arrays.sort(arr, (x: KmvEntry, y: KmvEntry) =>
        if (lt(x, y)) -1 else if (lt(y, x)) 1 else 0)
      b.clear()
      b ++= arr.iterator.take(k)
    }
    b
  }

  override def zero: mutable.ArrayBuffer[KmvEntry] = mutable.ArrayBuffer.empty

  override def reduce(b: mutable.ArrayBuffer[KmvEntry], e: KmvEntry): mutable.ArrayBuffer[KmvEntry] = {
    if (e == null) return b
    b += e
    if (b.length >= 2 * k) trim(b) else b
  }

  override def merge(a: mutable.ArrayBuffer[KmvEntry], c: mutable.ArrayBuffer[KmvEntry]): mutable.ArrayBuffer[KmvEntry] = {
    val (into, from) = if (a.length >= c.length) (a, c) else (c, a)
    into ++= from
    if (into.length >= 2 * k) trim(into) else into
  }

  /** Final sample, ascending by (h, id) — a deterministic array. */
  override def finish(b: mutable.ArrayBuffer[KmvEntry]): Seq[KmvEntry] =
    trim(b).sortWith(lt).toSeq

  override def bufferEncoder: Encoder[mutable.ArrayBuffer[KmvEntry]] =
    Encoders.kryo[mutable.ArrayBuffer[KmvEntry]]

  override def outputEncoder: Encoder[Seq[KmvEntry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[KmvEntry]]()
}
