package graft.core

import org.scalatest.funsuite.AnyFunSuite

class StringTableSpec extends AnyFunSuite {

  private val seed = 12345L

  test("single-entry table encodes its string to 1.0") {
    val hashes = StringTable.buildHashTable(Seq("only"), seed)
    val t = new StringTable(hashes, seed)
    assert(t.encode("only") == 1.0)
    assert(t.missWidth == 1.0)
  }

  test("ranked strings spread linearly over [-1, 1], best rank = +1") {
    val strings = Seq("best", "good", "meh", "worst")
    val t = new StringTable(StringTable.buildHashTable(strings, seed), seed)
    val values = strings.map(t.encode)
    assert(values.head == 1.0)
    assert(values.last == -1.0)
    // strictly decreasing with rank
    assert(values == values.sorted.reverse)
    // evenly spaced (2 / (n-1))
    val diffs = values.sliding(2).map(p => p.head - p.last).toSeq
    diffs.foreach(d => assert(math.abs(d - 2.0 / 3) < 1e-12))
  }

  test("misses disperse within ±missWidth/2 and are deterministic") {
    val strings = (1 to 50).map(i => s"s$i")
    val t = new StringTable(StringTable.buildHashTable(strings, seed), seed)
    // An unseen string whose masked hash lands in an occupied slot
    // aliases to that slot's table value — faithful reference behavior
    // (feature_encoder.py:190-199). Only true misses hit the miss path.
    val tableValues = strings.map(t.encode).toSet
    val misses = (1 to 200).map(i => t.encode(s"unseen-$i"))
      .filterNot(tableValues.contains)
    assert(misses.nonEmpty)
    assert(misses.forall(v => math.abs(v) <= t.missWidth / 2 + 1e-12))
    assert(misses.distinct.length > misses.length / 2) // dispersed, not a sentinel
    assert(t.encode("unseen-1") == t.encode("unseen-1"))
  }

  test("build finds a collision-free width and preserves rank order") {
    val strings = (1 to 1000).map(i => s"value-$i")
    val hashes = StringTable.buildHashTable(strings, seed)
    assert(hashes.distinct.length == strings.length)
    val t = new StringTable(hashes, seed)
    // every table string hits its own slot (no accidental miss path)
    val values = strings.map(t.encode)
    assert(values.head == 1.0)
    assert(values == values.sorted.reverse)
  }

  test("mask covers the largest hash") {
    val hashes = Seq(5L, 12L, 3L)
    assert(StringTable.maskFor(hashes) == 15L)
    assert(StringTable.maskFor(Seq(0L)) == 0L)
    assert(StringTable.maskFor(Nil) == 0L)
  }

  test("hash at nBits=63 keeps all 64 bits (no mod-64 shift wraparound)") {
    // (1L << 64) == 1L in Java, whose mask zeroed every hash: the last
    // legal width must behave as a genuine 64-bit mask
    val h = StringTable.hash("abc", 63, 7L)
    assert(h == XxHash3.hash("abc", 7L), f"$h%x")
    assert(StringTable.hash("xyz", 63, 7L) != StringTable.hash("abc", 63, 7L))
  }
}
