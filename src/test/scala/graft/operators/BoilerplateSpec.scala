package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class BoilerplateSpec extends AnyFunSuite with SparkTestBase {

  private def strip(rows: Seq[(Long, String)], lineTokens: Int = 2,
      minDocs: Int = 3): Map[Long, (String, Long, Long)] = {
    import spark.implicits._
    Curation.stripBoilerplate(rows.toDF("doc_id", "text"),
        "doc_id", "text", lineTokens, minDocs)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("lines present in >= minDocs distinct docs are cut; rebuild preserves order") {
    // 2-token lines; "nav bar" opens docs 1..3 -> boilerplate at minDocs=3
    val got = strip(Seq(
      1L -> "nav bar alpha beta",
      2L -> "nav bar gamma delta",
      3L -> "nav bar epsilon zeta",
      4L -> "eta theta iota kappa"))
    assert(got(1L) === (("alpha beta", 2L, 1L)))
    assert(got(2L) === (("gamma delta", 2L, 1L)))
    assert(got(3L) === (("epsilon zeta", 2L, 1L)))
    assert(got(4L) === (("eta theta iota kappa", 2L, 0L)))
  }

  test("document frequency is DISTINCT docs — within-doc repetition alone never flags") {
    // "spam spam" appears 3x in doc 1 but only in 2 distinct docs
    val got = strip(Seq(
      1L -> "spam spam spam spam spam spam tail word",
      2L -> "spam spam other text"))
    assert(got(1L)._3 === 0L)
    assert(got(2L)._3 === 0L)
    // at minDocs=2 the repeated line IS cut — every occurrence, both docs
    val cut = strip(Seq(
      1L -> "spam spam spam spam spam spam tail word",
      2L -> "spam spam other text"), minDocs = 2)
    assert(cut(1L) === (("tail word", 4L, 3L)))
    assert(cut(2L) === (("other text", 2L, 1L)))
  }

  test("whitespace-robust tokenization, ragged tails, and all-removed docs") {
    // tabs/double spaces collapse; 3-token docs at lineTokens=2 leave a
    // 1-token tail line that only matches other 1-token tails
    val got = strip(Seq(
      1L -> "same  same\ttail1",
      2L -> "same same  tail2",
      3L -> " same same tail3",
      4L -> "",
      // vertical tab is a TOKEN character (RE2-\s parity with the
      // DuckDB oracles — Java's \s would have split it)
      5L -> "a\u000bb c"))
    assert(got(1L) === (("tail1", 2L, 1L)))
    assert(got(2L) === (("tail2", 2L, 1L)))
    assert(got(3L) === (("tail3", 2L, 1L)))
    assert(got(4L) === (("", 0L, 0L)))
    assert(got(5L) === (("a\u000bb c", 1L, 0L)))
    // a doc that is NOTHING BUT boilerplate comes back empty, not dropped
    val all = strip(Seq(
      1L -> "same same", 2L -> "same same", 3L -> "same same"))
    assert(all(1L) === (("", 1L, 1L)))
    assert(all.size === 3)
  }

  test("randomized differential: equals an in-memory reference implementation") {
    def reference(docs: Seq[(Long, String)], lt: Int,
        minDocs: Int): Map[Long, (String, Long, Long)] = {
      val lines = docs.map { case (id, t) =>
        id -> t.trim.split("[ \t\n\r\f]+").filter(_.nonEmpty)
          .grouped(lt).map(_.mkString(" ")).toVector
      }
      val docFreq = lines.flatMap { case (id, ls) => ls.map(l => (l, id)) }
        .distinct.groupBy(_._1).map { case (l, v) => l -> v.size }
      val flagged = docFreq.filter(_._2 >= minDocs).keySet
      lines.map { case (id, ls) =>
        val kept = ls.filterNot(flagged)
        id -> ((kept.mkString(" "), ls.size.toLong, (ls.size - kept.size).toLong))
      }.toMap
    }
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 3) {
      val lt = 2 + rnd.nextInt(3)
      val minDocs = 2 + rnd.nextInt(2)
      val docs = (1L to (20L + rnd.nextInt(30))).map { i =>
        val n = rnd.nextInt(25) // includes 0-token docs
        (i, Seq.fill(n)(s"w${rnd.nextInt(10)}").mkString(" "))
      }
      assert(strip(docs, lt, minDocs) === reference(docs, lt, minDocs),
        s"trial $trial (lineTokens=$lt minDocs=$minDocs)")
    }
  }

  test("result is layout-independent and guards reject bad parameters") {
    import spark.implicits._
    val rows = (1L to 60L).map(i =>
      (i, if (i % 3 == 0) s"header line unique$i body" else s"u$i v$i w$i x$i"))
    val df = rows.toDF("doc_id", "text")
    val a = Curation.stripBoilerplate(df.repartition(1), "doc_id", "text", 2, 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).sortBy(_._1)
    val b = Curation.stripBoilerplate(df.repartition(7), "doc_id", "text", 2, 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).sortBy(_._1)
    assert(a === b)
    // "header line" occurs in 20 distinct docs -> cut there, kept elsewhere
    assert(a.count(_._3 == 1L) === 20)

    intercept[IllegalArgumentException](
      Curation.stripBoilerplate(df, "doc_id", "text", 0, 3))
    intercept[IllegalArgumentException](
      Curation.stripBoilerplate(df, "doc_id", "text", 8, 1))
  }
}
