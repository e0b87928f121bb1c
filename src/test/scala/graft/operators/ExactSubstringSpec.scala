package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Exact substring-level dedup (Dedup.exactSubstringDedup): duplicated
  * ≥ minLen-token passages are cut from every document they appear in.
  */
class ExactSubstringSpec extends AnyFunSuite with SparkTestBase {

  private def run(rows: Seq[(Long, String)], minLen: Int) = {
    import spark.implicits._
    Dedup.exactSubstringDedup(rows.toDF("doc_id", "text"), "doc_id", "text", minLen)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
  }

  test("a passage shared by two docs is cut from both; unique text survives") {
    val passage = "alpha beta gamma delta"
    val out = run(Seq(
      (1L, s"one two $passage three four"),
      (2L, s"five $passage six seven eight"),
      (3L, "nothing in common here at all")), minLen = 4)
    // every 4-token window inside the shared passage region is flagged;
    // spans extend to the maximal duplicated run. Doc 1: tokens
    // "one two" survive only if no 4-window containing them duplicates —
    // windows are anchored at every position, so the flagged windows are
    // exactly those whose 4 tokens match across docs: here only the
    // passage itself (surrounding context differs between docs).
    assert(out(1L)._1 == "one two three four")
    assert(out(1L)._3 == 4 && out(1L)._4 == 1, out(1L).toString)
    assert(out(2L)._1 == "five six seven eight")
    assert(out(2L)._3 == 4 && out(2L)._4 == 1)
    assert(out(3L) == ("nothing in common here at all", 6, 0, 0))
  }

  test("overlapping and adjacent flagged windows merge into one span") {
    // docs share a 6-token run: three overlapping 4-windows flag
    // positions p, p+1, p+2 — one merged span of 6 tokens, not three
    val runTokens = "r1 r2 r3 r4 r5 r6"
    val out = run(Seq(
      (1L, s"x1 $runTokens x2"),
      (2L, s"y1 y2 $runTokens")), minLen = 4)
    assert(out(1L)._1 == "x1 x2")
    assert(out(1L)._3 == 6 && out(1L)._4 == 1, "one merged span")
    assert(out(2L)._1 == "y1 y2")
  }

  test("within-document repetition is also cut (both occurrences)") {
    val out = run(Seq(
      (1L, "p q r s middle p q r s tail1 tail2")), minLen = 4)
    // "p q r s" occurs twice within the doc → both occurrences removed
    assert(out(1L)._1 == "middle tail1 tail2", out(1L)._1)
    assert(out(1L)._3 == 8 && out(1L)._4 == 2)
  }

  test("docs shorter than minLen pass through; a fully-duplicated doc empties") {
    val out = run(Seq(
      (1L, "tiny doc"),
      (2L, "c1 c2 c3 c4 c5"),
      (3L, "c1 c2 c3 c4 c5")), minLen = 4)
    assert(out(1L) == ("tiny doc", 2, 0, 0))
    assert(out(2L)._1 == "" && out(2L)._3 == 5 && out(2L)._4 == 1)
    assert(out(3L)._1 == "")
  }

  test("minCount above the occurrence count leaves the corpus untouched") {
    val out = {
      import spark.implicits._
      Dedup.exactSubstringDedup(
        Seq((1L, "a b c d e"), (2L, "a b c d f")).toDF("doc_id", "text"),
        "doc_id", "text", minLen = 4, minCount = 3L)
        .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    }
    assert(out == Map(1L -> 0, 2L -> 0))
  }

  test("guards reject degenerate configs") {
    import spark.implicits._
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      Dedup.exactSubstringDedup(df, "doc_id", "text", minLen = 1))
    intercept[IllegalArgumentException](
      Dedup.exactSubstringDedup(df, "doc_id", "text", minLen = 4, minCount = 1L))
    intercept[IllegalArgumentException](
      Dedup.cutSharedSubstrings(df, "doc_id", "text", df, "text", minLen = 1))
  }

  test("tokenization is \\s+: tabs / double spaces / newlines neither glue nor split tokens") {
    // doc 1 separates the shared passage's tokens with tabs, a double
    // space and a newline; doc 2 uses single spaces. Under \s+ both
    // tokenize identically, so the passage is still recognized as an
    // exact duplicate — and the rebuilt kept_text is whitespace-
    // NORMALIZED (single spaces), the documented property.
    val out = run(Seq(
      (1L, "one two\talpha  beta\tgamma\ndelta three four"),
      (2L, "five alpha beta gamma delta six seven eight")), minLen = 4)
    assert(out(1L)._1 == "one two three four", out(1L).toString)
    assert(out(1L) == (("one two three four", 8, 4, 1)))
    assert(out(2L)._1 == "five six seven eight")
  }

  test("cutSharedSubstrings: only eval-quoted passages are cut, per occurrence") {
    import spark.implicits._
    val evalSet = Seq(
      (10L, "the quick brown fox jumps over"),
      (11L, "unrelated benchmark prompt text here")).toDF("eid", "etext")
    val train = Seq(
      // quotes a 6-token eval passage mid-document
      (1L, "intro the quick brown fox jumps over outro1 outro2"),
      // quotes it twice — both occurrences cut
      (2L, "the quick brown fox jumps over mid the quick brown fox jumps over"),
      // repeats ITSELF but shares nothing with eval → untouched
      // (contrast exactSubstringDedup, which would cut the self-repeat)
      (3L, "s1 s2 s3 s4 s5 mid2 s1 s2 s3 s4 s5"),
      (4L, "completely clean training document text")).toDF("doc_id", "text")
    val out = Dedup.cutSharedSubstrings(train, "doc_id", "text",
        evalSet, "etext", minLen = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(3), r.getInt(4))).toMap
    assert(out(1L) == (("intro outro1 outro2", 6, 1)), out(1L).toString)
    assert(out(2L) == (("mid", 12, 2)), out(2L).toString)
    assert(out(3L)._2 == 0 && out(3L)._3 == 0, "self-repeat is not contamination")
    assert(out(4L) == (("completely clean training document text", 0, 0)))
  }
}
