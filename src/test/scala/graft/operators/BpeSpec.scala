package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class BpeSpec extends AnyFunSuite with SparkTestBase {

  // the classic BPE teaching corpus, weights via repetition
  private def corpus = {
    import spark.implicits._
    (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .map(w => Tuple1(w)).toDF("text").repartition(4)
  }

  test("merge sequence matches the hand-computed greedy order with deterministic ties") {
    // pair counts round 0: es=9, st=9 (tie -> "e","s" wins lexicographically),
    // then ("es","t")=9, then lo=7/ow=7 tie -> ("l","o")
    val merges = Bpe.learnMerges(corpus, "text", 3)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o")))
  }

  test("merge order is partitioning-independent") {
    val one = Bpe.learnMerges(corpus.repartition(1), "text", 3)
    val many = Bpe.learnMerges(corpus.repartition(8), "text", 3)
    assert(one == many)
  }

  test("applyMerges reproduces the trainer's final tokenization; overlapping runs fold greedily") {
    import spark.implicits._
    val merges = Bpe.learnMerges(corpus, "text", 3)
    val vocab = Bpe.wordTable(corpus, "text")
      .select(col("w"), split(col("w"), "").as("toks"), col("freq"))
    val toks = Bpe.applyMerges(vocab, merges)
      .select(col("w"), col("toks"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(toks("newest") == List("n", "e", "w", "est"))
    assert(toks("widest") == List("w", "i", "d", "est"))
    assert(toks("low") == List("lo", "w"))
    assert(toks("lower") == List("lo", "w", "e", "r"))

    // greedy left-to-right on a run: "aaa" under (a,a) -> [aa, a]
    val run = Seq(Tuple1("aaa")).toDF("text")
    val runVocab = Bpe.wordTable(run, "text")
      .select(split(col("w"), "").as("toks"), col("freq"))
    val folded = Bpe.applyMerges(runVocab, Seq(("a", "a")))
      .select("toks").head().getSeq[String](0).toList
    assert(folded == List("aa", "a"))
  }

  test("early stop when no pairs remain; bad nMerges rejected") {
    import spark.implicits._
    val single = Seq.fill(3)(Tuple1("x")).toDF("text")
    assert(Bpe.learnMerges(single, "text", 5) == Seq.empty)
    intercept[IllegalArgumentException](Bpe.learnMerges(single, "text", 0))
  }

  test("rank-greedy encode equals merge-list replay on learned merges") {
    import spark.implicits._
    // random-ish corpus with real repeated structure so the learned
    // merges chain (multi-character tokens merging with each other)
    val rnd = new scala.util.Random(17)
    val words = Seq("lower", "lowest", "newest", "newer", "widest",
      "low", "wide", "new", "wilder", "older")
    val docs = (1 to 120)
      .map(_ => (1 to 8).map(_ => words(rnd.nextInt(words.size))).mkString(" "))
      .map(Tuple1(_)).toDF("text")
    val merges = Bpe.learnMerges(docs, "text", 12)
    assert(merges.size == 12)

    val vocab = Bpe.wordTable(docs, "text")
      .select(col("w"), split(col("w"), "").as("toks"), col("freq"))
    val replay = Bpe.applyMerges(vocab, merges)
      .select("w", "toks")
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    val ranked = Bpe.encode(vocab, merges)
      .select("w", "toks")
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(ranked == replay)
    // and the encode is not a no-op: some word actually fused
    assert(ranked.values.exists(t => t.exists(_.length > 1)))
  }

  test("encode handles empty arrays, unknown tokens, and greedy runs") {
    import spark.implicits._
    val merges = Seq(("a", "a"), ("aa", "b"))
    val df = Seq(
      (1L, Seq.empty[String]),
      (2L, Seq("z")),
      (3L, Seq("a", "a", "a")), // -> [aa, a] (left-to-right fold)
      (4L, Seq("a", "a", "b")), // -> [aa, b] -> [aab] (chained ranks)
      (5L, Seq("q", "r", "s"))) // no applicable merge
      .toDF("id", "toks")
    val out = Bpe.encode(df, merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(out(1L) == Nil)
    assert(out(2L) == List("z"))
    assert(out(3L) == List("aa", "a"))
    assert(out(4L) == List("aab"))
    assert(out(5L) == List("q", "r", "s"))

    // duplicated rules would re-rank a pair and diverge from replay
    intercept[IllegalArgumentException](
      Bpe.encode(df, Seq(("a", "a"), ("a", "a"))))
  }
}
