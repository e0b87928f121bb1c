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
}
