package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class LangModelSpec extends AnyFunSuite with SparkTestBase {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  // corpus: unigrams a:3 b:2 c:1 (T=6, V=3); bigrams (a,b):2 (a,c):1;
  // context totals a:3. With λ=0.9:
  //   p(b|a) = 0.9·(2/3) + 0.1·(2+1)/(6+3) = 0.6 + 1/30
  //   p(c|a) = 0.9·(1/3) + 0.1·(1+1)/(6+3) = 0.3 + 1/45
  private val corpus = docs(1L -> "a b", 2L -> "a b", 3L -> "a c")

  test("bigram scoring matches hand-computed interpolated probabilities") {
    val m = LangModel.train(corpus, "doc_id", "text")
    val out = LangModel.scorePerplexity(corpus, "doc_id", "text", m)
      .select("doc_id", "n_bigrams", "xent", "ppl")
      .collect().map(r => r.getLong(0) -> r).toMap
    val xentAb = -math.log(0.9 * (2.0 / 3) + 0.1 * 3 / 9)
    val xentAc = -math.log(0.9 * (1.0 / 3) + 0.1 * 2 / 9)
    assert(out(1L).getLong(1) == 1L)
    assert(math.abs(out(1L).getDouble(2) - xentAb) < 1e-12)
    assert(math.abs(out(2L).getDouble(2) - xentAb) < 1e-12)
    assert(math.abs(out(3L).getDouble(2) - xentAc) < 1e-12)
    assert(math.abs(out(3L).getDouble(3) - math.exp(xentAc)) < 1e-12)
  }

  test("held-out scoring: unseen bigram falls back to the unigram floor") {
    val m = LangModel.train(corpus, "doc_id", "text")
    val out = LangModel.scorePerplexity(docs(9L -> "b z"), "doc_id", "text", m)
      .collect().head
    // c(b,z)=0 and "b" is never a context → p = 0.1·(0+1)/(6+3)
    val expected = -math.log(0.1 * 1 / 9.0)
    assert(math.abs(out.getAs[Double]("xent") - expected) < 1e-12)
  }

  test("short documents score null and band as 'short'; whitespace tokenization") {
    val m = LangModel.train(corpus, "doc_id", "text")
    val scored = LangModel.scorePerplexity(
      docs(7L -> "a", 8L -> "a \t b"), "doc_id", "text", m)
    val bands = LangModel.perplexityBand(scored, lo = 1.0, hi = 2.0)
      .select("doc_id", "n_bigrams", "band")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(bands(7L) == ((0L, "short")))
    // tab+spaces collapse to ONE separator: "a \t b" is the (a,b) bigram
    assert(bands(8L)._1 == 1L && bands(8L)._2 == "head")
  }

  test("band split is exhaustive and threshold-ordered") {
    val m = LangModel.train(corpus, "doc_id", "text")
    val scored = LangModel.scorePerplexity(corpus, "doc_id", "text", m)
    val xentAb = -math.log(0.9 * (2.0 / 3) + 0.1 * 3 / 9) // ≈ 0.457
    val mid = LangModel.perplexityBand(scored, xentAb + 0.01, xentAb + 0.02)
      .groupBy("band").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mid == Map("head" -> 2L, "tail" -> 1L)) // doc 3 ≈ 1.13 > hi
    intercept[IllegalArgumentException](LangModel.perplexityBand(scored, 2.0, 1.0))
    intercept[IllegalArgumentException](
      LangModel.scorePerplexity(corpus, "doc_id", "text", m, lambda = 1.5))
  }
}
