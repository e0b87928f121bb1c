package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class SearchSpec extends AnyFunSuite with SparkTestBase {

  private def docs() = {
    import spark.implicits._
    Seq(
      (1L, "spark join merge spark spark"), // tf(spark)=3, len 5
      (2L, "spark join filter scan table"), // tf(spark)=1, len 5
      (3L, "spark join filter scan table scan table scan table scan"), // tf=1, len 10
      (4L, "filter scan table agg window") // no query terms
    ).toDF("doc_id", "text")
  }

  test("tfIdf: ubiquitous terms weigh zero, rare terms weigh most") {
    val w = Search.tfIdf(docs(), "doc_id", "text")
    // "spark" and "join" are NOT in every doc; "merge" is in exactly one
    val byTerm = w.groupBy("term").agg(max("tfidf").as("m"), max("df").as("df"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    // df counts are correct
    assert(byTerm("spark")._2 == 3 && byTerm("merge")._2 == 1 && byTerm("window")._2 == 1)
    // a term present in all docs would have idf = ln(1) = 0
    import spark.implicits._
    val everywhere = Search.tfIdf(
      Seq((1L, "x a"), (2L, "x b"), (3L, "x c")).toDF("doc_id", "text"),
      "doc_id", "text").filter(col("term") === "x")
    assert(everywhere.select(max(abs(col("tfidf")))).collect().head.getDouble(0) == 0.0)
    // per-posting weight: tf * ln(N/df) exactly
    val sparkW = w.filter(col("term") === "spark" && col("doc_id") === 1)
      .select("tfidf").collect().head.getDouble(0)
    assert(math.abs(sparkW - 3 * math.log(4.0 / 3)) < 1e-12)
  }

  test("bm25: more matches rank higher; longer docs are normalized down") {
    val scores = Search.bm25(docs(), "doc_id", "text", Seq("spark", "join", "merge"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc 4 has no query terms — absent from the result
    assert(!scores.contains(4L))
    // doc 1 (3×spark + join + rare merge) beats doc 2 (1×spark + join)
    assert(scores(1L) > scores(2L))
    // docs 2 and 3 have identical tf but doc 3 is twice as long —
    // length normalization must rank it lower
    assert(scores(2L) > scores(3L))
    // every score is positive and finite
    assert(scores.values.forall(s => s > 0 && !s.isNaN && !s.isInfinite))
  }

  test("moreLikeThis: a near-duplicate outranks partial overlap; self excluded") {
    import spark.implicits._
    val df = Seq(
      (0L, "spark join merge window filter"),
      (1L, "spark join merge window filter"),        // identical to query
      (2L, "spark join merge scan scan scan table"), // partial overlap
      (3L, "alpha beta gamma delta epsilon")         // disjoint
    ).toDF("doc_id", "text")
    val sims = Search.moreLikeThis(df, "doc_id", "text", 0L)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(!sims.contains(0L), "query doc must be excluded")
    assert(!sims.contains(3L), "disjoint doc shares no terms")
    // identical doc: cosine 1 up to float error; strictly above partial
    assert(math.abs(sims(1L) - 1.0) < 1e-9, s"identical-doc sim ${sims(1L)}")
    assert(sims(1L) > sims(2L))
  }

  test("rrfFuse: presence in both lists dominates a single better rank") {
    import spark.implicits._
    val l1 = Seq((10L, 1), (11L, 2), (12L, 3)).toDF("id", "rank")
    val l2 = Seq((12L, 1), (13L, 2)).toDF("id", "rank")
    val fused = Search.rrfFuse(Seq(l1, l2), "id", k = 60)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    // id 12 (rank 3 + rank 1) beats id 10 (single rank 1)
    assert(fused(12L)._1 > fused(10L)._1)
    assert(fused(12L)._2 == 2 && fused(10L)._2 == 1)
    // exact rational sums
    assert(math.abs(fused(12L)._1 - (1.0 / 63 + 1.0 / 61)) < 1e-12)
    assert(math.abs(fused(13L)._1 - 1.0 / 62) < 1e-12)
  }
}
