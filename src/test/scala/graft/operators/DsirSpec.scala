package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

class DsirSpec extends AnyFunSpec with Matchers with SparkTestBase {
  import spark.implicits._

  private def md5b(tok: String, len: Int): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(tok.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString.take(len)
  }

  /** Independent reference computation of the DSIR log-weight. */
  private def refLogWeight(doc: Seq[String], target: Map[String, Long],
      raw: Map[String, Long], tT: Long, tR: Long, m: Long): Double =
    doc.map { tok =>
      val b = md5b(tok, 3)
      math.log((target.getOrElse(b, 0L) + 1.0) / (tT + m.toDouble)) -
        math.log((raw.getOrElse(b, 0L) + 1.0) / (tR + m.toDouble))
    }.sum

  private val target = Seq((1L, "alpha alpha beta"), (2L, "alpha gamma"))
    .toDF("doc_id", "text")
  private val raw = Seq(
    (1L, "alpha alpha beta"), (2L, "alpha gamma"),
    (3L, "delta delta epsilon"), (4L, "zeta zeta zeta"))
    .toDF("doc_id", "text")

  private def countsOf(rows: Seq[String]): Map[String, Long] =
    rows.flatMap(_.split("\\s+")).groupBy(md5b(_, 3))
      .map { case (b, ts) => b -> ts.size.toLong }

  describe("Dsir.fit") {
    it("produces per-bucket counts and totals matching a hand count") {
      val m = Dsir.fit(target, raw, "doc_id", "text", 3)
      val tot = m.totals.head()
      tot.getLong(0) shouldBe 5L  // target tokens
      tot.getLong(1) shouldBe 11L // raw tokens
      val got = m.bucketCounts.collect()
        .map(r => r.getString(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
      got(md5b("alpha", 3)) shouldBe ((Some(3L), Some(3L)))
      got(md5b("delta", 3)) shouldBe ((None, Some(2L)))
      m.numBuckets shouldBe 4096L
    }
  }

  describe("Dsir.score") {
    it("matches the reference computation token for token") {
      val m = Dsir.fit(target, raw, "doc_id", "text", 3)
      val tC = countsOf(target.as[(Long, String)].collect().map(_._2).toSeq)
      val rC = countsOf(raw.as[(Long, String)].collect().map(_._2).toSeq)
      val got = Dsir.score(raw, "doc_id", "text", m).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      for ((id, text) <- raw.as[(Long, String)].collect()) {
        val toks = text.split("\\s+").toSeq
        got(id)._1 shouldBe toks.size
        got(id)._2 shouldBe
          refLogWeight(toks, tC, rC, 5L, 11L, 4096L) +- 1e-12
      }
    }

    it("ranks target-like docs above out-of-target docs") {
      val m = Dsir.fit(target, raw, "doc_id", "text", 3)
      val w = Dsir.score(raw, "doc_id", "text", m).collect()
        .map(r => r.getLong(0) -> r.getDouble(2)).toMap
      w(1L) should be > w(3L)
      w(2L) should be > w(4L)
      w(3L) should be < 0.0 // pure out-of-target mass
    }

    it("drops null and empty-text docs") {
      val withNulls = raw.union(
        Seq((5L, null.asInstanceOf[String]), (6L, "   ")).toDF("doc_id", "text"))
      val ids = Dsir.score(withNulls, "doc_id", "text",
        Dsir.fit(target, raw, "doc_id", "text", 3))
        .select("doc_id").as[Long].collect().toSet
      ids shouldBe Set(1L, 2L, 3L, 4L)
    }
  }

  describe("Dsir.centered") {
    it("flips sign at the corpus mean and orders by target affinity") {
      // raw corpus: two docs of pure filler, two docs progressively
      // richer in the target token "alpha"; target corpus is
      // alpha-heavy. Raw logw is negative for ALL docs here (size +
      // smoothing offset) — centering must still select exactly the
      // alpha-rich half.
      val rawC = Seq(
        (1L, "filler words only here"), (2L, "more filler words again"),
        (3L, "alpha filler alpha words"), (4L, "alpha alpha alpha words"))
        .toDF("doc_id", "text")
      val tgtC = Seq((10L, "alpha alpha alpha alpha")).toDF("doc_id", "text")
      val m = Dsir.fit(tgtC, rawC, "doc_id", "text", 3)
      val rel = Dsir.centered(Dsir.score(rawC, "doc_id", "text", m))
        .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
      rel(4L) should be > rel(3L)
      rel(3L) should be > rel(2L)
      rel(1L) should be < 0.0
      rel(2L) should be < 0.0
      rel(3L) should be > 0.0
      rel(4L) should be > 0.0
      // centering: the mean of per-token rel weights is ~0 by
      // construction (mean over docs of logw/n minus its own mean)
      val scored = Dsir.centered(Dsir.score(rawC, "doc_id", "text", m))
      scored.agg(avg("rel_weight")).head().getDouble(0) shouldBe 0.0 +- 1e-12
    }
  }

  describe("Dsir.gumbelTopK") {
    val scored = spark.range(0, 200)
      .select(col("id").as("doc_id"), lit(0.0).as("log_weight"))

    it("is deterministic and partitioning-independent") {
      val a = Dsir.gumbelTopK(scored, "doc_id", 20, seed = 7L)
        .select("doc_id").as[Long].collect().toSet
      val b = Dsir.gumbelTopK(scored.repartition(13), "doc_id", 20, seed = 7L)
        .select("doc_id").as[Long].collect().toSet
      a shouldBe b
      a.size shouldBe 20
    }

    it("varies with the seed and follows the weights") {
      val s1 = Dsir.gumbelTopK(scored, "doc_id", 20, 1L)
        .select("doc_id").as[Long].collect().toSet
      val s2 = Dsir.gumbelTopK(scored, "doc_id", 20, 2L)
        .select("doc_id").as[Long].collect().toSet
      s1 should not be s2
      // a heavy-weight doc is effectively always sampled: Gumbel noise
      // is ~[-2, 6] whp, a +50 log-weight dominates it
      val heavy = scored.withColumn("log_weight",
        when(col("doc_id") === 42L, 50.0).otherwise(0.0))
      (1L to 5L).foreach { seed =>
        Dsir.gumbelTopK(heavy, "doc_id", 10, seed)
          .select("doc_id").as[Long].collect() should contain(42L)
      }
    }
  }
}
