package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class SetJoinSpec extends AnyFunSuite with SparkTestBase {

  /** Brute-force exact Jaccard all-pairs over word sets (ground truth). */
  private def bruteForce(df: DataFrame, threshold: Double): Set[(Long, Long)] = {
    val sets = df.collect().map { r =>
      r.getLong(0) -> r.getString(1).trim.split(" ").toSet
    }
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = (sa & sb).size
      jac = inter.toDouble / (sa.size + sb.size - inter)
      if jac >= threshold
    } yield (ia, ib)).toSet
  }

  private def run(df: DataFrame, threshold: Double): Set[(Long, Long)] =
    SetJoin.jaccardJoin(df, "doc_id", "text", threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("matches brute force exactly across thresholds on a random corpus") {
    import spark.implicits._
    // deterministic pseudo-random corpus with planted overlap structure:
    // shared vocab of 30 words, docs of 8-20 words -> plenty of pairs
    // straddling each threshold
    val rnd = new scala.util.Random(7)
    val docs = (1L to 80L).map { i =>
      val n = 8 + rnd.nextInt(13)
      (i, Seq.fill(n)(s"w${rnd.nextInt(30)}").mkString(" "))
    }.toDF("doc_id", "text")
    for (t <- Seq(0.5, 0.7, 0.9)) {
      assert(run(docs, t) === bruteForce(docs, t), s"threshold $t")
    }
  }

  test("planted duplicates and near-duplicates are all found (no false negatives)") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      1L -> base,
      2L -> base, // exact dup
      3L -> (base + " extra"), // jac 10/11 = 0.909
      4L -> "totally different words here now",
      5L -> base.replace("kappa", "lambda") // jac 9/11 = 0.818
    ).toDF("doc_id", "text")
    assert(run(docs, 0.9) === Set((1L, 2L), (1L, 3L), (2L, 3L)))
    // (3,5) stays OUT: inter 9, union 12 -> jac 0.75 < 0.8
    assert(run(docs, 0.8) ===
      Set((1L, 2L), (1L, 3L), (2L, 3L), (1L, 5L), (2L, 5L)))
  }

  test("null text drops, empty strings pair with each other, guards hold") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c"), (2L, null.asInstanceOf[String]), (3L, ""), (4L, " "),
      (5L, "a b c")).toDF("doc_id", "text")
    val got = run(docs, 0.9)
    // empty and whitespace-only docs share the singleton empty-word set
    assert(got === Set((1L, 5L), (3L, 4L)))
    intercept[IllegalArgumentException](
      SetJoin.jaccardJoin(docs, "doc_id", "text", 0.0))
    intercept[IllegalArgumentException](
      SetJoin.jaccardJoin(docs, "doc_id", "text", 1.5))
  }

  test("FP-boundary thresholds keep the zero-false-negative guarantee") {
    import spark.implicits._
    // jac(x, y) = 7/100 == double 0.07 exactly, but 100 * 0.07 =
    // 7.000000000000001 in doubles: an un-slacked length filter prunes
    // the qualifying pair, and ceil(0.07 * 100) = 8 shortens the
    // prefix. Both filters carry FpSlack, so the pair must survive.
    val x = (1 to 100).map(i => s"w$i").mkString(" ")
    val y = (1 to 7).map(i => s"w$i").mkString(" ")
    val docs = Seq(1L -> x, 2L -> y).toDF("doc_id", "text")
    assert(run(docs, 0.07) === Set((1L, 2L)))
    assert(run(docs, 0.07) === bruteForce(docs, 0.07))
  }

  test("result is layout-independent and agrees with the LSH+verify pipeline") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val docs = (1L to 60L).map { i =>
      val n = 10 + rnd.nextInt(10)
      (i, Seq.fill(n)(s"w${rnd.nextInt(25)}").mkString(" "))
    }.toDF("doc_id", "text")
    val p1 = run(docs.repartition(1), 0.8)
    val p7 = run(docs.repartition(7), 0.8)
    assert(p1 === p7)
    // cross-algorithm: MinHash-LSH + exact verify finds the same pairs
    val lsh = Dedup.verifiedPairsSigned(Dedup.withSignature(docs, "text"), "doc_id", 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p1 === lsh)
  }

  // ---- containmentJoin (directed, shingle sets) ----

  /** Scala mirror of Curation.shingleHashes at word-level n-grams. */
  private def shingleSet(text: String, n: Int): Set[String] = {
    val words = text.trim.split(" ")
    if (words.length < n) Set.empty
    else words.sliding(n).map { g =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(g.mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 16)
    }.toSet
  }

  private def bruteContainment(df: DataFrame, t: Double, n: Int = 5): Set[(Long, Long)] = {
    val sets = df.collect()
      .map(r => r.getLong(0) -> shingleSet(r.getString(1), n))
      .filter(_._2.nonEmpty)
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia != ib
      cont = (sa & sb).size.toDouble / sa.size
      if cont >= t
    } yield (ia, ib)).toSet
  }

  private def runCont(df: DataFrame, t: Double): Set[(Long, Long)] =
    SetJoin.containmentJoin(df, "doc_id", "text", t)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  /** 30 base docs + planted quotes: full slices, noised partials. */
  private def quotedCorpus = {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val bases = (1L to 30L).map { i =>
      (i, Seq.fill(15 + rnd.nextInt(10))(s"w${i}_${rnd.nextInt(40)}").mkString(" "))
    }
    val quotes = (1L to 10L).map { i =>
      val words = bases(i.toInt - 1)._2.split(" ")
      (100L + i, words.slice(2, 2 + 6 + rnd.nextInt(6)).mkString(" "))
    }
    val partials = (1L to 5L).map { i =>
      val words = bases(i.toInt - 1)._2.split(" ")
      (200L + i, (words.slice(0, 8) ++ Seq(s"x$i", s"y$i", s"z$i")).mkString(" "))
    }
    (bases ++ quotes ++ partials).toDF("doc_id", "text")
  }

  test("containmentJoin matches brute force across thresholds (directed)") {
    for (t <- Seq(0.3, 0.5, 0.8, 1.0)) {
      assert(runCont(quotedCorpus, t) === bruteContainment(quotedCorpus, t),
        s"threshold $t")
    }
  }

  test("containment is directional: quote->parent only, never the reverse") {
    import spark.implicits._
    val parent = (1 to 30).map(i => s"p$i").mkString(" ")
    val quote = (5 to 12).map(i => s"p$i").mkString(" ")
    val docs = Seq(1L -> parent, 2L -> quote).toDF("doc_id", "text")
    // every shingle of the quote is a shingle of the parent
    assert(runCont(docs, 1.0) === Set((2L, 1L)))
  }

  test("sub-shingle documents are excluded even when textually identical") {
    import spark.implicits._
    val docs = Seq(
      1L -> "just four words here",
      2L -> "just four words here",
      3L -> (1 to 20).map(i => s"q$i").mkString(" ")
    ).toDF("doc_id", "text")
    // docs 1 and 2 have < 5 words -> no shingles -> no pairs at all
    assert(runCont(docs, 0.5) === Set.empty)
  }

  test("containmentJoin is layout-independent") {
    assert(SetJoin.containmentJoin(quotedCorpus.repartition(1), "doc_id", "text", 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      SetJoin.containmentJoin(quotedCorpus.repartition(7), "doc_id", "text", 0.8)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
  }
}
