package graft.operators

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class WinnowSpec extends AnyFunSuite with SparkTestBase {

  private val K = 5
  private val W = 4

  /** Scala mirror of the winnowing selection (positional k-gram md5
    * prefixes, lexicographic min per w-window, distinct).
    */
  private def bruteWinnow(text: String, k: Int = K, w: Int = W): Set[String] = {
    // split(" ", -1): keep trailing empty tokens, mirroring Spark's
    // split (Scala's 1-arg split drops them — a silent divergence the
    // multi-space corpus case below would expose)
    val words = text.trim.split(" ", -1)
    if (words.length < k) return Set.empty
    val grams = words.sliding(k).map { g =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(g.mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 16)
    }.toVector
    if (grams.length < w) Set.empty
    else grams.sliding(w).map(_.min).toSet
  }

  private def runFps(df: DataFrame): Map[Long, Set[String]] =
    Winnow.fingerprints(df, "doc_id", "text", K, W)
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).map { case (id, fps) => id -> fps.map(_._2).toSet }

  test("fingerprints match the Scala mirror on a random corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val docs = (1L to 50L).map { i =>
      // every third doc gets whitespace warts (double/trailing
      // spaces) so the differential exercises empty-token handling,
      // not just single-space-joined text
      val sep = if (i % 3 == 0) "  " else " "
      val tail = if (i % 5 == 0) " " else ""
      (i, Seq.fill(10 + rnd.nextInt(30))(s"w${rnd.nextInt(50)}").mkString(sep) + tail)
    }
    val got = runFps(docs.toDF("doc_id", "text"))
    docs.foreach { case (id, text) =>
      assert(got.getOrElse(id, Set.empty) === bruteWinnow(text), s"doc $id")
    }
  }

  test("duplicate ids never interleave texts: fingerprints are the per-row union") {
    import spark.implicits._
    val t1 = (1 to 30).map(i => s"d$i").mkString(" ")
    val t2 = (1 to 30).map(i => s"e$i").mkString(" ")
    val dup = Seq(7L -> t1, 7L -> t2).toDF("doc_id", "text")
    assert(runFps(dup)(7L) === (bruteWinnow(t1) ++ bruteWinnow(t2)))
  }

  test("selection is sparse: far fewer fingerprints than grams, never zero for long docs") {
    import spark.implicits._
    val text = (1 to 200).map(i => s"u$i").mkString(" ")
    val fps = runFps(Seq(1L -> text).toDF("doc_id", "text"))(1L)
    val nGrams = 200 - K + 1
    assert(fps.nonEmpty && fps.size < nGrams / 2,
      s"${fps.size} of $nGrams grams selected")
  }

  test("guarantee: a shared run of w+k-1 tokens always yields a shared fingerprint") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    // parent: 60 random words; quote: a (w+k-1)-word slice of parent
    // surrounded by unrelated words — must still collide
    for (trial <- 1 to 10) {
      val parent = Vector.fill(60)(s"p${trial}_${rnd.nextInt(40)}")
      val at = rnd.nextInt(60 - (W + K - 1))
      val run = parent.slice(at, at + W + K - 1)
      val quote = (Vector.fill(6)(s"q${trial}_x") ++ run ++
        Vector.fill(6)(s"q${trial}_y")).mkString(" ")
      val docs = Seq(1L -> parent.mkString(" "), 2L -> quote).toDF("doc_id", "text")
      val fps = runFps(docs)
      assert((fps(1L) & fps(2L)).nonEmpty, s"trial $trial: no shared fingerprint")
    }
  }

  test("documents shorter than k+w-1 words emit no fingerprints") {
    import spark.implicits._
    val docs = Seq(
      1L -> (1 to (K + W - 2)).map(i => s"s$i").mkString(" "),
      2L -> "tiny",
      3L -> (1 to 30).map(i => s"t$i").mkString(" ")
    ).toDF("doc_id", "text")
    val fps = runFps(docs)
    assert(!fps.contains(1L) && !fps.contains(2L) && fps.contains(3L))
  }

  test("native expression equals the declarative derivation on adversarial text") {
    import spark.implicits._
    val rnd = new scala.util.Random(91)
    val adversarial = Seq(
      1L -> "", // empty
      2L -> "   ", // spaces only
      3L -> "a\tb c d e f g h i j", // tab INSIDE a word (split is space-only)
      4L -> " lead and trail pad word one two three four ", // trim boundary
      5L -> ("x " * (K + W - 1)).trim, // exactly the minimum length
      6L -> ("x " * (K + W - 2)).trim, // one below the minimum
      7L -> (1 to 25).map(_ => "same").mkString(" "), // all-equal grams (dedup-heavy)
      8L -> "héllo wörld ünïcode ♞ tokens 日本語 mixed in here too yes", // multi-byte UTF-8
      9L -> (1 to 40).map(i => s"a${i % 3}").mkString("  ") // empty tokens between words
    ) ++ (10L to 40L).map { i =>
      (i, Seq.fill(5 + rnd.nextInt(60))(s"v${rnd.nextInt(25)}").mkString(" "))
    }
    val df = adversarial.toDF("doc_id", "text")
    def toMap(r: DataFrame) = r.collect()
      .map(x => (x.getLong(0), x.getString(1))).groupBy(_._1)
      .map { case (id, fps) => id -> fps.map(_._2).toSet }
    assert(toMap(Winnow.fingerprints(df, "doc_id", "text", K, W))
      === toMap(Winnow.fingerprintsDeclarative(df, "doc_id", "text", K, W)))
    // and at (k, w) extremes
    for ((k, w) <- Seq((1, 1), (2, 7), (9, 2)))
      assert(toMap(Winnow.fingerprints(df, "doc_id", "text", k, w))
        === toMap(Winnow.fingerprintsDeclarative(df, "doc_id", "text", k, w)),
        s"(k=$k, w=$w)")
  }

  test("candidatePairs: planted quote pairs found, minShared respected") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      1L -> base,
      2L -> base, // exact duplicate: shares every fingerprint
      3L -> ((1 to 15).map(i => s"b$i") ++ (1 to 20).map(i => s"z$i")).mkString(" "),
      4L -> (1 to 40).map(i => s"c$i").mkString(" ") // unrelated
    ).toDF("doc_id", "text")
    val pairs = Winnow.candidatePairs(docs, "doc_id", "text", K, W, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.contains((1L, 2L)))
    assert(pairs((1L, 2L)) == bruteWinnow(base).size)
    assert(!pairs.keySet.exists(p => p._1 == 4L || p._2 == 4L))
    // doc 3 shares the b1..b15 region with 1 and 2
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)))
  }
}
