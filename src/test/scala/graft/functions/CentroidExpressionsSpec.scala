package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.operators.{Ann, Dedup, Pq}

/** The native vector-model expressions must be bit-identical to the
  * Scala UDFs they replaced (same accumulation order, same epsilon
  * placement, same tie-breaks), and the operator plans that use them
  * must be UDF-free.
  */
class CentroidExpressionsSpec extends AnyFunSuite with SparkTestBase {

  private val rnd = new scala.util.Random(17)
  private val dim = 16
  private def randVec(): Seq[Double] = Seq.fill(dim)(rnd.nextDouble() * 2 - 1)

  private val cents: Array[Seq[Double]] = Array.fill(7)(randVec())
  private val vecs: Seq[(Long, Seq[Double])] =
    (1 to 300).map(i => (i.toLong, randVec()))

  // ---- scala references: the exact bodies of the replaced UDFs ----------

  private def refAssign(v: Seq[Double]): Int = {
    val centArr = cents.map(_.toArray)
    val centNorms = centArr.map(c => math.sqrt(c.map(x => x * x).sum + 1e-12))
    var best = 0; var bestScore = Double.NegativeInfinity
    var c = 0
    while (c < centArr.length) {
      val cent = centArr(c)
      var s = 0.0
      var i = 0
      while (i < cent.length) { s += v(i) * cent(i); i += 1 }
      val score = s / centNorms(c)
      if (score > bestScore) { bestScore = score; best = c }
      c += 1
    }
    best
  }

  test("nearestCell expression equals the UDF body on every vector") {
    import spark.implicits._
    val df = vecs.toDF("id", "v").repartition(3)
    val out = df.select(col("id"),
        CentroidExpressions.nearestCell(col("v"), cents).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    vecs.foreach { case (id, v) =>
      assert(out(id) == refAssign(v), s"id=$id")
    }
  }

  test("nearestCells expression equals Ann.nearestCells (order included)") {
    import spark.implicits._
    val df = vecs.toDF("id", "v").repartition(3)
    for (nprobe <- Seq(1, 3, 7, 99)) {
      val out = df.select(col("id"),
          CentroidExpressions.nearestCells(col("v"), cents, nprobe).as("cells"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      vecs.foreach { case (id, v) =>
        assert(out(id) == Ann.nearestCells(v, cents, nprobe), s"id=$id nprobe=$nprobe")
      }
    }
  }

  test("pqEncode expression equals the UDF body; short vector throws") {
    import spark.implicits._
    val m = 4
    val k = 3
    val subLen = dim / m
    val codebook: Array[Array[Array[Double]]] =
      Array.fill(m)(Array.fill(k)(Array.fill(subLen)(rnd.nextDouble())))
    def refEncode(v: Seq[Double]): Seq[Int] =
      (0 until m).map { i =>
        val cb = codebook(i)
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < cb.length) {
          var d = 0.0
          var j = 0
          while (j < subLen) {
            val diff = v(i * subLen + j) - cb(c)(j); d += diff * diff; j += 1
          }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        best
      }
    val df = vecs.toDF("id", "v").repartition(3)
    val out = df.select(col("id"),
        CentroidExpressions.pqEncode(col("v"), codebook).as("code"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    vecs.foreach { case (id, v) => assert(out(id) == refEncode(v), s"id=$id") }

    // a dimension-mismatched vector FAILS the job (like the UDF it
    // replaced) — a silent null would drop the row from index builds
    // and corrupt recall with no signal
    val short = Seq((1L, Seq(1.0, 2.0))).toDF("id", "v")
    val e = intercept[Exception] {
      short.select(CentroidExpressions.pqEncode(col("v"), codebook)).collect()
    }
    assert(e.getMessage.contains("pq_encode") ||
      Option(e.getCause).exists(_.getMessage.contains("pq_encode")), e.toString)
  }

  test("nearestCell: dimension-mismatched vector throws, not null-drops") {
    import spark.implicits._
    val short = Seq((1L, Seq(1.0, 2.0))).toDF("id", "v")
    val e = intercept[Exception] {
      short.select(CentroidExpressions.nearestCell(col("v"), cents)).collect()
    }
    assert(e.getMessage.contains("nearest_cell") ||
      Option(e.getCause).exists(_.getMessage.contains("nearest_cell")), e.toString)
  }

  test("signLsh expression equals the UDF body, incl. short vectors") {
    import spark.implicits._
    val planes = Array.fill(64, dim)(rnd.nextGaussian())
    def refSign(v: Seq[Double]): Long = {
      var sig = 0L
      var p = 0
      while (p < 64) {
        var s = 0.0
        var i = 0
        while (i < dim && i < v.length) { s += v(i) * planes(p)(i); i += 1 }
        if (s > 0) sig |= (1L << p)
        p += 1
      }
      sig
    }
    val mixed = vecs ++ Seq((9001L, Seq(0.5, -0.5)), (9002L, Seq.empty[Double]))
    val df = mixed.toDF("id", "v").repartition(3)
    val out = df.select(col("id"),
        CentroidExpressions.signLsh(col("v"), planes).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    mixed.foreach { case (id, v) => assert(out(id) == refSign(v), s"id=$id") }
  }

  test("simHash expression equals Dedup.simHash for both word hashes") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumped over the lazy dog"),
      (3L, "completely different content entirely"),
      (4L, "single"),
      (5L, "répété unicode wörds répété"))
    for (wordHash <- Seq(Dedup.xxh3WordHash, Dedup.md5WordHash)) {
      val out = Dedup.withSimHash(docs.toDF("id", "text"), "text", wordHash)
        .collect().map(r => r.getLong(0) -> r.getAs[Long]("simhash")).toMap
      docs.foreach { case (id, text) =>
        val words = text.trim.split(" ").distinct.toSeq
        assert(out(id) == Dedup.simHash(words, wordHash), s"id=$id")
      }
    }
  }

  test("ANN and PQ operator plans are UDF-free") {
    import spark.implicits._
    val corpus = vecs.toDF("id", "v").repartition(3)
    val queries = vecs.take(5).toDF("qid", "v")

    val assignPlan = Ann.withCell(corpus, "v", cents)
      .queryExecution.executedPlan.toString
    assert(!assignPlan.contains("ScalaUDF"), assignPlan)

    val join = Ann.topKJoin(queries, corpus, "v", "id", "qid", k = 3,
      cents = cents, nprobe = 2)
    join.collect()
    val joinPlan = join.queryExecution.executedPlan.toString
    assert(!joinPlan.contains("ScalaUDF"), joinPlan)

    val codebook: Array[Array[Array[Double]]] =
      Array.fill(4)(Array.fill(3)(Array.fill(dim / 4)(rnd.nextDouble())))
    val pqPlan = Pq.encode(corpus, "v", codebook)
      .queryExecution.executedPlan.toString
    assert(!pqPlan.contains("ScalaUDF"), pqPlan)

    val shPlan = Dedup.withSimHash(Seq((1L, "a b c")).toDF("id", "text"), "text")
      .queryExecution.executedPlan.toString
    assert(!shPlan.contains("ScalaUDF"), shPlan)
  }
}
