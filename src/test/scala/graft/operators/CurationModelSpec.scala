package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Randomized DIFFERENTIAL tests: the distributed packSequences /
  * exactSubstringDedup implementations vs straight-line in-memory
  * reference models, over seeded random corpora. Catches the failure
  * class example-based specs miss — boundary interactions that only
  * some random layout produces (exact-multiple doc ends, span chains
  * across many windows, whole-corpus wipes).
  */
class CurationModelSpec extends AnyFunSuite with SparkTestBase {

  // ---- packSequences vs a sequential reference packer -------------------

  private def refPack(docs: Seq[(Long, Long)], C: Long): Set[(Long, Long, Long, Long, Long, Long)] = {
    var off = 0L
    docs.flatMap { case (id, n) =>
      val start = off
      off += n
      if (n == 0L) Seq.empty
      else (start / C to (start + n - 1) / C).map { seq =>
        val sfrom = math.max(start, seq * C)
        val sto = math.min(start + n, (seq + 1) * C) - 1
        (id, seq, sfrom - start, sto - start, sfrom - seq * C, sto - sfrom + 1)
      }
    }.toSet
  }

  test("packSequences equals the sequential reference model on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (1 to 6).foreach { trial =>
      val C = Seq(5L, 10L, 16L)(trial % 3)
      val docs = (1L to (10 + rnd.nextInt(30))).map(id =>
        // include zero-length docs and exact multiples of C
        id -> (rnd.nextInt(4) match {
          case 0 => 0L
          case 1 => C * (1 + rnd.nextInt(3))
          case _ => 1L + rnd.nextInt(2 * C.toInt)
        }))
      val got = Curation.packSequences(
          docs.toDF("id", "n").withColumn("g", lit("x")),
          "g", Seq("id"), "n", C)
        .select("id", "seq_id", "doc_from", "doc_to", "seq_off", "n_in_seq")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).toSet
      assert(got == refPack(docs, C), s"trial $trial (C=$C, docs=$docs)")
    }
  }

  // ---- exactSubstringDedup vs a brute-force reference -------------------

  private def refCut(docs: Seq[(Long, String)], L: Int, minCount: Int)
      : Map[Long, (String, Int, Int, Int)] = {
    val words = docs.map { case (id, t) => id -> t.trim.split(" ").toSeq }.toMap
    val wins = for {
      (id, ws) <- words.toSeq
      i <- 0 to ws.length - L
    } yield (id, i, ws.slice(i, i + L).mkString(" "))
    val counts = wins.groupBy(_._3).view.mapValues(_.size).toMap
    val flagged = wins.filter(w => counts(w._3) >= minCount)
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    words.map { case (id, ws) =>
      val ivs = flagged.getOrElse(id, Seq.empty)
        .foldLeft(Vector.empty[(Int, Int)]) { (acc, p) =>
          if (acc.nonEmpty && p <= acc.last._2 + 1)
            acc.init :+ ((acc.last._1, math.max(acc.last._2, p + L - 1)))
          else acc :+ ((p, p + L - 1))
        }
      val kept = ws.zipWithIndex
        .filterNot { case (_, i) => ivs.exists(v => i >= v._1 && i <= v._2) }
        .map(_._1)
      id -> (kept.mkString(" "), ws.length, ws.length - kept.length, ivs.length)
    }
  }

  test("exactSubstringDedup equals the brute-force reference on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d", "e", "f") // tiny ⇒ rich collisions
    (1 to 6).foreach { trial =>
      val L = 3 + trial % 3
      val docs = (1L to (6 + rnd.nextInt(10))).map(id =>
        id -> Seq.fill(1 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      val got = Dedup.exactSubstringDedup(
          docs.toDF("doc_id", "text"), "doc_id", "text", minLen = L)
        .collect().map(r => r.getLong(0) ->
          (r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
      assert(got == refCut(docs, L, minCount = 2), s"trial $trial (L=$L)")
    }
  }

  test("cutSharedSubstrings equals the reference restricted to eval-shared keys") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = Vector("u", "v", "w", "x", "y")
    (1 to 4).foreach { trial =>
      val L = 3
      val mkDoc = () => Seq.fill(4 + rnd.nextInt(15))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val train = (1L to 8L).map(id => id -> mkDoc())
      val evalD = (101L to 104L).map(id => id -> mkDoc())
      // reference: flag train windows present among eval windows
      val evalKeys = evalD.flatMap { case (_, t) =>
        val ws = t.trim.split(" ").toSeq
        (0 to ws.length - L).map(i => ws.slice(i, i + L).mkString(" "))
      }.toSet
      val expect = train.map { case (id, t) =>
        val ws = t.trim.split(" ").toSeq
        val flagged = (0 to ws.length - L)
          .filter(i => evalKeys(ws.slice(i, i + L).mkString(" ")))
        val ivs = flagged.foldLeft(Vector.empty[(Int, Int)]) { (acc, p) =>
          if (acc.nonEmpty && p <= acc.last._2 + 1)
            acc.init :+ ((acc.last._1, math.max(acc.last._2, p + L - 1)))
          else acc :+ ((p, p + L - 1))
        }
        val kept = ws.zipWithIndex
          .filterNot { case (_, i) => ivs.exists(v => i >= v._1 && i <= v._2) }
          .map(_._1)
        id -> (kept.mkString(" "), ws.length - kept.length, ivs.length)
      }.toMap
      val got = Dedup.cutSharedSubstrings(
          train.toDF("doc_id", "text"), "doc_id", "text",
          evalD.toDF("eid", "etext"), "etext", minLen = L)
        .collect().map(r => r.getLong(0) ->
          (r.getString(1), r.getInt(3), r.getInt(4))).toMap
      assert(got == expect, s"trial $trial")
    }
  }
}
