package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.operators.Winnow

class StreamingNearDupSpec extends AnyFunSuite with SparkTestBase {

  private def work(): String = {
    val d = java.nio.file.Files.createTempDirectory("neardup_spec")
    d.toFile.deleteOnExit()
    d.toString
  }

  /** Batch ground truth under the id-order contract: a doc is
    * flagged iff a smaller-id doc shares >= minShared fingerprints.
    */
  private def batchFlags(docs: DataFrame, minShared: Int): Set[Long] =
    Winnow.candidatePairs(docs, "doc_id", "text", minShared = minShared)
      .collect().map(r => math.max(r.getLong(0), r.getLong(1))).toSet

  private def runBatches(batches: Seq[DataFrame], dir: String,
      minShared: Int = 2): Set[Long] = {
    batches.zipWithIndex.foreach { case (b, i) =>
      StreamingNearDup.processBatch(spark, b, s"$dir/fps", s"$dir/flags",
        i.toLong, k = 5, w = 4, minShared = minShared)
    }
    spark.read.parquet(s"$dir/flags")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
  }

  private def corpus = {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val bases = (1L to 20L).map { i =>
      (i, Seq.fill(25)(s"w${i}_${rnd.nextInt(30)}").mkString(" "))
    }
    // quotes of bases 1-6 under ids 100+: long shared runs guarantee
    // shared fingerprints with their parents
    val quotes = (1L to 6L).map { i =>
      (100L + i, bases(i.toInt - 1)._2.split(" ").slice(2, 20).mkString(" "))
    }
    (bases ++ quotes).map { case (id, t) => (id, t) }
  }

  test("incremental flags equal the batch derivation regardless of batching") {
    import spark.implicits._
    val all = corpus
    val expected = batchFlags(all.toDF("doc_id", "text"), 2)
    assert(expected.nonEmpty)
    // shuffled arrival, 3 uneven batches
    val shuffled = new scala.util.Random(7).shuffle(all)
    val batches = Seq(
      shuffled.take(9), shuffled.slice(9, 18), shuffled.drop(18))
      .map(_.toDF("doc_id", "text"))
    assert(runBatches(batches, work()) === expected)
  }

  test("a late-arriving lower id flags the already-indexed higher id") {
    import spark.implicits._
    val parent = (1 to 30).map(i => s"p$i").mkString(" ")
    val quote = (3 to 20).map(i => s"p$i").mkString(" ")
    // the HIGHER id (the quote, 50) arrives FIRST; the parent (7)
    // arrives in a later batch — 50 must still end up flagged
    val dir = work()
    val got = runBatches(Seq(
      Seq(50L -> quote).toDF("doc_id", "text"),
      Seq(7L -> parent).toDF("doc_id", "text")), dir)
    assert(got === Set(50L))
  }

  test("no flags below minShared; empty and null-text batches are safe") {
    import spark.implicits._
    val dir = work()
    val a = (1 to 30).map(i => s"a$i").mkString(" ")
    val b = (1 to 30).map(i => s"b$i").mkString(" ")
    val got = runBatches(Seq(
      Seq(1L -> a, 2L -> b).toDF("doc_id", "text"),
      Seq((3L, null.asInstanceOf[String])).toDF("doc_id", "text")),
      dir, minShared = 2)
    assert(got === Set.empty)
    // fingerprint table holds both real docs, nothing for the null
    assert(spark.read.parquet(s"$dir/fps")
      .select("doc_id").distinct().count() == 2L)
  }
}
