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

  test("crash replay is exactly-once: re-running a batch changes nothing") {
    import spark.implicits._
    val all = corpus
    val batches = Seq(all.take(13), all.drop(13)).map(_.toDF("doc_id", "text"))
    val dir = work()
    val expected = runBatches(batches, dir)
    val fpsBefore = spark.read.parquet(s"$dir/fps").count()
    // worst-case replay: BOTH writes of the last batch committed, then
    // the checkpoint didn't — the stream re-delivers batch 1 against a
    // store that already holds batch 1's own fingerprints
    StreamingNearDup.processBatch(spark, batches(1), s"$dir/fps",
      s"$dir/flags", 1L, k = 5, w = 4, minShared = 2)
    assert(spark.read.parquet(s"$dir/fps").count() === fpsBefore,
      "replayed batch must overwrite its own partition, not append")
    assert(spark.read.parquet(s"$dir/flags")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
      === expected, "replay must reproduce the identical flag set")
  }

  test("derivation plan: semi-join-pruned prior, no full-pool distinct") {
    import spark.implicits._
    val dir = work()
    runBatches(Seq(corpus.take(10).toDF("doc_id", "text")), dir)
    val prior = spark.read.parquet(s"$dir/fps")
      .filter(col("batch") =!= 1L).select("doc_id", "fp")
    val newFps = Winnow.fingerprints(
      corpus.drop(10).toDF("doc_id", "text"), "doc_id", "text", 5, 4)
    val plan = StreamingNearDup.flagDerivation(prior, newFps, 2)
      .queryExecution.optimizedPlan.toString()
    assert(plan.contains("LeftSemi"),
      "prior store must be pruned by a semi-join on the batch's fps")
    // the pool dedup (cross-batch redelivery protection) must exist,
    // and must consume the semi-join-PRUNED relation — a distinct
    // over the raw (prior ∪ new) pool would re-shuffle the whole
    // store every micro-batch. The optimizer prints parents first, so
    // the dedup Aggregate/Deduplicate on [_id_old, fp] must appear
    // ABOVE the LeftSemi in the plan text (the prune is inside its
    // subtree). The pair count groups [_id_new, _id_old], so the
    // "[_id_old" prefix uniquely identifies the pool dedup.
    val dedupAt = Seq(plan.indexOf("Aggregate [_id_old"),
      plan.indexOf("Deduplicate [_id_old")).filter(_ >= 0)
    assert(dedupAt.nonEmpty,
      s"pool dedup missing — cross-batch redelivery would double-count:\n$plan")
    assert(dedupAt.min < plan.indexOf("LeftSemi"),
      s"pool dedup must run over the PRUNED relation, not the raw store:\n$plan")
  }

  test("a document re-delivered in a LATER batch never double-counts shared fps") {
    import spark.implicits._
    // deterministically find a pair of texts sharing EXACTLY ONE
    // winnowed fingerprint: a minimal shared run (k + w - 1 words)
    // between otherwise-disjoint documents, searched over salts
    def brute(t: String): Set[String] = {
      val words = t.trim.split(" ", -1)
      if (words.length < 5) return Set.empty
      val grams = words.sliding(5).map { g =>
        java.security.MessageDigest.getInstance("MD5")
          .digest(g.mkString(" ").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 16)
      }.toVector
      if (grams.length < 4) Set.empty else grams.sliding(4).map(_.min).toSet
    }
    val (a, b) = (1 to 1000).iterator.map { salt =>
      val run = (1 to 8).map(i => s"s${salt}_$i")
      val ta = ((1 to 12).map(i => s"a${salt}_$i") ++ run).mkString(" ")
      val tb = (run ++ (1 to 12).map(i => s"b${salt}_$i")).mkString(" ")
      (ta, tb)
    }.find { case (ta, tb) => (brute(ta) & brute(tb)).size == 1 }.get
    // doc 7 (text a) arrives in batch 0 AND again in batch 1 (an
    // at-least-once producer re-appending a file — two different
    // store partitions, so batch=<id> overwrite alone cannot dedup
    // it); doc 9 shares exactly one fingerprint with it and must NOT
    // cross minShared=2 via the duplicated rows
    val got = runBatches(Seq(
      Seq(7L -> a).toDF("doc_id", "text"),
      Seq(7L -> a).toDF("doc_id", "text"),
      Seq(9L -> b).toDF("doc_id", "text")), work())
    assert(got === Set.empty,
      "duplicated (doc_id, fp) rows from redelivery double-counted into n_shared")
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
