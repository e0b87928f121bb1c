package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class StreamingRollupSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val schema = StructType(Seq(StructField("k", StringType)))

  private def countRollup(b: org.apache.spark.sql.DataFrame) =
    b.groupBy("k").agg(count(lit(1)).as("n"))

  private def mergedCounts(stateDir: String): Map[String, Long] =
    StreamingRollup.merged(spark, stateDir, Seq("k"), Seq("n"))
      .collect().map(r => r.getAs[String]("k") -> r.getAs[Long]("n")).toMap

  test("merged state equals one rollup over everything delivered") {
    val work = tmp("rollup_parity")
    val rows = (0 until 400).map(i => s"k${i % 17}")
    // several files -> several micro-batches (maxFilesPerTrigger = 1)
    rows.toDF("k").repartition(5).write.json(s"$work/drop")
    StreamingRollup.rollupStream(spark, s"$work/drop", s"$work/state",
      s"$work/ckpt", schema)(countRollup).awaitTermination()
    val expect = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(mergedCounts(s"$work/state") === expect)
    // state really is multi-batch (the parity is cross-batch addition,
    // not one trivial batch)
    val batches = new java.io.File(s"$work/state").listFiles()
      .count(_.getName.startsWith("batch="))
    assert(batches >= 2, s"expected several micro-batches, got $batches")
  }

  test("replayed batch overwrites its own partition: merged state unchanged") {
    val work = tmp("rollup_replay")
    Seq("a", "a", "b").toDF("k").coalesce(1).write.json(s"$work/drop")
    StreamingRollup.rollupStream(spark, s"$work/drop", s"$work/state",
      s"$work/ckpt", schema)(countRollup).awaitTermination()
    val before = mergedCounts(s"$work/state")
    assert(before === Map("a" -> 2L, "b" -> 1L))
    // simulate a crash-replay of batch 0: the foreachBatch body runs
    // again with the same input and batch id — mode(overwrite) into
    // batch=0 must leave the merged view identical, not double it
    val batchInput = spark.read.schema(schema).json(s"$work/drop")
    countRollup(batchInput).write.mode("overwrite")
      .parquet(s"$work/state/batch=0")
    assert(mergedCounts(s"$work/state") === before)
  }

  test("compact folds committed batches into a base; merged view unchanged") {
    val work = tmp("rollup_compact")
    (0 until 200).map(i => s"k${i % 9}").toDF("k")
      .repartition(4).write.json(s"$work/drop")
    StreamingRollup.rollupStream(spark, s"$work/drop", s"$work/state",
      s"$work/ckpt", schema)(countRollup).awaitTermination()
    val before = mergedCounts(s"$work/state")
    val batchIds = new java.io.File(s"$work/state").listFiles()
      .filter(_.getName.startsWith("batch="))
      .map(_.getName.stripPrefix("batch=").toLong).sorted
    assert(batchIds.length >= 3)
    val keepFrom = batchIds.last // fold all but the last (replayable) batch
    StreamingRollup.compact(spark, s"$work/state", s"$work/state2",
      Seq("k"), Seq("n"), keepFrom)
    assert(mergedCounts(s"$work/state2") === before)
    val after = new java.io.File(s"$work/state2").listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName).sorted
    assert(after === Array(s"batch=$keepFrom", "batch=-1").sorted)
    // a replay of the kept batch still overwrites cleanly post-compact
    // (sourced from the ORIGINAL state dir — reading and overwriting
    // the same path in one lazy plan would delete its own input)
    spark.read.parquet(s"$work/state/batch=$keepFrom")
      .write.mode("overwrite").parquet(s"$work/state2/batch=$keepFrom")
    assert(mergedCounts(s"$work/state2") === before)
    // compacting again (nothing new to fold below keepFrom) folds the
    // base with nothing and keeps the tail — still the same view
    StreamingRollup.compact(spark, s"$work/state2", s"$work/state3",
      Seq("k"), Seq("n"), keepFrom)
    assert(mergedCounts(s"$work/state3") === before)
    intercept[IllegalArgumentException](
      StreamingRollup.compact(spark, s"$work/state3", s"$work/state3",
        Seq("k"), Seq("n"), 0L))
  }

  test("merged requires keys and sums") {
    intercept[IllegalArgumentException](
      StreamingRollup.merged(spark, "/nonexistent", Nil, Seq("n")))
    intercept[IllegalArgumentException](
      StreamingRollup.merged(spark, "/nonexistent", Seq("k"), Nil))
  }
}
