package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.core.Ksuid
import graft.ingest.{Groom, PartitionStore}
import graft.schema.Schema

class StreamingIngestSpec extends AnyFunSuite with SparkTestBase {

  private val base = 1660000000L
  private val now = 1700000000L

  private def decisionLine(i: Int): String = {
    val id = Ksuid.deterministic(base + i, i.toLong)
    s"""{"message_id":"$id","model":"sm","count":2,"item":{"v":$i},"context":{}}"""
  }

  private def rewardLine(i: Int, r: Double): String = {
    val did = Ksuid.deterministic(base + i, i.toLong)
    val mid = Ksuid.deterministic(base + i + 600, (i + 50000).toLong)
    s"""{"message_id":"$mid","model":"sm","decision_id":"$did","reward":$r}"""
  }

  test("file-source stream ingests drops incrementally; groom closes late rewards") {
    val work = java.nio.file.Files.createTempDirectory("stream").toString
    val drop = s"$work/drop"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(drop))

    // drop 1: decisions 0..49
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$drop/batch1.jsonl"),
      (0 until 50).map(decisionLine).mkString("\n"))
    // drop 2: late rewards for 0..24 + new decisions 50..59
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$drop/batch2.jsonl"),
      ((0 until 25).map(rewardLine(_, 2.0)) ++ (50 until 60).map(decisionLine)).mkString("\n"))

    val q = StreamingIngest.start(spark, drop, s"$work/store", s"$work/ckpt",
      nowEpochSeconds = () => now)
    q.awaitTermination(120000)

    // both drops ingested; late rewards are partial rows until groom
    val keys1 = PartitionStore.listKeys(spark, s"$work/store", "sm")
    assert(keys1.nonEmpty)
    val beforeGroom = PartitionStore.read(spark, s"$work/store", keys1)
    assert(beforeGroom.filter(col(Schema.Item).isNotNull).count() == 60)

    Groom.groom(spark, s"$work/store", "sm")
    val keys2 = PartitionStore.listKeys(spark, s"$work/store", "sm")
    Groom.assertNoOverlappingKeys(keys2)
    val after = PartitionStore.read(spark, s"$work/store", keys2)
    assert(after.count() == 60) // every decision exactly once, no orphans
    assert(after.filter(col(Schema.Reward) > 0).count() == 25)
    assert(math.abs(after.agg(sum(Schema.Reward)).collect().head.getDouble(0) - 50.0) < 1e-9)

    // restart with a third drop: checkpoint resumes, no reprocessing
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$drop/batch3.jsonl"),
      (60 until 70).map(decisionLine).mkString("\n"))
    val q2 = StreamingIngest.start(spark, drop, s"$work/store", s"$work/ckpt",
      nowEpochSeconds = () => now)
    q2.awaitTermination(120000)
    Groom.groom(spark, s"$work/store", "sm")
    val finalKeys = PartitionStore.listKeys(spark, s"$work/store", "sm")
    val finalDf = PartitionStore.read(spark, s"$work/store", finalKeys)
    assert(finalDf.count() == 70)
    assert(finalDf.select(Schema.DecisionId).distinct().count() == 70)
  }
}
