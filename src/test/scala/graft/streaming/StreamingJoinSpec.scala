package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class StreamingJoinSpec extends AnyFunSuite with SparkTestBase {

  test("stream-stream reward join: in-window matches only, state survives restart") {
    val work = java.nio.file.Files.createTempDirectory("sjoin").toString
    val dDir = s"$work/decisions"
    val rDir = s"$work/rewards"
    for (d <- Seq(dDir, rDir))
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
    val t0 = 1660000000L

    def dLine(id: String, ts: Long, item: String) =
      s"""{"decision_id":"$id","ts":$ts,"item":"$item"}"""
    def rLine(id: String, ts: Long, reward: Double) =
      s"""{"decision_id":"$id","ts":$ts,"reward":$reward}"""

    // batch 1: d1 rewarded in-window (+600s), d2's reward arrives
    // BEYOND maxRewardDelay (2h) — must not join; d3 unrewarded (yet)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dDir/b1.jsonl"), Seq(
      dLine("d1", t0, "apple"),
      dLine("d2", t0, "pear"),
      dLine("d3", t0 + 100, "plum")).mkString("\n"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$rDir/b1.jsonl"), Seq(
      rLine("d1", t0 + 600, 1.5),
      rLine("d2", t0 + 7201, 9.9), // 1s past the 2h window
      """not json {{{""",
      rLine("dX", t0 + 10, 0.5) // orphan: no such decision
    ).mkString("\n"))
    StreamingJoin.rewardJoinStream(spark, dDir, rDir, s"$work/out", s"$work/ckpt")
      .awaitTermination(120000)

    // batch 2 (restart from checkpoint): d3's reward arrives late but
    // in-window — the decision's join state must still be there
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$rDir/b2.jsonl"), Seq(
      rLine("d3", t0 + 3600, 2.25)).mkString("\n"))
    StreamingJoin.rewardJoinStream(spark, dDir, rDir, s"$work/out", s"$work/ckpt")
      .awaitTermination(120000)

    val rows = spark.read.parquet(s"$work/out").collect()
      .map(r => (r.getAs[String]("decision_id"), r.getAs[String]("item"),
        r.getAs[Double]("reward"), r.getAs[Long]("delay_sec"))).toSet
    assert(rows == Set(
      ("d1", "apple", 1.5, 600L),
      ("d3", "plum", 2.25, 3500L)), s"got $rows")
  }
}
