package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class StreamingAggregatesSpec extends AnyFunSuite with SparkTestBase {

  test("watermarked tumbling windows emit closed windows, drop too-late rows") {
    val work = java.nio.file.Files.createTempDirectory("sagg").toString
    val drop = s"$work/drop"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(drop))
    val hour = 3600L
    val t0 = 1660000000L - 1660000000L % hour // aligned hour start

    def line(ts: Long, tpe: String, v: Double) =
      s"""{"ts":$ts,"event_type":"$tpe","value":$v}"""

    // batch 1: window A (t0) and window B (t0+1h); max event time ends
    // far enough ahead that the watermark passes window A's end
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$drop/b1.jsonl"), Seq(
      line(t0 + 60, "click", 1.0),
      line(t0 + 120, "click", 2.0),
      line(t0 + hour + 60, "click", 10.0),
      line(t0 + 2 * hour + 60, "click", 5.0), // window C, keeps WM moving
      line(t0 + 3 * hour, "click", 7.0)).mkString("\n"))
    val q1 = StreamingAggregates.windowedCounts(
      spark, drop, s"$work/out", s"$work/ckpt", "1 hour", "30 minutes")
    q1.awaitTermination(120000)

    // batch 2: a VERY late row for window A (watermark long past) and a
    // fresh row; the late row must not resurrect the closed window
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$drop/b2.jsonl"), Seq(
      line(t0 + 61, "click", 100.0), // too late — dropped
      line(t0 + 4 * hour, "click", 9.0)).mkString("\n"))
    val q2 = StreamingAggregates.windowedCounts(
      spark, drop, s"$work/out", s"$work/ckpt", "1 hour", "30 minutes")
    q2.awaitTermination(120000)

    val out = spark.read.parquet(s"$work/out")
      .collect().map(r => (r.getTimestamp(0).toInstant.getEpochSecond,
        r.getLong(2), r.getDouble(3))).sortBy(_._1)
    // window A closed with exactly its two ON-TIME rows
    val winA = out.find(_._1 == t0)
    assert(winA.isDefined, s"window A missing from ${out.toSeq}")
    assert(winA.get._2 == 2 && winA.get._3 == 3.0,
      s"late row must be dropped, got $winA")
  }
}
