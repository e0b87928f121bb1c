package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class StreamingDedupSpec extends AnyFunSuite with SparkTestBase {

  test("streaming dedup keeps first arrival per fingerprint within the horizon") {
    val work = java.nio.file.Files.createTempDirectory("sdedup").toString
    val drop = s"$work/drop"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(drop))
    val t0 = 1660000000L

    def line(id: Long, ts: Long, text: String) =
      s"""{"doc_id":$id,"ts":$ts,"text":"$text"}"""

    // batch 1: doc 2 is an exact re-send of doc 1 (same normalized
    // text), doc 3 is distinct
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$drop/b1.jsonl"), Seq(
      line(1L, t0, "alpha beta gamma"),
      line(2L, t0 + 60, "  Alpha Beta Gamma  "), // dup after lower+trim
      line(3L, t0 + 90, "something else entirely")).mkString("\n"))
    StreamingDedup.dedupStream(spark, drop, s"$work/out", s"$work/ckpt", "1 hour")
      .awaitTermination(120000)

    // batch 2: another re-send within the horizon (dropped — state
    // persists across restarts via the checkpoint), a fresh doc, and
    // malformed lines that must be filtered, not emitted as nulls
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$drop/b2.jsonl"), Seq(
      line(4L, t0 + 120, "alpha beta gamma"), // still a dup
      """{"doc_id":6,"text":"missing ts entirely"}""",
      """not json at all {{{""",
      line(5L, t0 + 150, "brand new content")).mkString("\n"))
    StreamingDedup.dedupStream(spark, drop, s"$work/out", s"$work/ckpt", "1 hour")
      .awaitTermination(120000)

    val rows = spark.read.parquet(s"$work/out").collect()
    val kept = rows.map(_.getAs[Long]("doc_id")).toSet
    assert(kept == Set(1L, 3L, 5L), s"got $kept")
    // malformed lines are dropped, never emitted as null records
    assert(rows.forall(r => !r.anyNull), "null fields leaked from malformed input")
  }
}
