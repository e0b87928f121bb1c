package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class StreamingSessionsSpec extends AnyFunSuite with SparkTestBase {

  test("gap sessions close in-batch and by watermark timeout; state survives restart") {
    val work = java.nio.file.Files.createTempDirectory("ssess").toString
    val drop = s"$work/drop"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(drop))
    val t0 = 1660000000L
    val gap = 60L // seconds

    def line(u: Long, ts: Long, v: Double) =
      s"""{"user_id":$u,"ts":$ts,"value":$v}"""

    def run(): Unit =
      StreamingSessions.sessionStream(spark, drop, s"$work/out", s"$work/ckpt", gap)
        .awaitTermination(120000)

    def sessions(): Set[(Long, Long, Long, Long, Double)] =
      spark.read.parquet(s"$work/out").collect().map { r =>
        (r.getAs[Long]("user_id"),
          r.getAs[java.sql.Timestamp]("session_start").getTime / 1000 - t0,
          r.getAs[java.sql.Timestamp]("session_end").getTime / 1000 - t0,
          r.getAs[Long]("n_events"),
          r.getAs[Double]("sum_value"))
      }.toSet

    // batch 1 — user 1's first two events arrive OUT OF ORDER (+10
    // before +0); the +200 event is past the 60s gap, so session A
    // closes inside the batch. User 2 opens a lone session.
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$drop/b1.jsonl"), Seq(
      line(1L, t0 + 10, 2.0),
      line(1L, t0, 1.0),
      line(1L, t0 + 200, 4.0),
      line(2L, t0 + 50, 8.0),
      """garbage {{{""").mkString("\n"))
    run()
    // AvailableNow runs a trailing timeout sweep after the watermark
    // advances to t0+200, so user 2's session (timeout t0+110) flushes
    // in the same run; user 1's open session (timeout t0+260) is held.
    assert(sessions() == Set(
      (1L, 0L, 10L, 2L, 3.0),
      (2L, 50L, 50L, 1L, 8.0)))

    // batch 2 (restart from checkpoint) — the t0+500 event moves the
    // watermark past user 1's timeout: its held session must still be
    // in the restored state store, and flushes. User 3 stays open
    // (timeout t0+560), proving expiry is per-key.
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$drop/b2.jsonl"), Seq(
      line(3L, t0 + 500, 16.0)).mkString("\n"))
    run()
    assert(sessions() == Set(
      (1L, 0L, 10L, 2L, 3.0),
      (2L, 50L, 50L, 1L, 8.0),
      (1L, 200L, 200L, 1L, 4.0)))

    // batch 3 (restart) — watermark t0+1000 flushes user 3; user 4
    // (timeout t0+1060) becomes the new open tail.
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$drop/b3.jsonl"), Seq(
      line(4L, t0 + 1000, 32.0)).mkString("\n"))
    run()
    assert(sessions() == Set(
      (1L, 0L, 10L, 2L, 3.0),
      (2L, 50L, 50L, 1L, 8.0),
      (1L, 200L, 200L, 1L, 4.0),
      (3L, 500L, 500L, 1L, 16.0)))
  }

  test("in-horizon straggler forms its own earlier session instead of gluing on") {
    val work = java.nio.file.Files.createTempDirectory("ssess2").toString
    val drop = s"$work/drop"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(drop))
    val t0 = 1660000000L

    def line(u: Long, ts: Long, v: Double) =
      s"""{"user_id":$u,"ts":$ts,"value":$v}"""
    def run(): Unit =
      StreamingSessions.sessionStream(spark, drop, s"$work/out", s"$work/ckpt",
          gapSeconds = 60, horizon = "2000 seconds")
        .awaitTermination(120000)

    // batch 1: user 1 at t0+1000 only
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$drop/b1.jsonl"),
      line(1L, t0 + 1000, 1.0))
    run()
    // batch 2: a straggler at t0 — 1000s BEFORE the pending session,
    // far beyond the 60s gap, but within the 2000s horizon. It must
    // become its own session. A third event bridges nothing (far
    // future) and advances the watermark past both.
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$drop/b2.jsonl"),
      line(1L, t0, 2.0))
    run()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$drop/b3.jsonl"),
      line(9L, t0 + 5000, 0.0))
    run()

    val sess = spark.read.parquet(s"$work/out").collect()
      .filter(_.getAs[Long]("user_id") == 1L)
      .map(r => (r.getAs[java.sql.Timestamp]("session_start").getTime / 1000 - t0,
        r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toSet
    assert(sess == Set((0L, 1L, 2.0), (1000L, 1L, 1.0)),
      s"straggler must not merge across a >gap silence; got $sess")
  }

  test("guard: non-positive gap is rejected") {
    import spark.implicits._
    val ds = Seq(SessionEvent(1L, new java.sql.Timestamp(0L), 1.0)).toDS()
    intercept[IllegalArgumentException](
      StreamingSessions.sessionize(ds, 0L, "0 seconds"))
  }
}
