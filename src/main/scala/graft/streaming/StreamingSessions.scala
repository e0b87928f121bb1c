package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}

/** One in-flight event for the sessionizer. */
case class SessionEvent(user_id: Long, event_time: java.sql.Timestamp, value: Double)

/** Open-session accumulator kept in the state store (one per user —
  * state is #active-users sized, never event-count sized).
  */
case class OpenSession(startMs: Long, lastMs: Long, n: Long, sum: Double)

/** A closed session, emitted exactly once. */
case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
    session_end: java.sql.Timestamp, n_events: Long, sum_value: Double)

/** Streaming gap-based sessionization — the real-time analogue of the
  * batch `q_sessionize` window program: a user's events belong to one
  * session until a silence longer than `gapSeconds`, at which point the
  * session closes and is emitted (append-mode, exactly once).
  *
  * This is the §2.9 custom-state surface: `flatMapGroupsWithState`
  * with an EVENT-TIME timeout. Sessions that close inside a
  * micro-batch (successor event arrives past the gap) emit
  * immediately; the open tail lives in the state store and is flushed
  * when the WATERMARK — not wall clock — passes `last event + gap`, so
  * results are reprocessing/replay-deterministic where a
  * processing-time timeout would not be. State per key is one fixed
  * struct; expired keys are removed, so the store is bounded by
  * concurrently-active users × horizon, independent of history length.
  */
object StreamingSessions {

  /** JSONL events {user_id, ts: epoch-seconds, value} under `dropDir`
    * → closed sessions appended to `outDir` as parquet (exactly-once
    * via the checkpoint, like the other drop-folder streams).
    */
  def sessionStream(spark: SparkSession, dropDir: String, outDir: String,
      checkpointDir: String, gapSeconds: Long,
      horizon: String = "0 seconds"): StreamingQuery =
    sessionize(readEvents(spark, dropDir), gapSeconds, horizon)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", outDir)
      .start()

  private def readEvents(spark: SparkSession, dropDir: String): Dataset[SessionEvent] = {
    val schema = StructType(Seq(
      StructField("user_id", LongType),
      StructField("ts", LongType),
      StructField("value", DoubleType)))
    implicit val enc = Encoders.product[SessionEvent]
    spark.readStream
      .schema(StructType(Seq(StructField("value", StringType))))
      .text(dropDir)
      .select(from_json(col("value"), schema).as("e"))
      // malformed lines are dropped explicitly — a null event_time row
      // would poison the watermark path (see StreamingDedup)
      .filter(col("e").isNotNull && col("e.user_id").isNotNull &&
        col("e.ts").isNotNull && col("e.value").isNotNull)
      .select(
        col("e.user_id").as("user_id"),
        timestamp_seconds(col("e.ts")).as("event_time"),
        col("e.value").as("value"))
      .as[SessionEvent]
  }

  /** Apply gap sessionization to a (possibly streaming) dataset of
    * events. `horizon` is the watermark delay bounding how late an
    * event may arrive; later ones are dropped by the watermark before
    * reaching the state function.
    */
  def sessionize(events: Dataset[SessionEvent], gapSeconds: Long,
      horizon: String): Dataset[ClosedSession] = {
    require(gapSeconds > 0, s"gapSeconds must be positive, got $gapSeconds")
    val gapMs = gapSeconds * 1000L
    implicit val closedEnc = Encoders.product[ClosedSession]
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val keyEnc = Encoders.scalaLong
    events
      .withWatermark("event_time", horizon)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        update(gapMs) _)
  }

  private def closed(user: Long, s: OpenSession): ClosedSession =
    ClosedSession(user, new java.sql.Timestamp(s.startMs),
      new java.sql.Timestamp(s.lastMs), s.n, s.sum)

  private def update(gapMs: Long)(user: Long, events: Iterator[SessionEvent],
      state: GroupState[OpenSession]): Iterator[ClosedSession] = {
    if (state.hasTimedOut) {
      // watermark passed last+gap with no newer event: flush and drop
      // the key's state entirely
      val done = closed(user, state.get)
      state.remove()
      return Iterator.single(done)
    }
    // micro-batches deliver a group's rows unordered; sessionization is
    // order-sensitive, so sort the batch (bounded by the batch, not the
    // stream)
    val sorted = events.toIndexedSeq.sortBy(_.event_time.getTime)
    val out = mutable.ArrayBuffer.empty[ClosedSession]
    var open = state.getOption
    sorted.foreach { e =>
      val t = e.event_time.getTime
      open = open match {
        case Some(s) if t - s.lastMs > gapMs =>
          out += closed(user, s)
          Some(OpenSession(t, t, 1L, e.value))
        case Some(s) =>
          // an in-horizon straggler may precede the open session —
          // widen both edges instead of assuming forward order
          Some(OpenSession(math.min(s.startMs, t), math.max(s.lastMs, t),
            s.n + 1L, s.sum + e.value))
        case None => Some(OpenSession(t, t, 1L, e.value))
      }
    }
    open.foreach { s =>
      state.update(s)
      // the timeout timestamp must sit beyond the current watermark
      // (Spark rejects it otherwise); an already-overdue session then
      // flushes on the next batch's timeout sweep
      state.setTimeoutTimestamp(
        math.max(s.lastMs + gapMs, state.getCurrentWatermarkMs() + 1L))
    }
    out.iterator
  }
}
