package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}

/** One in-flight event for the sessionizer. */
case class SessionEvent(user_id: Long, event_time: java.sql.Timestamp, value: Double)

/** One in-flight session interval aggregate. */
case class OpenSession(startMs: Long, lastMs: Long, n: Long, sum: Double)

/** Per-user state: the chronological list of sessions the watermark
  * has not yet sealed. Bounded by horizon/gap + 1 per user (a session
  * older than the horizon seals immediately), never event-count sized.
  */
case class PendingSessions(sessions: Seq[OpenSession])

/** A closed session, emitted exactly once. */
case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
    session_end: java.sql.Timestamp, n_events: Long, sum_value: Double)

/** Streaming gap-based sessionization — the real-time analogue of the
  * batch `q_sessionize` window program: a user's events belong to one
  * session until a silence longer than `gapSeconds`, at which point the
  * session closes and is emitted (append-mode, exactly once).
  *
  * This is the §2.9 custom-state surface: `flatMapGroupsWithState`
  * with an EVENT-TIME timeout. A session is emitted ONLY once the
  * WATERMARK — not wall clock — passes `last event + gap`: beyond that
  * point no surviving event (all have ts ≥ watermark) can extend or
  * bridge it, so emission is exactly-once, replay-deterministic, AND
  * correct for in-horizon stragglers — a late event that lands more
  * than a gap before a pending session forms its own earlier session
  * instead of being glued on, and one that lands between two pending
  * sessions merges them. State per key is the list of not-yet-sealed
  * session aggregates — bounded by horizon/gap + 1, independent of
  * history length; sealed keys are removed.
  */
object StreamingSessions {

  /** JSONL events {user_id, ts: epoch-seconds, value} under `dropDir`
    * → closed sessions appended to `outDir` as parquet (exactly-once
    * via the checkpoint, like the other drop-folder streams).
    */
  def sessionStream(spark: SparkSession, dropDir: String, outDir: String,
      checkpointDir: String, gapSeconds: Long,
      horizon: String = "0 seconds",
      format: String = "json"): StreamingQuery =
    sessionize(readEvents(spark, dropDir, format), gapSeconds, horizon)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", outDir)
      .start()

  private def readEvents(spark: SparkSession, dropDir: String,
      format: String): Dataset[SessionEvent] = {
    val schema = StructType(Seq(
      StructField("user_id", LongType),
      StructField("ts", LongType),
      StructField("value", DoubleType)))
    implicit val enc = Encoders.product[SessionEvent]
    // null-field rows — including malformed json lines, which
    // PERMISSIVE parsing surfaces as all-null rows — are dropped
    // here: a null event_time row would poison the watermark path
    // (see StreamingDedup)
    DropFolder.lenient(spark, dropDir, schema, format)
      .filter(col("user_id").isNotNull &&
        col("ts").isNotNull && col("value").isNotNull)
      .select(
        col("user_id"),
        timestamp_seconds(col("ts")).as("event_time"),
        col("value"))
      .as[SessionEvent]
  }

  /** Apply gap sessionization to a STREAMING dataset of events.
    * `horizon` is the watermark delay bounding how late an event may
    * arrive; later ones are dropped by the watermark before reaching
    * the state function. Batch inputs are rejected — the sealing logic
    * is driven by the watermark, which batch execution does not have;
    * use the windowed batch sessionize (`q_sessionize`) there.
    */
  def sessionize(events: Dataset[SessionEvent], gapSeconds: Long,
      horizon: String): Dataset[ClosedSession] = {
    require(gapSeconds > 0, s"gapSeconds must be positive, got $gapSeconds")
    require(events.isStreaming,
      "sessionize requires a streaming Dataset (batch has no watermark " +
        "to seal sessions) — use a window-function sessionize for batch")
    val gapMs = gapSeconds * 1000L
    implicit val closedEnc = Encoders.product[ClosedSession]
    implicit val stateEnc = Encoders.product[PendingSessions]
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
      state: GroupState[PendingSessions]): Iterator[ClosedSession] = {
    val wm = state.getCurrentWatermarkMs()
    val existing = state.getOption.map(_.sessions).getOrElse(Seq.empty)
    val incoming = events.map { e =>
      OpenSession(e.event_time.getTime, e.event_time.getTime, 1L, e.value)
    }
    // merge intervals whose silence is within the gap — covers events
    // extending a session, bridging two pending sessions, and
    // stragglers that must form their OWN earlier session
    val merged = (existing ++ incoming).sortBy(s => (s.startMs, s.lastMs))
      .foldLeft(List.empty[OpenSession]) {
        case (head :: tail, s) if s.startMs - head.lastMs <= gapMs =>
          OpenSession(head.startMs, math.max(head.lastMs, s.lastMs),
            head.n + s.n, head.sum + s.sum) :: tail
        case (acc, s) => s :: acc
      }.reverse
    // closed-for-good = the watermark passed last+gap: every surviving
    // event has ts ≥ watermark and so cannot attach
    val (finished, pending) = merged.partition(_.lastMs + gapMs < wm)
    if (pending.isEmpty) state.remove()
    else {
      state.update(PendingSessions(pending))
      state.setTimeoutTimestamp(
        math.max(pending.map(_.lastMs + gapMs).min, wm + 1L))
    }
    finished.iterator.map(closed(user, _))
  }
}
