package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming surface over the `events` schema.
  *
  * Transform-only definitions (source/sink agnostic): the same logical
  * plans run from `readStream` in production and from `MemoryStream` /
  * file sources in tests. The reference is batch-only (SURVEY.md §2b —
  * streaming out of parity scope); this module is the forward-looking
  * extension for continuous ingestion at scale:
  *
  *   - event-time tumbling windows + watermark → bounded state: state
  *     for a window is dropped once the watermark passes its end, so
  *     state size is O(active windows × groups), independent of stream
  *     length;
  *   - streaming dedup via `dropDuplicatesWithinWatermark` — the
  *     streaming twin of `Dedup.exactKeepMin`, with state also bounded
  *     by the watermark.
  */
object EventsStream {

  /** hourly tumbling-window counts with a 2h late-data allowance */
  def hourlyByType(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("value") * 100).cast("long")).as("sum_value_cents"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("cnt"), col("sum_value_cents"))

  /** exactly-once per event_id within the watermark horizon */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Sessionization: per-user activity sessions closed by a 30-minute
    * inactivity gap (`session_window` — Spark's native session state;
    * merging windows, state dropped once the watermark passes a session's
    * end). The SAME definition runs in batch (watermark skipped — it is
    * streaming-only) and streaming; the batch twin is the ax_sessionize
    * gate query, and the streaming path is exercised by
    * EventsStreamSpec's watermark-advance test.
    *
    * Session end follows Spark's [start, last_event + gap) semantics: an
    * event at exactly last + gap starts a NEW session.
    */
  def sessionsByUser(events: DataFrame, gap: String = "30 minutes"): DataFrame = {
    val e = if (events.isStreaming) events.withWatermark("ts", "2 hours") else events
    e.groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("sum_value_cents"))
      .select(
        date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(col("sw.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value_cents"))
  }
}
