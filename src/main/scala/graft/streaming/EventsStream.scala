package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode,
  StatefulProcessor, TimeMode, TTLConfig, ValueState}

/** typed event projection for the custom-state operator */
final case class PurchaseEv(
    user_id: Long, tsMicros: Long, event_id: Long, cents: Long, isPurchase: Boolean)

/** per-user custom state: running totals + current/best purchase streak */
final case class StreakState(cnt: Long, sumCents: Long, cur: Long, best: Long)

/** emitted row: per-user lifetime stats incl. longest purchase streak */
final case class UserStreak(
    user_id: Long, n_events: Long, sum_value_cents: Long, best_purchase_streak: Long)

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

  /** Per-(hour, value-bucket) histogram counts — the streaming quantile
    * monitor's state. Quantiles are NOT incrementally mergeable across
    * triggers; the bounded histogram IS, so that is what streams
    * (state O(hours × buckets), never O(events)); the sink readout
    * resolves exact-from-histogram percentiles. Bucket = integer cents
    * div 2000 — bounded by the value domain, not the event volume.
    */
  def hourlyValueHist(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .withColumn("bucket",
        expr("CAST(round(value * 100) AS BIGINT) div 2000"))
      .groupBy(window(col("ts"), "1 hour"), col("bucket"))
      .agg(count(lit(1)).as("n"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("bucket"), col("n"))

  /** 2-hour windows sliding every hour — each event contributes to two
    * overlapping windows (Spark plans this as an Expand of the window
    * assignments before the stateful aggregate, so state is O(active
    * windows × types) exactly like the tumbling case, just ×2 windows)
    */
  def slidingByType(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("cnt"))

  /** CHAINED stateful aggregation (Spark ≥ 3.4 multiple-stateful-
    * operator support): hourly tumbling counts re-aggregated to daily
    * totals INSIDE one streaming query, by re-windowing the first
    * aggregate's `window` struct column. The production shape for
    * cascading rollups (minute→hour→day dashboards): the second tier's
    * state holds one row per (day, type) — it aggregates the first
    * tier's ~24×-smaller output, never raw events — and both tiers
    * share one watermark, so a day finalizes in the same micro-batch
    * that finalizes its last hour. The pre-3.4 workaround (two queries
    * glued by an intermediate sink) pays a full sink/source round-trip
    * and loses end-to-end exactly-once across the tiers.
    */
  def dailyChained(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("value") * 100).cast("long")).as("cents"))
      .groupBy(window(col("window"), "1 day"), col("event_type"))
      .agg(sum(col("cnt")).as("cnt"),
        sum(col("cents")).as("sum_value_cents"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("cnt"), col("sum_value_cents"))

  /** exactly-once per event_id within the watermark horizon */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** DEDUP → AGGREGATE chained in one query — the exactly-once counting
    * shape for at-least-once sources (Kafka replays, retried file
    * batches): dropDuplicatesWithinWatermark's state screens replays,
    * the downstream windowed aggregate counts each event exactly once,
    * and both stateful operators share the watermark so dedup state
    * evicts on the same horizon that finalizes windows. Without the
    * chain, replayed events double-count; with a terminal dedup
    * instead, the aggregate's state would have already absorbed the
    * duplicate.
    */
  def dedupThenHourly(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("value") * 100).cast("long")).as("sum_value_cents"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("cnt"), col("sum_value_cents"))

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

  /** Watermarked stream-stream join: each purchase event paired with
    * the same user's view events from the preceding hour. Both sides
    * carry watermarks and the join condition bounds event-time distance
    * — the two facts Spark needs to EXPIRE join state (a view's state
    * is dropped once the watermark passes its ts + 1h), keeping state
    * O(events in the watermark horizon) instead of unbounded. The same
    * definition joins two batch frames (watermarks skipped — they are
    * streaming-only).
    */
  /** Watermarked stream-stream join on user + a 1-hour event-time
    * range. `joinType` extends it to LEFT OUTER: matches emit as they
    * happen, and an unmatched purchase emits its null-padded row only
    * once the watermark proves no matching view can still arrive —
    * exactly the state-eviction semantics batch outer joins don't need
    * (in batch, "no match" is knowable immediately). Both watermarks
    * bound the join state on both sides.
    */
  def purchaseViewJoin(purchases: DataFrame, views: DataFrame,
      joinType: String = "inner"): DataFrame = {
    def wm(df: DataFrame): DataFrame =
      if (df.isStreaming) df.withWatermark("ts", "2 hours") else df
    val p = wm(purchases).select(
      col("user_id").as("p_user"), col("ts").as("p_ts"),
      col("event_id").as("purchase_id"))
    val v = wm(views).select(
      col("user_id").as("v_user"), col("ts").as("v_ts"),
      col("event_id").as("view_id"))
    val joined = p.join(v,
      col("p_user") === col("v_user") &&
        col("v_ts") <= col("p_ts") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"),
      joinType)
    // a semi join carries no right-side columns; the left row emits (at
    // most once) as soon as any match arrives
    if (joinType == "left_semi") joined.select(col("purchase_id"))
    else joined.select(col("purchase_id"), col("view_id"))
  }

  /** STREAM-STREAM JOIN → windowed AGGREGATE chained in one query —
    * the attribution-rollup shape (conversions joined to their
    * preceding touches, counted per hour) that pre-3.4 required two
    * queries around an intermediate sink. Both join sides and the
    * aggregate share the 2h watermark: join state evicts and windows
    * finalize on the same horizon, and an inner-join row flows into
    * the aggregate in the micro-batch it matches.
    */
  def attributionHourly(purchases: DataFrame, views: DataFrame): DataFrame = {
    val p = purchases.withWatermark("ts", "2 hours").select(
      col("user_id").as("p_user"), col("ts").as("p_ts"),
      col("event_id").as("purchase_id"))
    val v = views.withWatermark("ts", "2 hours").select(
      col("user_id").as("v_user"), col("ts").as("v_ts"))
    p.join(v,
        col("p_user") === col("v_user") &&
          col("v_ts") <= col("p_ts") &&
          col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"))
      .groupBy(window(col("p_ts"), "1 hour"))
      .agg(count(lit(1)).as("n_attrib"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("n_attrib"))
  }

  /** Custom keyed state via `flatMapGroupsWithState`: per-user lifetime
    * stats plus the longest streak of consecutive `purchase` events in
    * event order — a state machine windowed aggregation cannot express
    * (the streak resets on any intervening event, with no window bound).
    *
    * The SAME definition runs in batch (one state pass per group) and
    * streaming (state persisted across triggers). Every emitted metric
    * is monotone non-decreasing (counts, non-negative cent sums, best
    * streak), so the final answer of an Update-mode run is
    * `max` per user over all emitted rows — what the gate query takes.
    *
    * Ordering: events are folded sorted by (ts, event_id) *within* each
    * trigger — a group's trigger batch is collected in executor memory
    * (fine: one user's per-trigger events; a pathological hot user
    * would be time-bucketed upstream). Cross-trigger, the fold assumes
    * triggers arrive in event-time order, which holds for replayed
    * time-ordered logs (and our file-source gate). A fully
    * late-data-proof variant buffers events in state until the
    * watermark passes, folding only then (EventTimeTimeout) — noted,
    * not needed for the replay contract the gate checks.
    */
  def purchaseStreaks(events: DataFrame): Dataset[UserStreak] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(
        col("user_id"),
        unix_micros(col("ts")).as("tsMicros"),
        col("event_id"),
        round(col("value") * 100).cast("long").as("cents"),
        (col("event_type") === "purchase").as("isPurchase"))
      .as[PurchaseEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[StreakState, UserStreak](
        OutputMode.Update, GroupStateTimeout.NoTimeout) { (user, it, state) =>
        val sorted = it.toIndexedSeq.sortBy(e => (e.tsMicros, e.event_id))
        var s = state.getOption.getOrElse(StreakState(0L, 0L, 0L, 0L))
        sorted.foreach { e =>
          val cur = if (e.isPurchase) s.cur + 1 else 0L
          s = StreakState(s.cnt + 1, s.sumCents + e.cents, cur, math.max(s.best, cur))
        }
        state.update(s)
        Iterator(UserStreak(user, s.cnt, s.sumCents, s.best))
      }
  }

  /** per-user running totals carried in a ValueState */
  final case class Totals(n: Long, cents: Long)

  /** Spark 4's ARBITRARY-STATE API v2 (`transformWithState`): the
    * successor to flatMapGroupsWithState above — typed state handles
    * (value/list/map states, timers, TTL) resolved in init() instead
    * of one opaque state blob, and a RocksDB-backed state store
    * (required by the operator), which is also the provider that makes
    * very large keyed state viable at scale (spill-to-disk,
    * incremental checkpoint uploads). The processor is the minimal
    * meaningful instance: per-user running totals in a ValueState,
    * emitted per trigger in Update mode. The converged per-user row is
    * the LAST emission — readers select it by argmax on the strictly
    * increasing n counter, which stays correct when cents go negative
    * (refunds make the sum non-monotone; see EventsStreamSpec's refund
    * test).
    */
  final class RunningTotalsProcessor
      extends StatefulProcessor[Long, (Long, Long), (Long, Long, Long)] {
    @transient private var st: ValueState[Totals] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Totals]("totals",
        Encoders.product[Totals], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[(Long, Long)],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[(Long, Long, Long)] = {
      var n = 0L
      var cents = 0L
      rows.foreach { r => n += 1; cents += r._2 }
      val prev = if (st.exists()) st.get() else Totals(0L, 0L)
      val tot = Totals(prev.n + n, prev.cents + cents)
      st.update(tot)
      Iterator((user, tot.n, tot.cents))
    }
  }

  /** per-user lifetime totals via transformWithState (Update mode) */
  def userTotalsTws(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long").as("user_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new RunningTotalsProcessor,
        TimeMode.None(), OutputMode.Update())
      .toDF("user_id", "n_events", "sum_value_cents")
  }

  /** open session interval for the timer-based sessionizer */
  final case class OpenSess(startMicros: Long, lastMicros: Long, n: Long, cents: Long)

  /** SESSION WINDOWS REBUILT FROM RAW EVENT-TIME TIMERS — the one
    * arbitrary-state primitive the rest of the streaming surface never
    * touches. `session_window` (st_sessionize) is the packaged
    * operator; this processor is what you write when session semantics
    * are CUSTOM (revenue-weighted gaps, per-key gap lengths, session
    * caps): a ListState of open intervals, interval-union merging on
    * every input batch (commutative, so out-of-order arrival inside
    * the watermark allowance needs no sort barrier), and ONE
    * registered event-time timer per key at the earliest close time.
    * When the watermark passes it, handleExpiredTimer finalizes EVERY
    * closable session (one firing, n closures), re-arms for the
    * remainder, and emits exactly once per session.
    *
    * Timer discipline: expiry is registered 1 ms EARLY
    * (floor(close/1ms) − 1) and the authoritative closability check —
    * session end ≤ current watermark — runs inside the handler. That
    * makes the operator robust to the engine's (< vs ≤) firing
    * boundary: a too-early firing simply re-arms; a session is only
    * ever emitted by the check the batch oracle states declaratively.
    * State per key is O(open sessions), bounded by the watermark
    * exactly like the packaged operator.
    */
  final class TimerSessionsProcessor
      extends StatefulProcessor[Long, (Long, Long, Long),
        (String, String, Long, Long, Long)] {
    private val GapMicros = 30L * 60 * 1000000L

    @transient private var open
        : org.apache.spark.sql.streaming.ListState[OpenSess] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getListState[OpenSess]("open",
        Encoders.product[OpenSess], TTLConfig.NONE)

    private def fmt(micros: Long): String =
      java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss")
        .withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.ofEpochSecond(
          java.lang.Math.floorDiv(micros, 1000000L)))

    /** interval-union merge: sorted by start, s joins its predecessor
      * iff the gap is strictly under 30 min (an event at exactly
      * last + 30 min starts a NEW session — the session_window rule)
      */
    private def merged(sessions: Seq[OpenSess]): Seq[OpenSess] = {
      val sorted = sessions.sortBy(s => (s.startMicros, s.lastMicros))
      val out = scala.collection.mutable.ArrayBuffer.empty[OpenSess]
      sorted.foreach { s =>
        out.lastOption match {
          case Some(p) if s.startMicros < p.lastMicros + GapMicros =>
            out(out.length - 1) = OpenSess(p.startMicros,
              math.max(p.lastMicros, s.lastMicros), p.n + s.n,
              p.cents + s.cents)
          case _ => out += s
        }
      }
      out.toSeq
    }

    private def reschedule(sessions: Seq[OpenSess]): Unit = {
      // materialize before deleting — no mutation under the iterator
      getHandle.listTimers().toSeq.foreach(getHandle.deleteTimer)
      if (sessions.nonEmpty) {
        val next = sessions
          .map(s => java.lang.Math.floorDiv(s.lastMicros + GapMicros, 1000L) - 1L)
          .min
        getHandle.registerTimer(next)
      }
    }

    override def handleInputRows(user: Long,
        rows: Iterator[(Long, Long, Long)],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[(String, String, Long, Long, Long)] = {
      val incoming = rows.map(r => OpenSess(r._2, r._2, 1L, r._3)).toSeq
      val sessions = merged(open.get().toSeq ++ incoming)
      open.clear()
      open.put(sessions.toArray)
      reschedule(sessions)
      Iterator.empty
    }

    override def handleExpiredTimer(user: Long,
        timerValues: org.apache.spark.sql.streaming.TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[(String, String, Long, Long, Long)] = {
      val wmMicros = timerValues.getCurrentWatermarkInMs() * 1000L
      val sessions = merged(open.get().toSeq)
      val (closed, stillOpen) =
        sessions.partition(s => s.lastMicros + GapMicros <= wmMicros)
      open.clear()
      if (stillOpen.nonEmpty) open.put(stillOpen.toArray)
      reschedule(stillOpen)
      closed.sortBy(_.startMicros).iterator.map(s =>
        (fmt(s.startMicros), fmt(s.lastMicros + GapMicros), user, s.n, s.cents))
    }
  }

  /** per-user sessions finalized by event-time timers (Update mode);
    * converges to the same answer as `sessionsByUser` under the same
    * watermark cutoff — the oracle is shared with st_sessionize
    */
  def timerSessions(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "2 hours")
      .select(col("user_id").cast("long").as("user_id"),
        unix_micros(col("ts")).as("ts_micros"),
        round(col("value") * 100).cast("long").as("cents"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new TimerSessionsProcessor,
        TimeMode.EventTime(), OutputMode.Update())
      .toDF("session_start", "session_end", "user_id", "n_events",
        "sum_value_cents")
  }
}
