package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming correctness: the streaming plans over the real events
  * table (file source, one file per trigger) must converge to the batch
  * answer — the replayability property that makes the batch/streaming
  * split safe at scale.
  */
class EventsStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("streaming hourly agg converges to the batch result") {
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)

    val q = EventsStream.hourlyByType(graft.Tables.normalizeEventsTs(stream))
      .writeStream
      .format("memory")
      .queryName("hourly_test")
      .outputMode("complete")
      .start()
    try q.processAllAvailable()
    finally q.stop()

    val streamed = spark.table("hourly_test")
      .orderBy("hour", "event_type")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))

    val batch = graft.Tables.events(spark, dir)
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("value") * 100).cast("long")).as("sum_value_cents"))
      .orderBy("hour", "event_type")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))

    assert(streamed.nonEmpty)
    assert(streamed.toSeq === batch.toSeq)
  }

  test("streaming sessionization emits closed sessions once the watermark passes") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    def ts(minute: Int): Timestamp = new Timestamp(minute * 60000L)

    // user 1: two sessions (gap 40 min >= 30); user 2: one session
    val data = Seq(
      (1L, ts(0), 1.0), (1L, ts(10), 2.0), // session A: [0, 10+30)
      (1L, ts(50), 3.0),                   // session B: [50, 50+30)
      (2L, ts(5), 4.0))
    val sentinel = (99L, ts(10000), 0.0) // advances watermark past all sessions

    val mem = MemoryStream[(Long, Timestamp, Double)]
    val events = mem.toDF().toDF("user_id", "ts", "value")

    val q = EventsStream.sessionsByUser(events)
      .writeStream.format("memory").queryName("sessions_test")
      .outputMode("append").start()
    try {
      mem.addData(data: _*)
      q.processAllAvailable()
      mem.addData(sentinel)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("sessions_test")
      .filter(col("user_id") =!= 99L)
      .orderBy("user_id", "session_start")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))

    val batch = EventsStream.sessionsByUser(
        spark.createDataset(data).toDF("user_id", "ts", "value"))
      .orderBy("user_id", "session_start")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))

    assert(got.length === 3) // two sessions for user 1, one for user 2
    assert(got.toSeq === batch.toSeq)
  }

  test("append-mode windows drop events that arrive behind the watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    def ts(minute: Int): Timestamp = new Timestamp(minute * 60000L)

    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")

    val q = EventsStream.hourlyByType(events)
      .writeStream.format("memory").queryName("late_drop_test")
      .outputMode("append").start()
    try {
      // two on-time events in hour 0
      mem.addData((ts(5), "click", 1.0), (ts(7), "click", 1.0))
      q.processAllAvailable()
      // sentinel far in the future: watermark passes hour 0's end,
      // finalizing and emitting its window
      mem.addData((ts(10000), "view", 0.0))
      q.processAllAvailable()
      // a LATE click back in hour 0 — behind the watermark, must drop
      mem.addData((ts(6), "click", 1.0))
      q.processAllAvailable()
    } finally q.stop()

    val hour0 = spark.table("late_drop_test")
      .filter(col("hour") === "1970-01-01 00:00:00" &&
        col("event_type") === "click")
      .collect()
    assert(hour0.length === 1, "finalized window must be emitted exactly once")
    assert(hour0(0).getLong(2) === 2L,
      "late event must not be counted into the finalized window")
  }

  test("file sink restarted from its checkpoint stays exactly-once") {
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("graft_restart").toString
    val (src, sink, chk) = (s"$root/src", s"$root/sink", s"$root/chk")

    val ev = graft.Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("event_type"))
    val schema = ev.schema
    // the stream must be split in EVENT-TIME order: the checkpoint
    // carries the watermark across the restart, so a second file of
    // older events would (correctly) be dropped as late — a real
    // restart resumes with newer data
    val cut = "2024-01-16"
    ev.filter(col("ts") < cut)
      .coalesce(1).write.mode("overwrite").parquet(src)

    def runOnce(): Unit = {
      val q = EventsStream.dedupEvents(
          spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(src))
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", chk)
        .outputMode("append").start()
      try q.processAllAvailable()
      finally q.stop()
    }
    runOnce()
    // ...the query dies; more data lands; a NEW query resumes from the
    // same checkpoint and must process only the new file
    ev.filter(col("ts") >= cut)
      .coalesce(1).write.mode("append").parquet(src)
    runOnce()

    val out = spark.read.parquet(sink)
    val total = ev.count()
    assert(out.count() == total, "restart must neither drop nor replay rows")
    assert(out.select("event_id").distinct().count() == total,
      "no event may be emitted twice across the restart")
  }

  test("purchase streaks: multi-trigger streaming state converges to the batch pass") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    def row(id: Long, m: Int, user: Long, typ: String, v: Double) =
      (id, new Timestamp(m * 60000L), user, typ, v, "{}")

    // user 1: P P v P P P (best streak 3, split across two triggers:
    // P P | v P P P — state must carry cur=2 into the next trigger and
    // correctly reset on the view); user 2: v v (best 0)
    val batch1 = Seq(
      row(1, 0, 1, "purchase", 1.0), row(2, 1, 1, "purchase", 1.0),
      row(10, 0, 2, "view", 2.0))
    val batch2 = Seq(
      row(3, 2, 1, "view", 1.0), row(4, 3, 1, "purchase", 1.0),
      row(5, 4, 1, "purchase", 1.0), row(6, 5, 1, "purchase", 1.0),
      row(11, 1, 2, "view", 2.0))

    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val events = mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")

    val q = EventsStream.purchaseStreaks(events)
      .writeStream.format("memory").queryName("streaks_test")
      .outputMode("update").start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()

    val finalRows = spark.table("streaks_test")
      .groupBy("user_id")
      .agg(max("n_events").as("n"), max("sum_value_cents").as("s"),
        max("best_purchase_streak").as("b"))
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    assert(finalRows.toSeq === Seq((1L, 6L, 600L, 3L), (2L, 2L, 400L, 0L)))

    // batch path of the same operator agrees
    val batchRows = EventsStream.purchaseStreaks(
        spark.createDataset(batch1 ++ batch2)
          .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .orderBy("user_id")
      .collect().map(u => (u.user_id, u.n_events, u.sum_value_cents, u.best_purchase_streak))
    assert(batchRows.toSeq === finalRows.toSeq)
  }

  test("append mode emits a window whose end is EXACTLY at the watermark") {
    // Pins the boundary the st_file_sink / st_events_hourly oracles
    // assume: the batch cutoff is `window_end <= max_ts - 2h`, i.e. a
    // window whose end lands exactly ON the watermark counts as
    // finalized. If Spark finalized only on watermark STRICTLY past the
    // end, a fixture whose max event time sits on an hour boundary
    // would diverge — this test fails loudly instead.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    def ts(minute: Int): Timestamp = new Timestamp(minute * 60000L)

    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")

    val q = EventsStream.hourlyByType(events)
      .writeStream.format("memory").queryName("boundary_test")
      .outputMode("append").start()
    try {
      // hour-0 window [00:00, 01:00) ...
      mem.addData((ts(5), "click", 1.0))
      q.processAllAvailable()
      // ... then max event time EXACTLY 03:00:00 → watermark = 01:00:00
      // == hour-0 window end (2h delay)
      mem.addData((ts(180), "view", 0.0))
      q.processAllAvailable()
    } finally q.stop()

    val hour0 = spark.table("boundary_test")
      .filter(col("hour") === "1970-01-01 00:00:00")
      .collect()
    assert(hour0.length === 1,
      "a window ending exactly at the watermark must be finalized " +
        "(the batch oracles' `window_end <= max_ts - delay` cutoff)")
  }

  test("append mode emits a session whose end is EXACTLY at the watermark") {
    // Same boundary pin for st_sessionize: session end = last event +
    // 30min gap; with max ts exactly 2h30m after the last session event
    // the watermark equals the session end, and the oracle's `<=`
    // cutoff expects it finalized.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    def ts(minute: Int): Timestamp = new Timestamp(minute * 60000L)

    val mem = MemoryStream[(Long, Timestamp, Double)]
    val events = mem.toDF().toDF("user_id", "ts", "value")

    val q = EventsStream.sessionsByUser(events)
      .writeStream.format("memory").queryName("session_boundary_test")
      .outputMode("append").start()
    try {
      // user 1 session: [0, 10+30) → end 00:40
      mem.addData((1L, ts(0), 1.0), (1L, ts(10), 2.0))
      q.processAllAvailable()
      // watermark = 160 - 120 = 40 == session end exactly
      mem.addData((99L, ts(160), 0.0))
      q.processAllAvailable()
    } finally q.stop()

    val sessions = spark.table("session_boundary_test")
      .filter(col("user_id") === 1L)
      .collect()
    assert(sessions.length === 1,
      "a session ending exactly at the watermark must be finalized " +
        "(the st_sessionize oracle's `session_end <= max_ts - delay` cutoff)")
  }

  test("left-outer null rows respect the watermark boundary (strict <)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    def ts(minute: Int): Timestamp = new Timestamp(minute * 60000L)

    val pMem = MemoryStream[(Long, Timestamp, Long)] // user, ts, event_id
    val vMem = MemoryStream[(Long, Timestamp, Long)]
    val purchases = pMem.toDF().toDF("user_id", "ts", "event_id")
    val views = vMem.toDF().toDF("user_id", "ts", "event_id")

    val q = EventsStream.purchaseViewJoin(purchases, views, "left_outer")
      .writeStream.format("memory").queryName("outer_join_test")
      .outputMode("append").start()
    try {
      // user 1: matched pair; users 10/11: unmatched purchases that
      // straddle the final watermark boundary
      vMem.addData((1L, ts(50), 500L))
      pMem.addData((1L, ts(100), 100L))
      q.processAllAvailable()
      // sentinels push both sides' max event time to ts(10000); the
      // global watermark lands at ts(10000) - 2h = ts(9880)
      pMem.addData((10L, ts(9880), 110L)) // AT the boundary
      pMem.addData((11L, ts(9879), 111L)) // strictly below it
      pMem.addData((98L, ts(10000), 198L))
      vMem.addData((99L, ts(10000), 599L))
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.table("outer_join_test")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet
    assert(rows.contains((100L, Some(500L))), "matched pair must emit")
    assert(rows.contains((111L, None)),
      "unmatched purchase strictly below the watermark must emit null-padded")
    assert(!rows.contains((110L, None)) && !rows.exists(_._1 == 110L),
      "a purchase AT the watermark is still in state — the st_outer_join " +
        "oracle's strict `p_ts < wm` cutoff depends on this")
    assert(!rows.exists(_._1 == 198L), "the sentinel purchase stays in state")
  }

  test("full-outer emits BOTH sides' null rows on their own eviction schedules") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    def ts(minute: Int): Timestamp = new Timestamp(minute * 60000L)

    val pMem = MemoryStream[(Long, Timestamp, Long)]
    val vMem = MemoryStream[(Long, Timestamp, Long)]
    val q = EventsStream.purchaseViewJoin(
        pMem.toDF().toDF("user_id", "ts", "event_id"),
        vMem.toDF().toDF("user_id", "ts", "event_id"), "full_outer")
      .writeStream.format("memory").queryName("full_outer_test")
      .outputMode("append").start()
    try {
      // matched pair (user 1); unmatched purchases straddling the
      // purchase eviction boundary wm (= ts(9880)); unmatched views
      // straddling the VIEW eviction boundary wm - 1h (= ts(9820))
      vMem.addData((1L, ts(50), 500L))
      pMem.addData((1L, ts(100), 100L))
      q.processAllAvailable()
      pMem.addData((10L, ts(9880), 110L)) // AT the purchase boundary
      pMem.addData((11L, ts(9879), 111L)) // below it
      vMem.addData((20L, ts(9820), 520L)) // AT the view boundary (v_ts+1h = wm)
      vMem.addData((21L, ts(9819), 521L)) // below it
      pMem.addData((98L, ts(10000), 198L))
      vMem.addData((99L, ts(10000), 599L))
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.table("full_outer_test")
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)))).toSet
    assert(rows.contains((Some(100L), Some(500L))), "matched pair must emit")
    assert(rows.contains((Some(111L), None)),
      "unmatched purchase strictly below wm emits null-padded")
    assert(!rows.exists(_._1 == Some(110L)),
      "a purchase AT wm is still in state")
    assert(rows.contains((None, Some(521L))),
      "unmatched view with v_ts + 1h strictly below wm emits null-padded")
    assert(!rows.exists(_._2 == Some(520L)),
      "a view whose window ends AT wm is still in state — the " +
        "st_full_outer oracle's strict `v_ts + 1h < wm` cutoff depends on this")
  }

  test("foreachBatch merge sink accumulates across triggers") {
    val root = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    val ev = graft.Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("value"))
    val schema = ev.schema
    // two files in event-time order → two triggers → the second
    // version must merge the first (users only in file 1 must survive)
    val cut = "2024-01-16"
    ev.filter(col("ts") < cut).coalesce(1)
      .write.mode("overwrite").parquet(s"$root/f1")
    ev.filter(col("ts") >= cut).coalesce(1)
      .write.mode("append").parquet(s"$root/f1")

    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$root/f1")
    val got = graft.ops.StreamingGate
      .upsertMergeRun(spark, stream, "spec_multibatch")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted

    val want = ev.groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted

    assert(got.length === want.length)
    assert(got.toSeq === want.toSeq)
  }

  test("Trigger.AvailableNow drains the source and stops on its own") {
    // the production batch-drain trigger: process everything available
    // at start, then terminate — no processAllAvailable babysitting, and
    // unlike Trigger.Once it still honors maxFilesPerTrigger batching
    import org.apache.spark.sql.streaming.Trigger
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val q = EventsStream.dedupEvents(graft.Tables.normalizeEventsTs(stream))
      .writeStream.format("memory").queryName("availablenow_test")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "AvailableNow must self-terminate")
    val n = spark.table("availablenow_test").count()
    val expected = graft.Tables.events(spark, dir)
      .select("event_id").distinct().count()
    assert(n === expected)
  }

  test("streaming dedup emits each event_id once") {
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)

    val q = EventsStream.dedupEvents(graft.Tables.normalizeEventsTs(stream))
      .writeStream
      .format("memory")
      .queryName("dedup_test")
      .outputMode("append")
      .start()
    try q.processAllAvailable()
    finally q.stop()

    val n = spark.table("dedup_test").count()
    val expected = graft.Tables.events(spark, dir)
      .select("event_id").distinct().count()
    assert(n === expected)
  }

  test("transformWithState carries ValueState across triggers (RocksDB store)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, Double)]
      val events = mem.toDF().toDF("user_id", "value")
      val q = EventsStream.userTotalsTws(events)
        .writeStream.format("memory").queryName("tws_test")
        .outputMode("update").start()
      try {
        mem.addData((1L, 1.0), (1L, 2.0), (2L, 5.0)) // trigger 1
        q.processAllAvailable()
        mem.addData((1L, 3.0))                       // trigger 2
        q.processAllAvailable()
      } finally q.stop()

      // trigger 2's row for user 1 must CONTINUE from trigger 1's state
      val rows = spark.table("tws_test")
        .groupBy("user_id")
        .agg(org.apache.spark.sql.functions.max("n_events").as("n"),
          org.apache.spark.sql.functions.max("sum_value_cents").as("c"))
        .orderBy("user_id")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(rows.toSeq === Seq((1L, 3L, 600L), (2L, 1L, 500L)))
      // and the sink holds the intermediate emission too (update mode)
      val user1Emissions = spark.table("tws_test")
        .filter(col("user_id") === 1L).count()
      assert(user1Emissions === 2L)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("update-mode readout survives refunds: argmax-by-count beats max-by-value") {
    // the round-4 advisory scenario: with NEGATIVE values (refunds) the
    // per-user running sum is NOT monotone across emissions, so a
    // max() readout over the value column silently reports a stale
    // intermediate sum. The gate readout takes the max-n_events row
    // (the true last emission — n_events strictly increases with every
    // batch that touches the user). This test constructs the exact
    // divergence: the naive readout must be WRONG here, the argmax
    // readout right.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, Double)]
      val events = mem.toDF().toDF("user_id", "value")
      val q = EventsStream.userTotalsTws(events)
        .writeStream.format("memory").queryName("tws_refund_test")
        .outputMode("update").start()
      try {
        mem.addData((1L, 5.0))  // trigger 1: emission (n=1, 500)
        q.processAllAvailable()
        mem.addData((1L, -3.0)) // trigger 2 refund: emission (n=2, 200)
        q.processAllAvailable()
      } finally q.stop()

      val sink = spark.table("tws_refund_test").filter(col("user_id") === 1L)
      // the gate readout: last emission by argmax on n_events
      val last = sink
        .groupBy("user_id")
        .agg(max(struct(col("n_events"), col("sum_value_cents"))).as("m"))
        .select(col("m.n_events"), col("m.sum_value_cents"))
        .head()
      assert((last.getLong(0), last.getLong(1)) === ((2L, 200L)),
        "argmax readout must return the converged (post-refund) total")
      // the naive readout is provably wrong on this stream
      val naive = sink.agg(max(col("sum_value_cents"))).head().getLong(0)
      assert(naive === 500L,
        "precondition: max-by-value reports the stale pre-refund sum " +
          "(if this starts failing the scenario no longer exercises the bug)")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("streaming value histogram accumulates across triggers and resolves p50/p99") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val t0 = new Timestamp(0L)
    val mem = MemoryStream[(Timestamp, Double)]
    val events = mem.toDF().toDF("ts", "value")
    val q = EventsStream.hourlyValueHist(events)
      .writeStream.format("memory").queryName("vhist_test")
      .outputMode("complete").start()
    try {
      // one hour's distribution fed across THREE triggers: 100 values
      // in bucket 0 ($1.00) and 2 outliers in bucket 27 ($550.00) —
      // the histogram must accumulate cross-trigger, not reset
      mem.addData(Seq.fill(50)((t0, 1.0)): _*)
      q.processAllAvailable()
      mem.addData(Seq.fill(50)((t0, 1.0)) :+ ((t0, 550.0)): _*)
      q.processAllAvailable()
      mem.addData((t0, 550.0))
      q.processAllAvailable()
    } finally q.stop()

    val sink = spark.table("vhist_test")
    assert(sink.select("hour").distinct().count() === 1L)
    val hist = sink.select("bucket", "n").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hist === Set((0L, 100L), (27L, 2L)),
      "per-bucket counts must converge to the whole-stream histogram")
    // the gate readout on this histogram: with 102 events, bucket 0
    // holds the median (cum 100·2 ≥ 102) but NOT the p99 (cum 100·100 =
    // 10000 < 99·102 = 10098) — the two outliers move p99 to bucket 27
    val sorted = hist.toSeq.sortBy(_._1)
    val tot = sorted.map(_._2).sum
    def q99(mult: Long, frac: Long): Long = {
      var cum = 0L
      sorted.collectFirst {
        case (b, n) if { cum += n; cum * mult >= tot * frac } => b
      }.get
    }
    assert(q99(2, 1) === 0L, "p50 bucket")
    assert(q99(100, 99) === 27L, "p99 bucket")
  }
}
