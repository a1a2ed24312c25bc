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
}
