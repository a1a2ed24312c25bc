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
