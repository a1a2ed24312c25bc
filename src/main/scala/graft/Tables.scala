package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table access helpers.
  *
  * The driver's `events` table carries parquet `TIMESTAMP(NANOS)`, which
  * Spark 4 refuses natively; sessions must set
  * `spark.sql.legacy.parquet.nanosAsLong=true` (see [[Sessions.configure]])
  * which surfaces `ts` as nanos-since-epoch LongType. [[Tables.events]]
  * normalizes it back to a proper TimestampType column (microsecond
  * truncation — the driver data is second-granular).
  */
object Tables {

  /** events with `ts` as a real TimestampType column */
  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeEventsTs(spark.read.parquet(s"$dir/events.parquet"))

  def normalizeEventsTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // exact integer division: `/` is double division and epoch-nanos
        // (~1.7e18) exceed double's 2^53 exact range — a boundary event
        // could land 1µs low and bucket into the previous window
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => df // already a timestamp (e.g. rewritten fixtures)
    }
}

object Sessions {
  /** configs every graft session needs (test, Verify, Bench) */
  def configure(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
}
