package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pipeline observability: `Dataset.observe` attaches named aggregate
  * metrics that are collected DURING the action — row counts and
  * checksums land on the driver as listener events with no second scan.
  * At 100 TB this is how a pipeline reports "rows in / rows out /
  * nulls seen" per stage without doubling its I/O (a separate
  * `.count()` re-reads the table). The metrics must match what a
  * dedicated aggregation computes.
  */
class ObservabilitySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("observe() collects row count and checksum during the main action") {
    val obs = Observation("ingest_metrics")
    val events = graft.Tables.events(spark, dir)
      .observe(obs,
        count(lit(1)).as("rows_in"),
        sum(round(col("value") * 100).cast("long")).as("cents_sum"),
        sum(when(col("user_id").isNull, 1L).otherwise(0L)).as("null_users"))

    // the observed frame feeds a real downstream aggregate — one scan
    val out = events.groupBy("event_type").agg(count(lit(1)).as("n")).collect()
    assert(out.nonEmpty)

    val m = obs.get
    val expect = graft.Tables.events(spark, dir)
      .agg(count(lit(1)), sum(round(col("value") * 100).cast("long")))
      .collect()(0)
    assert(m("rows_in") === expect.getLong(0))
    assert(m("cents_sum") === expect.getLong(1))
    assert(m("null_users") === 0L)
  }

  test("observed metrics see pre-filter rows, downstream sees post-filter") {
    val obs = Observation("filter_metrics")
    val df = spark.read.parquet(s"$dir/orders.parquet")
      .observe(obs, count(lit(1)).as("scanned"))
      .filter(col("o_orderpriority") === "1-URGENT")
    val kept = df.count()
    val scanned = obs.get("scanned").asInstanceOf[Long]
    assert(scanned > kept, "observe above the filter must count all scanned rows")
    assert(kept ===
      spark.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT").count())
  }
}
