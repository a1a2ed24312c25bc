package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The lineage walk on constructed plans with known truth: identity
  * projection, a cross-table expression, a window function (whose
  * value legitimately depends on its partitioning column), and a
  * multi-hop alias chain.
  */
class LineageSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    Lineage.of(spark, df).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

  test("bare projection is identity lineage") {
    val df = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_custkey")
    assert(rows(df) == Set(
      ("o_orderkey", "orders", "o_orderkey"),
      ("o_custkey", "orders", "o_custkey")))
  }

  test("cross-table expression names both sources") {
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val c = spark.read.parquet(s"$dir/customer.parquet")
    val df = o.join(c, col("o_custkey") === col("c_custkey"))
      .select((col("o_totalprice") + col("c_acctbal")).as("mix"))
    assert(rows(df) == Set(
      ("mix", "orders", "o_totalprice"),
      ("mix", "customer", "c_acctbal")))
  }

  test("window output depends on its argument AND partitioning column") {
    val df = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_custkey"),
        sum(col("o_totalprice"))
          .over(Window.partitionBy(col("o_custkey"))).as("w"))
    val r = rows(df)
    assert(r.contains(("w", "orders", "o_totalprice")))
    assert(r.contains(("w", "orders", "o_custkey")),
      "a window value depends on its partitioning")
  }

  private def kinds(df: org.apache.spark.sql.DataFrame) =
    Lineage.ofKinds(spark, df).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3))).toSet

  test("kinded walk: grouping keys are control for aggregated outputs") {
    val df = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity").cast("long")).as("q"))
    assert(kinds(df) == Set(
      ("l_returnflag", "lineitem", "l_returnflag", "value"),
      ("q", "lineitem", "l_quantity", "value"),
      ("q", "lineitem", "l_returnflag", "control")),
      s"got: ${kinds(df)}")
  }

  test("kinded walk: control is sticky through downstream value hops") {
    // rank over a partition, then arithmetic on the rank: the source
    // partition key must still reach the final output as CONTROL
    val df = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_custkey"),
        row_number().over(Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderkey"))).as("rn"))
      .select((col("rn") * 10).as("rn10"))
    val k = kinds(df)
    assert(k.contains(("rn10", "orders", "o_custkey", "control")))
    assert(k.contains(("rn10", "orders", "o_orderkey", "control")))
    assert(!k.exists(r => r._1 == "rn10" && r._4 == "value"),
      s"row_number carries no value edges: $k")
  }

  test("multi-hop alias chains resolve to the leaf") {
    val df = spark.read.parquet(s"$dir/orders.parquet")
      .select((col("o_totalprice") * 2).as("a"))
      .select((col("a") + 1).as("b"))
      .select(col("b").as("c"))
    assert(rows(df) == Set(("c", "orders", "o_totalprice")))
  }
}
