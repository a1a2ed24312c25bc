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

  test("multi-hop alias chains resolve to the leaf") {
    val df = spark.read.parquet(s"$dir/orders.parquet")
      .select((col("o_totalprice") * 2).as("a"))
      .select((col("a") + 1).as("b"))
      .select(col("b").as("c"))
    assert(rows(df) == Set(("c", "orders", "o_totalprice")))
  }
}
