package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.polarify.Corpus

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Parity queries: one per reference corpus function (SURVEY.md §2c).
  * Each binds the compiled when-chain to `x := CAST(l_quantity AS BIGINT)
  * - 25` over `lineitem` (values straddle every branch boundary of the
  * corpus, matching the reference fixture's [-100,100] spirit,
  * ref tests/test_parse_body.py:38-43) and dumps the complete extensional
  * mapping `SELECT DISTINCT x, result ORDER BY x` — deterministic, tiny,
  * and a full conformance check of the compiled expression.
  *
  * The DuckDB oracle SQL is generated from the SAME compiled AST by
  * [[graft.polarify.SqlGen]], so Spark and oracle can never drift.
  *
  * Scale note: every parity query is scan → project → partial/final
  * hash-distinct on ≤201 groups → negligible shuffle; plans are
  * whole-stage codegen'd with no UDFs.
  */
object SparkEntry {

  private def lineitem(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lineitem.parquet")

  /** x binding, Spark side: integer-valued quantity recentered around 0. */
  private val xCol = col("l_quantity").cast("long") - lit(25L)
  /** x binding, oracle side (DuckDB reads the same parquet). */
  private val xSql = "(CAST(l_quantity AS BIGINT) - 25)"

  private def parityQuery(c: Corpus.Case): (SparkSession, String) => DataFrame =
    (spark, dir) =>
      lineitem(spark, dir)
        .select(
          xCol.as("x"),
          c.program.column(Map("x" -> xCol)).cast("long").as("r"))
        .distinct()
        .orderBy("x")

  private def parityOracle(c: Corpus.Case): String = {
    val caseSql = c.program.sql(Map("x" -> xSql))
    s"SELECT DISTINCT $xSql AS x, CAST(($caseSql) AS BIGINT) AS r " +
      s"FROM lineitem ORDER BY x"
  }

  private val parity: Map[String, (SparkSession, String) => DataFrame] =
    Corpus.all.map(c => s"pf_${c.name}" -> parityQuery(c)).toMap
  private val parityOracles: Map[String, String] =
    Corpus.all.map(c => s"pf_${c.name}" -> parityOracle(c)).toMap

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    parity("pf_signum")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    parity ++ ops.Extensions.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    parityOracles ++ ops.Extensions.oracleSql
}
