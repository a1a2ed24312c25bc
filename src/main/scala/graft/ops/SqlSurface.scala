package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.GraftFunctions
import graft.polarify.Corpus

/** The SQL front door: a compiled polarify program registered in the
  * session FunctionRegistry and invoked from `spark.sql` text — the
  * analogue of calling the reference's `@polarify`-decorated function
  * (ref polarify/__init__.py:40-53), but from SQL. The registered name
  * expands during analysis into the same codegen'd CaseWhen the
  * DataFrame path plans (no UDF; see [[graft.functions.GraftFunctions]]),
  * so this query's oracle is byte-identical to `pf_signum`'s.
  */
object SqlSurface {

  private val signum = Corpus.all.find(_.name == "signum").get.program

  private val xSql = "(CAST(l_quantity AS BIGINT) - 25)"

  private def signumViaSql(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.registerProgram(spark, "graft_signum", Seq("x"), signum)
    spark.read.parquet(s"$dir/lineitem.parquet")
      .createOrReplaceTempView("graft_sql_lineitem")
    spark.sql(
      s"""SELECT DISTINCT CAST(l_quantity AS BIGINT) - 25 AS x,
         |  CAST(graft_signum(CAST(l_quantity AS BIGINT) - 25) AS BIGINT) AS r
         |FROM graft_sql_lineitem ORDER BY x""".stripMargin)
  }

  private val signumViaSqlOracle = {
    val caseSql = signum.sql(Map("x" -> xSql))
    s"SELECT DISTINCT $xSql AS x, CAST(($caseSql) AS BIGINT) AS r " +
      "FROM lineitem ORDER BY x"
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sq_signum_sql" -> (signumViaSql _))

  val oracleSql: Map[String, String] = Map(
    "sq_signum_sql" -> signumViaSqlOracle)
}
