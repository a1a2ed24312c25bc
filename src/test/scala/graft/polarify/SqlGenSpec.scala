package graft.polarify

import graft.SparkTestSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The SQL backend must agree with the Column backend for every corpus
  * program. We execute the generated SQL through Spark's own SQL parser
  * (ANSI `CASE WHEN` — the same dialect subset DuckDB runs for the
  * driver's oracle) and diff against the Column result over the full
  * domain.
  */
class SqlGenSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private lazy val domainView = {
    import spark.implicits._
    val df = (-100L to 100L).toDF("x")
    df.createOrReplaceTempView("sqlgen_domain")
    df
  }

  Corpus.all.foreach { c =>
    test(c.name) {
      val df = domainView
      val sqlText = c.program.sql(Map("x" -> "x"))
      val viaSql = spark
        .sql(s"SELECT x, CAST(($sqlText) AS BIGINT) AS r FROM sqlgen_domain")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val viaColumn = df
        .select(col("x"), c.program.column(Map("x" -> col("x"))).cast("long").as("r"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaSql === viaColumn)
    }
  }
}
