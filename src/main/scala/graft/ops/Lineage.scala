package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.execution.datasources.{
  HadoopFsRelation, LogicalRelation}

/** Column-level lineage extraction — the governance answer to "which
  * source columns can influence this output column's VALUE", derived
  * mechanically from the analyzed plan (SURVEY.md §2b governance tier;
  * for a training-data pipeline this is the provenance record a
  * dataset card cites).
  *
  * The walk is exact for value flow: every derived column in a Spark
  * plan is an `Alias` whose child's attribute references name its
  * inputs, bare columns pass through plans with a stable expression id,
  * and leaves are parquet relations (table = file basename). Predicate
  * / join-key influence is deliberately NOT counted (standard
  * value-flow lineage semantics); through set operations the left
  * branch's ids win (Spark reuses them as the output ids). The result
  * is plan-derived and therefore identical at every SF — the oracle
  * pins the hand-derived truth for a representative star-join query.
  */
object Lineage {

  /** (out_column, src_table, src_column) rows for a DataFrame. */
  def of(spark: SparkSession, df: DataFrame): DataFrame = {
    val plan = df.queryExecution.analyzed
    val leaf = scala.collection.mutable.Map[Long, (String, String)]()
    val alias = scala.collection.mutable.Map[Long, Seq[Long]]()
    plan.foreach {
      case l: LogicalRelation =>
        val table = l.relation match {
          case fs: HadoopFsRelation =>
            fs.location.rootPaths.headOption
              .map(_.getName.stripSuffix(".parquet")).getOrElse("?")
          case _ => "?"
        }
        l.output.foreach(a => leaf(a.exprId.id) = (table, a.name))
      case p =>
        p.expressions.foreach(_.foreach {
          case al: Alias =>
            alias(al.exprId.id) =
              al.child.references.toSeq.map(_.exprId.id)
          case _ =>
        })
    }
    def resolve(id: Long, seen: Set[Long]): Seq[(String, String)] =
      if (seen(id)) Nil
      else leaf.get(id) match {
        case Some(src) => Seq(src)
        case None => alias.get(id)
          .map(_.flatMap(resolve(_, seen + id))).getOrElse(Nil)
      }
    val rows = plan.output.flatMap { a =>
      resolve(a.exprId.id, Set.empty).distinct
        .map { case (t, c) => (a.name, t, c) }
    }.distinct.sortBy(r => (r._1, r._2, r._3))
    import spark.implicits._
    rows.toDF("out_column", "src_table", "src_column")
      .orderBy("out_column", "src_table", "src_column")
  }

  // -------------------------------------------------------------------
  // ax_lineage: the lineage of the shipping-priority star join — three
  // output columns tracing through a group-by, a date_format alias,
  // two broadcast joins and three scans back to exactly four source
  // columns. The oracle is the hand-derived truth; a walk bug (lost
  // alias hop, wrong leaf table, phantom predicate column) lands as a
  // row diff.
  // -------------------------------------------------------------------
  private def lineage(spark: SparkSession, dir: String): DataFrame =
    of(spark, Extensions.queries("ax_ship_priority")(spark, dir))

  private val lineageSql =
    """SELECT * FROM (VALUES
      |  ('o_orderdate',   'orders',   'o_orderdate'),
      |  ('o_orderkey',    'orders',   'o_orderkey'),
      |  ('revenue_cents', 'lineitem', 'l_discount'),
      |  ('revenue_cents', 'lineitem', 'l_extendedprice'))
      |  AS t(out_column, src_table, src_column)
      |ORDER BY 1, 2, 3""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ax_lineage" -> (lineage _)
  )

  val oracleSql: Map[String, String] = Map(
    "ax_lineage" -> lineageSql
  )
}
