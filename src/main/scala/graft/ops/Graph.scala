package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over relational data. Connected components already
  * powers dd_dup_clusters (Dedup.connectedComponents); this module adds
  * rank propagation.
  */
object Graph {

  // -------------------------------------------------------------------
  // ax_pagerank_parts: PageRank over the co-purchase graph (parts are
  // nodes, "appeared in the same order" are edges), in EXACT integer
  // arithmetic so three engines' floats can never drift: ranks start at
  // 1e6 and each of 3 unrolled iterations applies
  //   r'(v) = 150000 + (85 · Σ_{u→v} (r(u) div deg(u))) div 100
  // — the standard 0.15/0.85 damping scaled by 1e6, with integer
  // division fixed at each step (both engines truncate non-negative
  // division identically).
  //
  // Scale shape: the edge list and degree table are built once and
  // PERSISTED (every iteration re-reads them; without the persist each
  // iteration would re-run the pair self-join), and each iteration is
  // one join + one partial-agg groupBy on the dst key. The iteration
  // count is fixed (unrolled into the plan) — at a real 100 TB scale
  // you'd checkpoint ranks between iterations to truncate lineage and
  // co-partition edges by src so the per-iteration join never
  // re-shuffles the edge table; 3 iterations on a bounded graph keeps
  // the gate plan compact.
  // -------------------------------------------------------------------
  private def pagerankParts(spark: SparkSession, dir: String): DataFrame = {
    val edges = Stats.orderPartPairs(spark, dir)(_ =!= _)
      .select(col("pa").as("src"), col("pb").as("dst"))
      .distinct()
      .persist()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg")).persist()

    var ranks = deg.select(col("src").as("v"), lit(1000000L).as("r"))
    for (_ <- 1 to 3) {
      // ranks/deg are per-NODE (tiny next to the edge list): broadcast
      // their pre-joined contribution table so the 100×-bigger edge
      // table is never shuffled — each iteration is one map-side join
      // plus one partial-agg shuffle of the already-reduced per-dst sums
      val contrib = ranks.join(deg, ranks("v") === deg("src"))
        .select(col("v"), expr("r div deg").as("c"))
      ranks = edges
        .join(broadcast(contrib), edges("src") === contrib("v"))
        .groupBy("dst")
        .agg((lit(150000L) + expr("(85 * sum(c)) div 100")).as("r"))
        .select(col("dst").as("v"), col("r"))
    }
    val out = ranks
      .select(col("v").as("part"), col("r").as("pr"))
      .orderBy(col("pr").desc, col("part").asc)
      .limit(20)
      .localCheckpoint()
    edges.unpersist()
    deg.unpersist()
    out
  }

  private val pagerankPartsSql =
    """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |edges AS (
      |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      |  FROM li a JOIN li b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
      |deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY 1),
      |r0 AS (SELECT src AS v, CAST(1000000 AS BIGINT) AS r FROM deg),
      |r1 AS (SELECT e.dst AS v, 150000 + (85 * SUM(r0.r // d.deg)) // 100 AS r
      |       FROM edges e JOIN r0 ON e.src = r0.v JOIN deg d ON e.src = d.src
      |       GROUP BY 1),
      |r2 AS (SELECT e.dst AS v, 150000 + (85 * SUM(r1.r // d.deg)) // 100 AS r
      |       FROM edges e JOIN r1 ON e.src = r1.v JOIN deg d ON e.src = d.src
      |       GROUP BY 1),
      |r3 AS (SELECT e.dst AS v, 150000 + (85 * SUM(r2.r // d.deg)) // 100 AS r
      |       FROM edges e JOIN r2 ON e.src = r2.v JOIN deg d ON e.src = d.src
      |       GROUP BY 1)
      |SELECT v AS part, CAST(r AS BIGINT) AS pr FROM r3
      |ORDER BY pr DESC, part ASC LIMIT 20""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ax_pagerank_parts" -> (pagerankParts _))

  val oracleSql: Map[String, String] = Map(
    "ax_pagerank_parts" -> pagerankPartsSql)
}
