package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry of the extension operators beyond reference parity (SURVEY.md
  * §2b + the north star's LLM-data-pipeline set): analytics (joins, aggs,
  * windows, sorts, set ops), dedup family, similarity search, text
  * analysis, multimodal plumbing. Populated module by module; each module
  * contributes `queries` (Spark) and, where SQL-expressible, `oracleSql`
  * (DuckDB).
  */
object Extensions {
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Analytics.queries ++ Dedup.queries ++ TextAnalysis.queries ++
      Similarity.queries ++ GraphAnn.queries ++
      Multimodal.queries ++ StreamingGate.queries ++
      AsOf.queries ++ SqlSurface.queries ++ Bucketing.queries ++
      EventsOps.queries ++ Cohorts.queries ++ DataQuality.queries ++
      Reshape.queries ++ Stats.queries ++ Graph.queries ++
      Chunking.queries ++ Maintenance.queries ++ Curation.queries ++
      ScanPruning.queries ++ Lifecycle.queries ++ Selection.queries ++
      TpchShapes.queries ++ TpchShapes2.queries ++ MatViews.queries ++
      Dsv2Source.queries ++ Lineage.queries ++
      Association.queries ++ Governance.queries ++
      DriftAudit.queries ++ TemporalStats.queries ++ Concentration.queries ++
      BitmapIndex.queries
  def oracleSql: Map[String, String] =
    Analytics.oracleSql ++ Dedup.oracleSql ++ TextAnalysis.oracleSql ++
      Similarity.oracleSql ++ GraphAnn.oracleSql ++
      Multimodal.oracleSql ++ StreamingGate.oracleSql ++
      AsOf.oracleSql ++ SqlSurface.oracleSql ++ Bucketing.oracleSql ++
      EventsOps.oracleSql ++ Cohorts.oracleSql ++ DataQuality.oracleSql ++
      Reshape.oracleSql ++ Stats.oracleSql ++ Graph.oracleSql ++
      Chunking.oracleSql ++ Maintenance.oracleSql ++ Curation.oracleSql ++
      ScanPruning.oracleSql ++ Lifecycle.oracleSql ++ Selection.oracleSql ++
      TpchShapes.oracleSql ++ TpchShapes2.oracleSql ++ MatViews.oracleSql ++
      Dsv2Source.oracleSql ++ Lineage.oracleSql ++
      Association.oracleSql ++ Governance.oracleSql ++
      DriftAudit.oracleSql ++ TemporalStats.oracleSql ++
      Concentration.oracleSql ++ BitmapIndex.oracleSql
}
