package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LLM training-data preparation: context-window chunking and
  * token-budget packing — the two reshape steps between "clean
  * documents" and "model-ready sequences".
  */
object Chunking {

  /** chunk width / stride (overlap = width − stride) in characters */
  private val Width = 200
  private val Stride = 160

  // -------------------------------------------------------------------
  // tx_chunk_stats: overlapping fixed-window chunking — each document
  // yields substring windows starting at 1, 1+stride, 1+2·stride, …
  // (40-char overlap preserves context across chunk boundaries). The
  // chunk starts are generated INSIDE the row (`sequence`) and
  // exploded to (doc, chunk) rows — generation is map-side, the only
  // shuffle is the per-doc reduction, and per-chunk work downstream
  // (embedding, hashing) would parallelize over rows, which is why
  // this explodes rather than keeping an array column.
  // -------------------------------------------------------------------
  private def chunkStats(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      // empty docs yield no chunks on BOTH engines: DuckDB's
      // range(1,1) is empty, but Spark's sequence(1,0) THROWS
      // (illegal boundaries) — filter before generating starts
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1), length(col("text")), lit(Stride))).as("s"))
      .select(col("doc_id"),
        length(expr(s"substring(text, s, $Width)")).as("clen"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("clen")).as("chunk_chars"),
        min(col("clen")).as("tail_len"))
      .orderBy("doc_id")

  private val chunkStatsSql =
    s"""SELECT doc_id, COUNT(*) AS n_chunks,
       |  CAST(SUM(length(substring(text, s, $Width))) AS BIGINT) AS chunk_chars,
       |  CAST(MIN(length(substring(text, s, $Width))) AS BIGINT) AS tail_len
       |FROM (SELECT doc_id, text,
       |        unnest(range(1, length(text) + 1, $Stride)) AS s
       |      FROM documents WHERE length(text) > 0) t
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // tx_pack_bins: greedy sequence packing — documents are laid into
  // fixed 512-token bins in stable doc_id order, each doc assigned to
  // bin floor(prefix_tokens / 512). Packing is keyed BY LANGUAGE so
  // the running prefix sum is a per-key window, not a global
  // single-partition sort — the standard scale trick: shard first
  // (here: lang; in production: lang × shard-hash), pack within
  // shards. Token counts are the whitespace-token definition shared
  // with tx_stats.
  // -------------------------------------------------------------------
  private def packBins(spark: SparkSession, dir: String): DataFrame = {
    // token definition shared with tx_stats — literally the same
    // Column builders (TextAnalysis.normCol/tokensCol), not a copy
    val toks = TextAnalysis.tokensCol(TextAnalysis.normCol)
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("lang"), col("doc_id"), toks.as("toks"))
      .withColumn("prefix", coalesce(sum(col("toks")).over(w), lit(0L)))
      .withColumn("bin", expr("prefix div 512"))
      .groupBy("lang", "bin")
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("bin_tokens"))
      .orderBy("lang", "bin")
  }

  private val packBinsSql =
    s"""WITH d AS (
      |  SELECT lang, doc_id, ${TextAnalysis.tokensSql} AS toks
      |  FROM (SELECT lang, doc_id, ${TextAnalysis.normSqlDef} AS norm
      |        FROM documents) n),
      |p AS (
      |  SELECT lang, doc_id, toks,
      |    COALESCE(SUM(toks) OVER (PARTITION BY lang ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 512
      |      AS bin
      |  FROM d)
      |SELECT lang, CAST(bin AS BIGINT) AS bin, COUNT(*) AS n_docs,
      |  CAST(SUM(toks) AS BIGINT) AS bin_tokens
      |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tx_chunk_stats" -> (chunkStats _),
    "tx_pack_bins"   -> (packBins _))

  val oracleSql: Map[String, String] = Map(
    "tx_chunk_stats" -> chunkStatsSql,
    "tx_pack_bins"   -> packBinsSql)
}
