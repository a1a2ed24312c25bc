package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the embeddings table (`Array[Float]`, dim 64).
  *
  * Three tiers, in increasing scale-readiness:
  *   1. brute-force top-k — the exactness baseline: one scan, per-row
  *      dot product via `zip_with`/`aggregate` HOFs (codegen'd), top-k
  *      via TakeOrderedAndProject. O(n·d), no shuffle of vectors.
  *   2. quantized top-k — same plan but integer micro-unit arithmetic →
  *      bit-exact across engines (this one is oracle-backed in DuckDB).
  *   3. LSH-bucketed ANN — random-hyperplane signatures, candidate
  *      search restricted to the query's bucket (± probing): the 100 TB
  *      path where scanning all vectors per query is off the table.
  *      The bucketed layout is what you'd persist, partitioned by
  *      bucket, so a query touches one partition.
  *
  * Query vector = vec_id 0 (deterministic; the driver data is seeded).
  */
object Similarity {

  private def emb(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  /** integer micro-quantization: exact, portable arithmetic */
  private val quantize = "transform(embedding, v -> CAST(round(v*10000) AS BIGINT))"

  // -------------------------------------------------------------------
  // sim_topk_quantized: exact top-20 neighbors of vec 0 by quantized
  // dot product. Oracle-backed (same integer math in DuckDB).
  // -------------------------------------------------------------------
  private def topkQuantized(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir).withColumn("q", expr(quantize))
    val query = e.filter(col("vec_id") === 0)
      .select(col("q").as("query_q"))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(query))
      .withColumn("dot",
        expr("aggregate(zip_with(q, query_q, (x, y) -> x*y), 0L, (acc, v) -> acc + v)"))
      .select(col("vec_id"), col("dot"))
      .orderBy(col("dot").desc, col("vec_id").asc)
      .limit(20)
  }

  private val topkQuantizedSql =
    s"""SELECT b.vec_id,
       |  CAST(list_sum(list_transform(list_zip(
       |    (SELECT $quantizeDuck FROM embeddings WHERE vec_id = 0),
       |    list_transform(b.embedding, v -> CAST(round(v*10000) AS BIGINT))),
       |    s -> s[1]*s[2])) AS BIGINT) AS dot
       |FROM embeddings b WHERE b.vec_id <> 0
       |ORDER BY dot DESC, vec_id ASC LIMIT 20""".stripMargin

  private def quantizeDuck =
    "list_transform(embedding, v -> CAST(round(v*10000) AS BIGINT))"

  // -------------------------------------------------------------------
  // sim_topk_cosine: float cosine brute force (the natural form; float
  // rounding is engine-specific → rows-only check).
  // -------------------------------------------------------------------
  private def topkCosine(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val query = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("query_e"))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(query))
      .withColumn("dot", expr(
        "aggregate(zip_with(embedding, query_e, (x, y) -> CAST(x AS DOUBLE)*y), 0D, (acc, v) -> acc + v)"))
      .withColumn("na", expr(
        "aggregate(embedding, 0D, (acc, v) -> acc + CAST(v AS DOUBLE)*v)"))
      .withColumn("nb", expr(
        "aggregate(query_e, 0D, (acc, v) -> acc + CAST(v AS DOUBLE)*v)"))
      .withColumn("cosine", col("dot") / sqrt(col("na") * col("nb")))
      .select(col("vec_id"), col("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(20)
  }

  // -------------------------------------------------------------------
  // sim_ann_lsh: random-hyperplane LSH. 12-bit signatures; candidates =
  // vectors whose signature is within Hamming 1 of the query's (multi-
  // probe), re-ranked by quantized dot. At scale: persist bucketed,
  // partition-prune per query instead of scanning.
  // -------------------------------------------------------------------
  private def annLsh(spark: SparkSession, dir: String): DataFrame = {
    val planes = 12
    val e = emb(spark, dir)
      .withColumn("q", expr(quantize))
      .withColumn("bucket", expr(
        s"""aggregate(sequence(0, ${planes - 1}), 0L, (acc, p) ->
           |  acc + CASE WHEN aggregate(sequence(0, size(q)-1), 0L,
           |    (a, d) -> a + IF(((xxhash64(p, d) >> 1) & 1) = 1, q[d], -q[d])) >= 0
           |  THEN shiftleft(1L, p) ELSE 0L END)""".stripMargin))

    val query = e.filter(col("vec_id") === 0)
      .select(col("q").as("query_q"), col("bucket").as("query_bucket"))

    e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(query))
      // multi-probe: same bucket or Hamming-1 neighbor bucket
      .filter(expr("bit_count(bucket ^ query_bucket) <= 1"))
      .withColumn("dot",
        expr("aggregate(zip_with(q, query_q, (x, y) -> x*y), 0L, (acc, v) -> acc + v)"))
      .select(col("vec_id"), col("dot"))
      .orderBy(col("dot").desc, col("vec_id").asc)
      .limit(20)
  }

  // -------------------------------------------------------------------
  // sim_ivf_label: IVF-style coarse quantization demo — centroids from
  // a groupBy (here the label partition stands in for k-means cells);
  // probe = nearest centroid, search only that cell. The plan shape
  // (centroid broadcast + cell-pruned scan) is the 100 TB IVF path.
  // -------------------------------------------------------------------
  private def ivfLabel(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir).withColumn("q", expr(quantize))

    // centroids: per-label mean in quantized space (integer avg → exact;
    // one avg aggregate per dimension, assembled into an array)
    val cent = e.groupBy("label")
      .agg(array((0 until 64).map(d => avg(col("q").getItem(d)).cast("long")): _*)
        .as("centroid"))

    val query = e.filter(col("vec_id") === 0).select(col("q").as("query_q"))

    // nearest centroid to the query (broadcast both tiny sides)
    val probe = cent.crossJoin(broadcast(query))
      .withColumn("cdot",
        expr("aggregate(zip_with(centroid, query_q, (x, y) -> x*y), 0L, (acc, v) -> acc + v)"))
      .orderBy(col("cdot").desc, col("label").asc)
      .limit(1)
      .select(col("label").as("probe_label"), col("query_q"))

    // search only the probed cell
    e.filter(col("vec_id") =!= 0)
      .join(broadcast(probe), col("label") === col("probe_label"))
      .withColumn("dot",
        expr("aggregate(zip_with(q, query_q, (x, y) -> x*y), 0L, (acc, v) -> acc + v)"))
      .select(col("vec_id"), col("label"), col("dot"))
      .orderBy(col("dot").desc, col("vec_id").asc)
      .limit(20)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_topk_quantized" -> (topkQuantized _),
    "sim_topk_cosine"    -> (topkCosine _),
    "sim_ann_lsh"        -> (annLsh _),
    "sim_ivf_label"      -> (ivfLabel _)
  )

  val oracleSql: Map[String, String] = Map(
    "sim_topk_quantized" -> topkQuantizedSql
  )
}
