package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-rehearsal data generator: writes a K× replica of a testdata
  * SF directory with foreign-key-consistent key shifts, so the heavy
  * tail of the bench can be rehearsed at sf1-equivalent volume before
  * anything runs on a real cluster.
  *
  * Usage: runMain graft.ScaleUp <inDir> <outDir> <K>
  *
  * Design choices (what makes the replica a fair 10× and not a
  * degenerate one):
  *   - Every copy shifts each entity key by copy × (max key + 1), and
  *     the SAME offset is applied to that key everywhere it appears
  *     (orders.o_custkey shifts by the customer offset), so join
  *     selectivities and group cardinalities scale linearly.
  *   - region/nation are dimensions and stay fixed — at 100 TB the
  *     dims don't grow with the fact tables.
  *   - documents.text is WORD-SCRAMBLED per copy (deterministic
  *     hash-ordered sort, seeded by (copy, doc_id)): verbatim copies
  *     would make every document a 10-way exact duplicate and turn
  *     the dedup rehearsal into a pathological Σsz² stress instead of
  *     a volume rehearsal. Scrambling keeps length/vocabulary
  *     distributions while destroying shingle overlap. Copy 0 is
  *     byte-identical to the source, so the original dup structure
  *     survives at 1/K rate.
  *   - embeddings get per-copy deterministic coordinate noise (~1e-2
  *     scale) for the same reason: identical vectors would collapse
  *     ANN cells onto K-fold degenerate centroids.
  *   - events keep their timestamps (K× density over the same window
  *     — more users, same per-user activity shape).
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val Array(inDir, outDir, kStr) = args
    val k = kStr.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def tbl(name: String): DataFrame =
      spark.read.parquet(s"$inDir/$name.parquet")
    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      System.err.println(s"[scaleup] wrote $name")
    }
    /** max(key)+1 — the per-copy shift stride for one entity. */
    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head.getLong(0) + 1L
    /** K copies in one narrow pass: cross join with a broadcast 0..K-1
      * frame, then per-copy column rewrites. No shuffle. */
    def copies(df: DataFrame): DataFrame =
      df.crossJoin(broadcast(spark.range(k).toDF("cp")))

    // dimensions: fixed
    write("region", tbl("region"))
    write("nation", tbl("nation"))

    val cust = tbl("customer"); val custS = stride(cust, "c_custkey")
    val ord = tbl("orders"); val ordS = stride(ord, "o_orderkey")
    val part = tbl("part"); val partS = stride(part, "p_partkey")
    val supp = tbl("supplier"); val suppS = stride(supp, "s_suppkey")

    write("customer", copies(cust)
      .withColumn("c_custkey", col("c_custkey") + col("cp") * custS)
      .drop("cp"))
    write("supplier", copies(supp)
      .withColumn("s_suppkey", col("s_suppkey") + col("cp") * suppS)
      .drop("cp"))
    write("part", copies(part)
      .withColumn("p_partkey", col("p_partkey") + col("cp") * partS)
      .drop("cp"))
    write("orders", copies(ord)
      .withColumn("o_orderkey", col("o_orderkey") + col("cp") * ordS)
      .withColumn("o_custkey", col("o_custkey") + col("cp") * custS)
      .drop("cp"))
    write("lineitem", copies(tbl("lineitem"))
      .withColumn("l_orderkey", col("l_orderkey") + col("cp") * ordS)
      .withColumn("l_partkey", col("l_partkey") + col("cp") * partS)
      .withColumn("l_suppkey", col("l_suppkey") + col("cp") * suppS)
      .drop("cp"))

    val ev = tbl("events")
    val evS = stride(ev, "event_id")
    val userS = ev.agg(max(col("user_id"))).head.getLong(0) + 1L
    write("events", copies(ev)
      .withColumn("event_id", col("event_id") + col("cp") * evS)
      .withColumn("user_id", col("user_id") + col("cp") * userS)
      .drop("cp"))

    val docs = tbl("documents")
    val docS = stride(docs, "doc_id")
    write("documents", copies(docs)
      .withColumn("text", when(col("cp") === 0, col("text"))
        .otherwise(expr(
          """array_join(array_sort(split(text, ' '),
            |  (a, b) -> CASE
            |    WHEN xxhash64(a, cp, doc_id) < xxhash64(b, cp, doc_id)
            |      THEN -1
            |    WHEN xxhash64(a, cp, doc_id) > xxhash64(b, cp, doc_id)
            |      THEN 1
            |    ELSE 0 END), ' ')""".stripMargin)))
      .withColumn("doc_id", col("doc_id") + col("cp") * docS)
      .withColumn("n_chars", length(col("text")))
      .drop("cp"))

    val emb = tbl("embeddings")
    val vecS = stride(emb, "vec_id")
    write("embeddings", copies(emb)
      .withColumn("embedding", when(col("cp") === 0, col("embedding"))
        .otherwise(expr(
          """transform(embedding, (x, j) ->
            |  CAST(x + (pmod(xxhash64(vec_id, cp, j), 2001) - 1000)
            |    / 100000.0D AS FLOAT))""".stripMargin)))
      .withColumn("vec_id", col("vec_id") + col("cp") * vecS)
      .drop("cp"))

    spark.stop()
  }
}
