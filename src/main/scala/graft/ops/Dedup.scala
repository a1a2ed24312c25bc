package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication family for large-scale training-data pipelines.
  *
  * Scale design (the part that matters at 100 TB):
  *   - exact dedup is `row_number() OVER (PARTITION BY content_hash)` —
  *     one shuffle on the 128-bit hash, never a global `distinct` over
  *     wide rows; the text itself never shuffles, only (hash, doc_id);
  *   - near-dup is MinHash + LSH banding: O(n·k) signature computation
  *     (embarrassingly parallel Column expressions, no UDFs), then one
  *     shuffle on (band, band_hash) — candidate generation is linear,
  *     never an n² cross join. Oversized buckets (degenerate shingles)
  *     are capped to bound skew, mirroring AQE-style skew hygiene;
  *   - SimHash packs a document into one 64-bit word; banding on 16-bit
  *     chunks finds Hamming≤k neighbors with one shuffle;
  *   - verification (exact Jaccard) runs only on LSH candidates.
  *
  * All signatures/hashes derive from `xxhash64` with fixed seeds →
  * fully deterministic across runs and cluster sizes.
  */
object Dedup {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  // -------------------------------------------------------------------
  // Exact dedup: keep the min doc_id per content hash. Oracle-backed.
  // -------------------------------------------------------------------
  private def exactKeepMin(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("h").orderBy("doc_id")
    docs(spark, dir)
      .select(col("doc_id"), md5(col("text")).as("h"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("doc_id")
      .orderBy("doc_id")
  }

  private val exactKeepMinSql =
    """SELECT doc_id FROM (
      |  SELECT doc_id, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      |  FROM documents) q
      |WHERE rn = 1 ORDER BY doc_id""".stripMargin

  /** duplicate-group histogram (degenerate groups surface as cnt>1) */
  private def exactGroups(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .groupBy(md5(lower(col("text"))).as("h"))
      .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("keep_doc"))
      .orderBy("h")

  private val exactGroupsSql =
    """SELECT md5(lower(text)) AS h, COUNT(*) AS cnt, MIN(doc_id) AS keep_doc
      |FROM documents GROUP BY 1 ORDER BY h""".stripMargin

  // -------------------------------------------------------------------
  // MinHash + LSH near-dup. k=32 hashes, b=8 bands × r=4 rows.
  // Pure Column/HOF pipeline (codegen'd, no UDFs):
  //   words → 3-word shingles → k seeded minhashes → band fold-hashes
  //   → explode bands → bucket self-join (a<b) → exact-Jaccard verify.
  // -------------------------------------------------------------------
  private val NumHashes = 32
  private val Bands = 8
  private val RowsPerBand = NumHashes / Bands
  private val ShingleWords = 3
  private val MaxBucket = 64 // skew cap: drop degenerate buckets

  private def shingleCol: Column = {
    val words = split(lower(col("text")), "\\s+")
    val n = ShingleWords
    array_distinct(
      when(size(words) >= n,
        transform(sequence(lit(0), size(words) - n),
          i => concat_ws(" ", slice(words, i + lit(1), lit(n)))))
      .otherwise(array(concat_ws(" ", words))))
  }

  private def signatureCol(sh: Column): Column =
    transform(sequence(lit(0), lit(NumHashes - 1)),
      s => array_min(transform(sh, x => xxhash64(x, s))))

  private def bandsCol(sig: Column): Column =
    transform(sequence(lit(0), lit(Bands - 1)),
      b => aggregate(
        slice(sig, b * lit(RowsPerBand) + lit(1), lit(RowsPerBand)),
        lit(0L), (acc, v) => xxhash64(acc, v)))

  private def minhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
      .select(col("doc_id"), shingleCol.as("shingles"))
      .withColumn("sig", signatureCol(col("shingles")))
      .withColumn("bands", bandsCol(col("sig")))

    val exploded = d.select(col("doc_id"), posexplode(col("bands")).as(Seq("band", "bh")))

    // skew hygiene: cap bucket size so a degenerate shingle can't n² a bucket
    val bucketed = exploded
      .withColumn("bucket_n", count(lit(1)).over(Window.partitionBy("band", "bh")))
      .filter(col("bucket_n") <= MaxBucket)

    val a = bucketed.select(col("band"), col("bh"), col("doc_id").as("a"))
    val b = bucketed.select(col("band"), col("bh"), col("doc_id").as("b"))
    val candidates = a.join(b, Seq("band", "bh")).filter(col("a") < col("b"))
      .select("a", "b").distinct()

    // verify candidates with exact Jaccard over shingle sets
    val sh = d.select(col("doc_id"), col("shingles"))
    candidates
      .join(sh.withColumnRenamed("doc_id", "a").withColumnRenamed("shingles", "sh_a"), "a")
      .join(sh.withColumnRenamed("doc_id", "b").withColumnRenamed("shingles", "sh_b"), "b")
      .withColumn("jaccard_pm",
        (size(array_intersect(col("sh_a"), col("sh_b"))) * lit(1000) /
          size(array_union(col("sh_a"), col("sh_b")))).cast("long"))
      .filter(col("jaccard_pm") >= 300)
      .select(col("a").as("doc_a"), col("b").as("doc_b"), col("jaccard_pm"))
      .orderBy("doc_a", "doc_b")
  }

  // -------------------------------------------------------------------
  // SimHash: 64-bit signature; near-dups = Hamming distance ≤ 3 found
  // via 16-bit band blocking (a pair within distance 3 shares at least
  // one of 4 bands). SQL-expr HOFs (shift ops need column shift
  // amounts, which only the SQL surface exposes).
  // -------------------------------------------------------------------
  private def simhashDf(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .withColumn("tok_hashes",
        expr("transform(split(lower(text), '\\\\s+'), t -> xxhash64(t))"))
      .withColumn("simhash", expr(
        s"""aggregate(sequence(0, 63), 0L, (acc, i) ->
           |  acc + CASE WHEN
           |    aggregate(tok_hashes, 0L,
           |      (a, h) -> a + IF(((h >> i) & 1) = 1, 1L, -1L)) >= 0
           |  THEN shiftleft(1L, i) ELSE 0L END)""".stripMargin))
      .select("doc_id", "simhash")

  private def simhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val s = simhashDf(spark, dir)
    val banded = s.select(col("doc_id"), col("simhash"),
      posexplode(expr(
        "transform(sequence(0,3), b -> (simhash >> (b*16)) & 65535)"))
        .as(Seq("band", "bh")))
    val a = banded.select(col("band"), col("bh"),
      col("doc_id").as("a"), col("simhash").as("sim_a"))
    val b = banded.select(col("band"), col("bh"),
      col("doc_id").as("b"), col("simhash").as("sim_b"))
    a.join(b, Seq("band", "bh")).filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        expr("bit_count(sim_a ^ sim_b)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy("a", "b")
  }

  // -------------------------------------------------------------------
  // Character n-gram Jaccard near-dup: 8-char shingles, same LSH
  // banding machinery (different feature space than word-shingle
  // MinHash — catches near-dups with word-level edits).
  // -------------------------------------------------------------------
  private def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val norm = regexp_replace(lower(col("text")), "\\s+", " ")
    val n = 8
    // substring with a column start position needs the SQL surface
    val d = docs(spark, dir)
      .withColumn("norm", norm)
      .withColumn("grams", expr(
        s"""array_distinct(CASE WHEN length(norm) >= $n
           |  THEN transform(sequence(1, length(norm) - $n + 1),
           |       i -> substring(norm, i, $n))
           |  ELSE array(norm) END)""".stripMargin))
      .select(col("doc_id"), col("grams"))
      .withColumn("sig", signatureCol(col("grams")))
      .withColumn("bands", bandsCol(col("sig")))

    val exploded = d.select(col("doc_id"), posexplode(col("bands")).as(Seq("band", "bh")))
    val a = exploded.select(col("band"), col("bh"), col("doc_id").as("a"))
    val b = exploded.select(col("band"), col("bh"), col("doc_id").as("b"))
    val candidates = a.join(b, Seq("band", "bh")).filter(col("a") < col("b"))
      .select("a", "b").distinct()
    val g = d.select(col("doc_id"), col("grams"))
    candidates
      .join(g.withColumnRenamed("doc_id", "a").withColumnRenamed("grams", "g_a"), "a")
      .join(g.withColumnRenamed("doc_id", "b").withColumnRenamed("grams", "g_b"), "b")
      .withColumn("jaccard_pm",
        (size(array_intersect(col("g_a"), col("g_b"))) * lit(1000) /
          size(array_union(col("g_a"), col("g_b")))).cast("long"))
      .filter(col("jaccard_pm") >= 300)
      .select(col("a").as("doc_a"), col("b").as("doc_b"), col("jaccard_pm"))
      .orderBy("doc_a", "doc_b")
  }

  // -------------------------------------------------------------------
  // Embedding near-dup: random-hyperplane LSH (16 deterministic
  // hash-derived hyperplanes → 16-bit bucket), exact quantized-cosine
  // verify within buckets. Quantized integer arithmetic → deterministic.
  // -------------------------------------------------------------------
  private def embedNearDup(spark: SparkSession, dir: String): DataFrame = {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      // quantize once: int micro-units, exact integer math from here on
      .withColumn("q", expr("transform(embedding, v -> CAST(round(v*10000) AS BIGINT))"))
      // 16 random hyperplanes; weight(p,d) = ±1 from xxhash64(p,d). Signs
      // computed on the raw floats (sign is scale-invariant).
      .withColumn("bucket", expr(
        """aggregate(sequence(0, 15), 0L, (acc, p) ->
          |  acc + CASE WHEN aggregate(sequence(0, size(embedding)-1), 0D,
          |    (s, d) -> s + IF(((xxhash64(p, d) >> 1) & 1) = 1,
          |                     CAST(embedding[d] AS DOUBLE),
          |                     -CAST(embedding[d] AS DOUBLE))) >= 0D
          |  THEN shiftleft(1L, p) ELSE 0L END)""".stripMargin))
      .select("vec_id", "q", "bucket")
      // shuffle on bucket = materialization barrier: q/bucket computed
      // once per row, never per candidate pair (and the exact layout a
      // 100 TB run would persist, partitioned by bucket)
      .repartition(col("bucket"))

    val a = e.select(col("bucket"), col("vec_id").as("a"), col("q").as("qa"))
    val b = e.select(col("bucket"), col("vec_id").as("b"), col("q").as("qb"))
    a.join(b, "bucket").filter(col("a") < col("b"))
      .withColumn("dot", expr(
        "aggregate(zip_with(qa, qb, (x, y) -> x*y), 0L, (acc, v) -> acc + v)"))
      .withColumn("na", expr("aggregate(qa, 0L, (acc, v) -> acc + v*v)"))
      .withColumn("nb", expr("aggregate(qb, 0L, (acc, v) -> acc + v*v)"))
      // cosine ≥ 0.95 ⇔ dot ≥ 0 and dot² ≥ 0.9025·na·nb. Compared in
      // double (the squares overflow Long); inputs are exact integers so
      // the comparison is stable across runs.
      .filter(col("dot") > 0 &&
        col("dot").cast("double") * col("dot").cast("double") * lit(10000.0) >=
          col("na").cast("double") * col("nb").cast("double") * lit(9025.0))
      .select(col("a").as("vec_a"), col("b").as("vec_b"))
      .distinct()
      .orderBy("vec_a", "vec_b")
  }

  // -------------------------------------------------------------------
  // Approximate distinct (HLL sketch — TypedImperativeAggregate inside
  // Spark): dedup *counting* without a distinct shuffle of the keys.
  // Approximate by construction → no DuckDB oracle.
  // -------------------------------------------------------------------
  private def approxUsers(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"))
      .orderBy("event_type")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dd_exact_keep_min" -> (exactKeepMin _),
    "dd_exact_groups"   -> (exactGroups _),
    "dd_minhash_pairs"  -> (minhashPairs _),
    "dd_simhash_pairs"  -> (simhashPairs _),
    "dd_ngram_jaccard"  -> (ngramJaccard _),
    "dd_embed_neardup"  -> (embedNearDup _),
    "dd_approx_users"   -> (approxUsers _)
  )

  val oracleSql: Map[String, String] = Map(
    "dd_exact_keep_min" -> exactKeepMinSql,
    "dd_exact_groups"   -> exactGroupsSql
  )
}
