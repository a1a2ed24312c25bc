package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.dotLong

/** Similarity search over the embeddings table (`Array[Float]`, dim 64).
  *
  * Five tiers, in increasing scale-readiness:
  *   1. brute-force top-k — the exactness baseline: one scan, per-row
  *      dot product via the native codegen'd [[graft.functions.GraftFunctions.dotLong]]
  *      expression (round-1 used interpreted `zip_with`/`aggregate` HOFs,
  *      which break whole-stage codegen), top-k via
  *      TakeOrderedAndProject. O(n·d), no shuffle of vectors.
  *   2. quantized top-k — same plan but integer micro-unit arithmetic →
  *      bit-exact across engines.
  *   3. LSH multi-probe ANN — random-hyperplane signatures over the
  *      SAME physical bucket layout as tier 4; candidates = the query's
  *      partition plus its Hamming-1 neighbor partitions, read via a
  *      partition-filter IN-list (≤ planes+1 of 2^planes partitions).
  *   4. bucketed ANN — single-probe: the signature is a PHYSICAL
  *      partition column (`write.partitionBy("bucket")`); a query reads
  *      ONE partition via partition pruning instead of scanning.
  *   5. product quantization — the memory tier: corpus stored as 8
  *      four-bit codes per vector (64× compression), queries rank by
  *      128-entry lookup-table additions (asymmetric distance), exact
  *      re-rank over the candidate set only. Codebooks are trained
  *      (sampled init + Lloyd rounds) deterministically in both engines.
  *
  * All hyperplane signs come from [[Hyperplanes]] (fixed-seed ±1 matrix
  * inlined into both engines) and all arithmetic after quantization is
  * integer (or floored-double on integer inputs) → every query here is
  * DuckDB-oracle-checkable. Query vector = vec_id 0 (deterministic).
  */
object Similarity {

  private def emb(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  /** integer micro-quantization: exact, portable arithmetic */
  private[ops] val quantize = "transform(embedding, v -> CAST(round(CAST(v AS DOUBLE)*10000) AS BIGINT))"
  private[ops] val quantizeDuck =
    "list_transform(embedding, v -> CAST(round(CAST(v AS DOUBLE)*10000) AS BIGINT))"

  /** hyperplane bucket over the quantized vector — shared formulation,
    * see [[Hyperplanes.bucketCol]] / [[Hyperplanes.bucketSqlDuck]]
    */
  private def bucketCol(planes: Int): org.apache.spark.sql.Column =
    Hyperplanes.bucketCol(col("q"), planes)

  private def bucketSqlDuck(planes: Int): String =
    Hyperplanes.bucketSqlDuck("q", planes)

  // -------------------------------------------------------------------
  // sim_dim_variance: per-DIMENSION variance profile of the embedding
  // corpus — the "which dimensions are dead" audit that decides
  // dimension pruning, PQ subspace splits, and whether a cheap
  // projection loses anything. Exactly the ax_corr_sums discipline
  // applied per coordinate: micro-quantized x (round(v·10⁴), the
  // shared portable quantization), per-dim n, Σx, Σx², and the
  // non-negative variance numerator n·Σx² − (Σx)² — no division, no
  // floats, bit-identical cross-engine.
  //
  // Scale shape: posexplode is MAP-LOCAL (64·n narrow rows feed a
  // partial aggregate that reduces to 64 rows before any exchange);
  // output is |dims| rows regardless of corpus size. The magnitudes:
  // |x| ≤ 10⁴ ⇒ n·Σx² ≤ n²·10⁸ — int64-safe to n ≈ 3×10⁵ vectors,
  // past which the two wide terms switch to DECIMAL(38,0)
  // (ax_decimal_sum discipline), same single-pass plan.
  // -------------------------------------------------------------------
  private def dimVariance(spark: SparkSession, dir: String): DataFrame =
    emb(spark, dir).withColumn("q", expr(quantize))
      .select(posexplode(col("q")).as(Seq("dim", "x")))
      .groupBy(col("dim").cast("long").as("dim"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("dim"), col("n"), col("sx"), col("sxx"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("var_num"))
      .orderBy("dim")

  private val dimVarianceSql =
    s"""WITH qt AS (SELECT vec_id, $quantizeDuck AS q FROM embeddings),
       |d AS (SELECT i AS dim, q[i + 1] AS x
       |      FROM qt, (SELECT unnest(range(0, 64)) AS i) g)
       |SELECT CAST(dim AS BIGINT) AS dim, COUNT(*) AS n,
       |  CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(x * x) AS BIGINT) AS sxx,
       |  CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) AS BIGINT) AS var_num
       |FROM d GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------------------
  // sim_prune_recall: the MEASURED recall cost of variance-based
  // DIMENSION PRUNING — sim_dim_variance's follow-through: search with
  // only the 32 highest-variance dimensions (of 64) and report
  // recall@10 against the full-dimension ground truth per probe. The
  // same measured-trade-off genre as sim_ann_recall/sim_pq_recall:
  // the knob (half the dot-product cost, half the vector bytes) gets
  // a number, not a hope. Dimension selection is a KB-scale
  // driver-side decision off the 64-row variance aggregate (the
  // k-means-centroid discipline: only K×dims ints cross the driver),
  // deterministic under (var_num desc, dim) — the oracle replays the
  // identical ranking in SQL.
  //
  // Scale shape: both searches share ONE scan + broadcast probe panel;
  // per-row work is two codegen'd integer dots; top-k via the bounded
  // TopK aggregator (map-side k-row partials, no per-probe sort).
  // -------------------------------------------------------------------
  private def pruneRecall(spark: SparkSession, dir: String): DataFrame = {
    val topk = udaf(new graft.functions.TopK.TopKByScore(10))
    val e = emb(spark, dir).withColumn("q", expr(quantize))
    val sel = dimVariance(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(4)))
      .sortBy { case (d, v) => (-v, d) }
      .take(32).map(_._1.toInt).sorted
    val base = e.select(col("vec_id"), col("q"),
      array(sel.map(i => col("q").getItem(i)): _*).as("qs"))
    val probes = base.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("q").as("pq"),
        col("qs").as("pqs"))
    val scored = base.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        dotLong(col("q"), col("pq")).as("dot_full"),
        dotLong(col("qs"), col("pqs")).as("dot_sel"))
    def top10(scoreCol: String): DataFrame = scored
      .groupBy("probe_id")
      .agg(topk(col(scoreCol), col("vec_id")).as("nn"))
      .select(col("probe_id"), explode(col("nn")).as("w"))
      .select(col("probe_id"), col("w.id").as("vec_id"))
    top10("dot_full").join(top10("dot_sel"), Seq("probe_id", "vec_id"))
      .groupBy("probe_id").agg(count(lit(1)).as("n_overlap"))
      .join(probes.select("probe_id"), Seq("probe_id"), "right")
      .na.fill(0L, Seq("n_overlap"))
      .select(col("probe_id"), lit(10L).as("k"), col("n_overlap"),
        expr("(n_overlap * 1000L) div 10").as("recall_pm"))
      .orderBy("probe_id")
  }

  private val pruneRecallSql =
    s"""WITH qt AS (SELECT vec_id, $quantizeDuck AS q FROM embeddings),
       |dv AS (SELECT i AS dim, COUNT(*) AS n, SUM(x) AS sx,
       |    SUM(x * x) AS sxx
       |  FROM (SELECT q[i + 1] AS x, i
       |        FROM qt, (SELECT unnest(range(0, 64)) AS i) g)
       |  GROUP BY 1),
       |sel AS (SELECT dim FROM (
       |    SELECT dim, ROW_NUMBER() OVER
       |      (ORDER BY (n * sxx - sx * sx) DESC, dim) AS rn FROM dv)
       |  WHERE rn <= 32),
       |probes AS (SELECT vec_id AS probe_id, q AS pq FROM qt
       |           WHERE vec_id < 10),
       |pairs AS (SELECT p.probe_id, t.vec_id,
       |    SUM(t.q[i.i + 1] * p.pq[i.i + 1]) AS dot_full,
       |    SUM(CASE WHEN i.i IN (SELECT dim FROM sel)
       |        THEN t.q[i.i + 1] * p.pq[i.i + 1] ELSE 0 END) AS dot_sel
       |  FROM qt t, probes p, (SELECT unnest(range(0, 64)) AS i) i
       |  WHERE t.vec_id <> p.probe_id GROUP BY 1, 2),
       |rf AS (SELECT probe_id, vec_id, ROW_NUMBER() OVER
       |    (PARTITION BY probe_id ORDER BY dot_full DESC, vec_id) AS r
       |  FROM pairs),
       |rs AS (SELECT probe_id, vec_id, ROW_NUMBER() OVER
       |    (PARTITION BY probe_id ORDER BY dot_sel DESC, vec_id) AS r
       |  FROM pairs),
       |ov AS (SELECT rf.probe_id, COUNT(*) AS n_overlap
       |  FROM rf JOIN rs USING (probe_id, vec_id)
       |  WHERE rf.r <= 10 AND rs.r <= 10 GROUP BY 1)
       |SELECT p.probe_id, CAST(10 AS BIGINT) AS k,
       |  CAST(COALESCE(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
       |  CAST(COALESCE(ov.n_overlap, 0) * 1000 // 10 AS BIGINT) AS recall_pm
       |FROM probes p LEFT JOIN ov USING (probe_id)
       |ORDER BY probe_id""".stripMargin

  // -------------------------------------------------------------------
  // sim_pca_recall: ANISOTROPIC PROJECTION vs the variance cutoff —
  // the follow-through on what sim_prune_recall measured (axis-aligned
  // variance pruning keeps only ~30% of true neighbors on this
  // near-isotropic corpus): does a LEARNED rotation beat axis-aligned
  // dropping at the same 32-dim budget? Pipeline:
  //  1. the 64×64 covariance sums in ONE triangular aggregate
  //     (ax_corr_sums discipline: the double posexplode is MAP-LOCAL,
  //     partial aggregation reduces n·2080 narrow rows to 2080 before
  //     any exchange — covariance of a 100 TB corpus is one pass);
  //  2. driver-side cyclic Jacobi eigendecomposition of the KB-scale
  //     matrix (k-means-centroid discipline: 64×64 doubles cross the
  //     driver, nothing else);
  //  3. the top-32 eigenvector rows micro-quantized (round·1000) and
  //     folded in as LITERAL arrays — projection is 32 native integer
  //     dots per vector (codegen'd DotProductLong), no shuffle;
  //  4. recall@10 of PCA-32 and variance-32 against the full-64 truth
  //     from ONE scan (three bounded TopK buffers side by side, the
  //     sim_mrl_recall single-pass shape), pca−var delta emitted.
  // The oracle replays the DRIVER's eigen verbatim: the quantized
  // projection rows are inlined into GENERATED DuckDB SQL when the
  // query runs (Hyperplanes discipline, made data-dependent — Verify
  // dumps oracle_sql.json only after all queries finish, so the
  // registered SQL is this SF's). Everything after quantization is
  // int64: |y_k| ≤ ‖p_k‖₂·‖q‖₂ ≤ 1010·8·10⁴ < 10⁸ ⇒ projected pair
  // dots ≤ 32·10¹⁶ ≪ 2⁶³.
  // -------------------------------------------------------------------

  /** Cyclic Jacobi eigendecomposition of a symmetric n×n matrix —
    * driver-side, deterministic (fixed sweep order, fixed sweep
    * count). Returns (eigenvalues, eigenvectors-as-rows), unsorted.
    * 12 sweeps of a 64×64 matrix ≈ 1.5M flops: microseconds, KB.
    */
  private[ops] def jacobiEigen(m: Array[Array[Double]], sweeps: Int = 12)
      : (Array[Double], Array[Array[Double]]) = {
    val n = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var s = 0
    while (s < sweeps) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              (if (theta >= 0) 1.0 else -1.0) /
                (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val sn = t * c
            var k = 0
            while (k < n) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - sn * akq
              a(k)(q) = sn * akp + c * akq
              k += 1
            }
            k = 0
            while (k < n) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - sn * aqk
              a(q)(k) = sn * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - sn * vkq
              v(k)(q) = sn * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      s += 1
    }
    (Array.tabulate(n)(k => a(k)(k)),
      Array.tabulate(n)(k => Array.tabulate(n)(d => v(d)(k))))
  }

  /** oracle SQL for sim_pca_recall, generated when the query runs
    * (data-dependent projection literals); the placeholder is never
    * compared — the compare only reads oracles for dumped results,
    * and the dump ran the query first
    */
  private val pcaOracleSqlRef =
    new java.util.concurrent.atomic.AtomicReference[String](
      "SELECT CAST(1 AS BIGINT) AS pca_oracle_not_generated")

  private def pcaRecall(spark: SparkSession, dir: String): DataFrame = {
    val topk = udaf(new graft.functions.TopK.TopKByScore(10))
    val e = emb(spark, dir).withColumn("q", expr(quantize))
    // 1. triangular covariance sums — one aggregate, map-side reduced
    val tri = e.select(col("q"), posexplode(col("q")).as(Seq("i", "xi")))
      .select(col("i"), col("xi"), posexplode(col("q")).as(Seq("j", "xj")))
      .filter(col("j") >= col("i"))
      .groupBy("i", "j")
      .agg(count(lit(1)).as("n"), sum(col("xi") * col("xj")).as("sxy"),
        sum(col("xi")).as("sxi"), sum(col("xj")).as("sxj"))
      .collect() // 2080 rows of 6 longs — bounded metadata
    val cov = Array.ofDim[Double](64, 64)
    tri.foreach { r =>
      val i = r.getInt(0); val j = r.getInt(1)
      // covariance numerator n·Σxy − Σx·Σy in doubles: driver-only
      // math, never compared cross-engine (the oracle replays the
      // RESULTING projection literals, not this computation)
      val c = r.getLong(2).toDouble * r.getLong(3).toDouble -
        r.getLong(4).toDouble * r.getLong(5).toDouble
      cov(i)(j) = c
      cov(j)(i) = c
    }
    // 2. driver eigen; 3. top-32 rows by (eigenvalue desc, index asc)
    val (ev, evec) = jacobiEigen(cov)
    val comps: Seq[Array[Long]] = (0 until 64)
      .sortBy(k => (-ev(k), k)).take(32)
      .map(k => evec(k).map(x => math.round(x * 1000.0)))
    pcaOracleSqlRef.set(pcaRecallSqlFor(comps))
    // variance-32 selection: same ranking as sim_prune_recall
    val sel = dimVariance(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(4)))
      .sortBy { case (d, v) => (-v, d) }
      .take(32).map(_._1.toInt).sorted
    val base = e.select(col("vec_id"), col("q"),
      array(sel.map(i => col("q").getItem(i)): _*).as("qs"),
      array(comps.map(row =>
        dotLong(col("q"), typedLit(row.toSeq))): _*).as("y"))
    val probes = base.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("q").as("pq"),
        col("qs").as("pqs"), col("y").as("py"))
    val scored = base.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        dotLong(col("q"), col("pq")).as("d_full"),
        dotLong(col("qs"), col("pqs")).as("d_var"),
        dotLong(col("y"), col("py")).as("d_pca"))
    // 4. all three top-10 lists from ONE pass (bounded TopK buffers)
    val agg = scored.groupBy("probe_id")
      .agg(topk(col("d_full"), col("vec_id")).as("nn_full"),
        topk(col("d_var"), col("vec_id")).as("nn_var"),
        topk(col("d_pca"), col("vec_id")).as("nn_pca"))
    val guarded = probes.select(col("probe_id"))
      .join(agg, Seq("probe_id"), "left")
    def overlap(c: String) = expr(
      s"CAST(coalesce(size(array_intersect(transform(nn_full, " +
        s"w -> w.id), transform($c, w -> w.id))), 0) AS BIGINT)")
    guarded.select(col("probe_id"),
        overlap("nn_pca").as("n_overlap_pca"),
        overlap("nn_var").as("n_overlap_var"))
      .select(col("probe_id"), col("n_overlap_pca"), col("n_overlap_var"),
        expr("(n_overlap_pca * 1000L) div 10").as("recall_pca_pm"),
        expr("(n_overlap_var * 1000L) div 10").as("recall_var_pm"),
        ((col("n_overlap_pca") - col("n_overlap_var")) * lit(100L))
          .as("delta_pm"))
      .orderBy("probe_id")
  }

  /** the generated oracle: projection rows inlined as integer literals */
  private def pcaRecallSqlFor(comps: Seq[Array[Long]]): String = {
    def yExpr(row: Array[Long]): String = {
      val terms = row.zipWithIndex.collect {
        case (w, d) if w != 0L => s"t.q[${d + 1}]*($w)"
      }
      if (terms.isEmpty) "CAST(0 AS BIGINT)"
      else s"CAST(${terms.mkString(" + ")} AS BIGINT)"
    }
    val yList = comps.map(yExpr).mkString("[", ", ", "]")
    s"""WITH qt AS MATERIALIZED (
       |  SELECT vec_id, $quantizeDuck AS q FROM embeddings),
       |dv AS (SELECT i AS dim, COUNT(*) AS n, SUM(x) AS sx,
       |    SUM(x * x) AS sxx
       |  FROM (SELECT q[i + 1] AS x, i
       |        FROM qt, (SELECT unnest(range(0, 64)) AS i) g)
       |  GROUP BY 1),
       |sel AS MATERIALIZED (SELECT dim FROM (
       |    SELECT dim, ROW_NUMBER() OVER
       |      (ORDER BY (n * sxx - sx * sx) DESC, dim) AS rn FROM dv)
       |  WHERE rn <= 32),
       |pr AS MATERIALIZED (SELECT t.vec_id, t.q, $yList AS y FROM qt t),
       |probes AS MATERIALIZED (SELECT vec_id AS probe_id, q AS pq, y AS py
       |  FROM pr WHERE vec_id < 10),
       |pairsv AS (SELECT p.probe_id, t.vec_id,
       |    SUM(t.q[i.i + 1] * p.pq[i.i + 1]) AS d_full,
       |    SUM(CASE WHEN i.i IN (SELECT dim FROM sel)
       |        THEN t.q[i.i + 1] * p.pq[i.i + 1] ELSE 0 END) AS d_var
       |  FROM qt t, probes p, (SELECT unnest(range(0, 64)) AS i) i
       |  WHERE t.vec_id <> p.probe_id GROUP BY 1, 2),
       |pairsp AS (SELECT p.probe_id, t.vec_id,
       |    ${PortableHash.dotSqlDuck("t.y", "p.py")} AS d_pca
       |  FROM pr t, probes p WHERE t.vec_id <> p.probe_id),
       |pairs AS MATERIALIZED (SELECT * FROM pairsv
       |  JOIN pairsp USING (probe_id, vec_id)),
       |rf AS (SELECT probe_id, vec_id, ROW_NUMBER() OVER
       |    (PARTITION BY probe_id ORDER BY d_full DESC, vec_id) AS r
       |  FROM pairs),
       |rv AS (SELECT probe_id, vec_id, ROW_NUMBER() OVER
       |    (PARTITION BY probe_id ORDER BY d_var DESC, vec_id) AS r
       |  FROM pairs),
       |rp AS (SELECT probe_id, vec_id, ROW_NUMBER() OVER
       |    (PARTITION BY probe_id ORDER BY d_pca DESC, vec_id) AS r
       |  FROM pairs),
       |op AS (SELECT rf.probe_id, COUNT(*) AS n_overlap
       |  FROM rf JOIN rp USING (probe_id, vec_id)
       |  WHERE rf.r <= 10 AND rp.r <= 10 GROUP BY 1),
       |ov AS (SELECT rf.probe_id, COUNT(*) AS n_overlap
       |  FROM rf JOIN rv USING (probe_id, vec_id)
       |  WHERE rf.r <= 10 AND rv.r <= 10 GROUP BY 1)
       |SELECT p.probe_id,
       |  CAST(COALESCE(op.n_overlap, 0) AS BIGINT) AS n_overlap_pca,
       |  CAST(COALESCE(ov.n_overlap, 0) AS BIGINT) AS n_overlap_var,
       |  CAST(COALESCE(op.n_overlap, 0) * 1000 // 10 AS BIGINT)
       |    AS recall_pca_pm,
       |  CAST(COALESCE(ov.n_overlap, 0) * 1000 // 10 AS BIGINT)
       |    AS recall_var_pm,
       |  CAST((COALESCE(op.n_overlap, 0) - COALESCE(ov.n_overlap, 0))
       |    * 100 AS BIGINT) AS delta_pm
       |FROM probes p LEFT JOIN op USING (probe_id)
       |LEFT JOIN ov USING (probe_id)
       |ORDER BY probe_id""".stripMargin
  }

  // -------------------------------------------------------------------
  // sim_mrl_recall: MATRYOSHKA (prefix-truncation) recall curve —
  // recall@10 of searching with only the FIRST 8 / 16 / 32 of 64
  // dimensions, against the full-dimension ground truth, per probe.
  // The measured-trade-off genre (sim_ann_recall / sim_pq_recall /
  // sim_prune_recall) applied to the truncation every MRL-trained
  // embedding ships with: prefix dims are the model's own coarse-to-
  // fine ordering, so "how short can the query-time vector be" gets a
  // number per prefix length, not a hope. Differs from
  // sim_prune_recall by construction: FIXED prefixes (no data-driven
  // dimension selection), three lengths in one pass.
  //
  // Scale shape: ONE scan + broadcast probe panel; per row, four
  // codegen'd integer dots (the prefix dots reuse the same quantized
  // array via slice — no extra columns stored); top-k via the bounded
  // TopK aggregator (map-side k-row partials). Output = 3·|probes|
  // rows.
  // -------------------------------------------------------------------
  private def mrlRecall(spark: SparkSession, dir: String): DataFrame = {
    val topk = udaf(new graft.functions.TopK.TopKByScore(10))
    val base = emb(spark, dir).withColumn("q", expr(quantize))
      .select(col("vec_id"), col("q"),
        expr("slice(q, 1, 8)").as("q8"),
        expr("slice(q, 1, 16)").as("q16"),
        expr("slice(q, 1, 32)").as("q32"))
    val probes = base.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("q").as("pq"),
        col("q8").as("pq8"), col("q16").as("pq16"), col("q32").as("pq32"))
    val scored = base.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        dotLong(col("q"), col("pq")).as("d64"),
        dotLong(col("q8"), col("pq8")).as("d8"),
        dotLong(col("q16"), col("pq16")).as("d16"),
        dotLong(col("q32"), col("pq32")).as("d32"))
    // ALL FOUR top-10 lists come out of ONE aggregate over ONE pass of
    // the scored pairs (four bounded TopK buffers side by side), so
    // the corpus is scanned exactly once. The former phrasing reused
    // per-score DataFrames across union branches, and every branch
    // re-planned the scan + broadcast join — six corpus passes for a
    // 30-row answer. Overlap then reduces on the |probes|-row result:
    // recall@10 = |ids(full) ∩ ids(prefix)| via array_intersect —
    // plan-guarded single-scan in PlanShapeSpec.
    val agg = scored.groupBy("probe_id")
      .agg(topk(col("d64"), col("vec_id")).as("nn64"),
        topk(col("d8"), col("vec_id")).as("nn8"),
        topk(col("d16"), col("vec_id")).as("nn16"),
        topk(col("d32"), col("vec_id")).as("nn32"))
    // left-join back onto the probe panel (the oracle's `grid` guard):
    // a probe with ZERO scored candidates (degenerate corpus of size 1)
    // must emit n_overlap=0 rows, not vanish from the aggregate
    val guarded = probes.select(col("probe_id"))
      .join(agg, Seq("probe_id"), "left")
    def overlap(c: String) = expr(
      s"CAST(coalesce(size(array_intersect(transform(nn64, w -> w.id), " +
        s"transform($c, w -> w.id))), 0) AS BIGINT)")
    guarded.select(col("probe_id"), explode(array(
        struct(lit(8L).as("prefix_dims"), overlap("nn8").as("n_overlap")),
        struct(lit(16L).as("prefix_dims"), overlap("nn16").as("n_overlap")),
        struct(lit(32L).as("prefix_dims"), overlap("nn32").as("n_overlap"))))
        .as("o"))
      .select(col("probe_id"), col("o.prefix_dims").as("prefix_dims"),
        col("o.n_overlap").as("n_overlap"),
        expr("(o.n_overlap * 1000L) div 10").as("recall_pm"))
      .orderBy("probe_id", "prefix_dims")
  }

  private val mrlRecallSql =
    s"""WITH qt AS (SELECT vec_id, $quantizeDuck AS q FROM embeddings),
       |probes AS (SELECT vec_id AS probe_id, q AS pq FROM qt
       |           WHERE vec_id < 10),
       |pairs AS (SELECT p.probe_id, t.vec_id,
       |    SUM(t.q[i.i + 1] * p.pq[i.i + 1]) AS d64,
       |    SUM(CASE WHEN i.i < 8
       |        THEN t.q[i.i + 1] * p.pq[i.i + 1] ELSE 0 END) AS d8,
       |    SUM(CASE WHEN i.i < 16
       |        THEN t.q[i.i + 1] * p.pq[i.i + 1] ELSE 0 END) AS d16,
       |    SUM(CASE WHEN i.i < 32
       |        THEN t.q[i.i + 1] * p.pq[i.i + 1] ELSE 0 END) AS d32
       |  FROM qt t, probes p, (SELECT unnest(range(0, 64)) AS i) i
       |  WHERE t.vec_id <> p.probe_id GROUP BY 1, 2),
       |rf AS (SELECT probe_id, vec_id, ROW_NUMBER() OVER
       |    (PARTITION BY probe_id ORDER BY d64 DESC, vec_id) AS r
       |  FROM pairs),
       |r8 AS (SELECT probe_id, vec_id, ROW_NUMBER() OVER
       |    (PARTITION BY probe_id ORDER BY d8 DESC, vec_id) AS r
       |  FROM pairs),
       |r16 AS (SELECT probe_id, vec_id, ROW_NUMBER() OVER
       |    (PARTITION BY probe_id ORDER BY d16 DESC, vec_id) AS r
       |  FROM pairs),
       |r32 AS (SELECT probe_id, vec_id, ROW_NUMBER() OVER
       |    (PARTITION BY probe_id ORDER BY d32 DESC, vec_id) AS r
       |  FROM pairs),
       |grid AS (SELECT probe_id, d AS prefix_dims
       |  FROM probes, (SELECT unnest([8, 16, 32]) AS d) g),
       |ov AS (
       |  SELECT rf.probe_id, 8 AS prefix_dims, COUNT(*) AS n_overlap
       |  FROM rf JOIN r8 USING (probe_id, vec_id)
       |  WHERE rf.r <= 10 AND r8.r <= 10 GROUP BY 1
       |  UNION ALL
       |  SELECT rf.probe_id, 16, COUNT(*)
       |  FROM rf JOIN r16 USING (probe_id, vec_id)
       |  WHERE rf.r <= 10 AND r16.r <= 10 GROUP BY 1
       |  UNION ALL
       |  SELECT rf.probe_id, 32, COUNT(*)
       |  FROM rf JOIN r32 USING (probe_id, vec_id)
       |  WHERE rf.r <= 10 AND r32.r <= 10 GROUP BY 1)
       |SELECT g.probe_id, CAST(g.prefix_dims AS BIGINT) AS prefix_dims,
       |  CAST(COALESCE(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
       |  CAST(COALESCE(ov.n_overlap, 0) * 1000 // 10 AS BIGINT) AS recall_pm
       |FROM grid g LEFT JOIN ov USING (probe_id, prefix_dims)
       |ORDER BY probe_id, prefix_dims""".stripMargin

  // -------------------------------------------------------------------
  // sim_rp_recall: RANDOM-PROJECTION (Johnson–Lindenstrauss) recall
  // curve — sim_mrl_recall's DATA-INDEPENDENT twin. MRL prefixes only
  // work when the embedding model was trained coarse-to-fine; when it
  // wasn't, the classic dimensionality cut is a fixed ±1 sign
  // projection (Achlioptas '01): proj[j] = Σ_i sign(j,i)·q[i], using
  // the SAME 16-plane sign matrix the LSH tier already ships
  // ([[Hyperplanes]]) — so this ALSO measures "rank by the LSH sketch
  // directly" instead of bucketing by its sign bits (sim_ann_lsh).
  // Recall@10 of ranking by the 8- and 16-dim projected dot against
  // the full 64-dim ground truth, per probe — the number that decides
  // whether a 4–8× narrower vector (and proportionally narrower
  // shuffle) is safe for the first-pass retrieval tier.
  //
  // Scale shape: identical to sim_mrl_recall — ONE corpus scan, the
  // 16 projection dots are codegen'd integer expressions per row (the
  // sign matrix inlines as literals, nothing joins), probe panel
  // broadcast, all three top-10 lists from ONE bounded-TopK aggregate
  // pass. Projection magnitudes: |q_i| ≤ 10^4+ε ⇒ |proj_j| ≤ ~6.4·10^5
  // ⇒ a 16-term projected dot ≤ ~6.6·10^12 — exact in BIGINT on both
  // engines.
  // -------------------------------------------------------------------
  private def rpRecall(spark: SparkSession, dir: String): DataFrame = {
    val topk = udaf(new graft.functions.TopK.TopKByScore(10))
    val proj = array((0 until Hyperplanes.Planes).map(p =>
      dotLong(col("q"), expr(Hyperplanes.sparkArray(p)))): _*)
    val base = emb(spark, dir).withColumn("q", expr(quantize))
      .select(col("vec_id"), col("q"), proj.as("pj"))
    val probes = base.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("q").as("pq"),
        col("pj").as("ppj"))
    val scored = base.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        dotLong(col("q"), col("pq")).as("d64"),
        dotLong(expr("slice(pj, 1, 8)"), expr("slice(ppj, 1, 8)")).as("dp8"),
        dotLong(col("pj"), col("ppj")).as("dp16"))
    val agg = scored.groupBy("probe_id")
      .agg(topk(col("d64"), col("vec_id")).as("nn64"),
        topk(col("dp8"), col("vec_id")).as("nn8"),
        topk(col("dp16"), col("vec_id")).as("nn16"))
    val guarded = probes.select(col("probe_id"))
      .join(agg, Seq("probe_id"), "left")
    def overlap(c: String) = expr(
      s"CAST(coalesce(size(array_intersect(transform(nn64, w -> w.id), " +
        s"transform($c, w -> w.id))), 0) AS BIGINT)")
    guarded.select(col("probe_id"), explode(array(
        struct(lit(8L).as("proj_dims"), overlap("nn8").as("n_overlap")),
        struct(lit(16L).as("proj_dims"), overlap("nn16").as("n_overlap"))))
        .as("o"))
      .select(col("probe_id"), col("o.proj_dims").as("proj_dims"),
        col("o.n_overlap").as("n_overlap"),
        expr("(o.n_overlap * 1000L) div 10").as("recall_pm"))
      .orderBy("probe_id", "proj_dims")
  }

  private val rpRecallSql = {
    val projList = (0 until Hyperplanes.Planes)
      .map(p => PortableHash.dotSqlDuck("q", Hyperplanes.duckArray(p)))
      .mkString("[", ",\n      ", "]")
    s"""WITH qt AS (SELECT vec_id, $quantizeDuck AS q FROM embeddings),
       |pt AS (SELECT vec_id, q, $projList AS pj FROM qt),
       |probes AS (SELECT vec_id AS probe_id, q AS pq, pj AS ppj FROM pt
       |           WHERE vec_id < 10),
       |pairs AS (SELECT p.probe_id, t.vec_id,
       |    ${PortableHash.dotSqlDuck("t.q", "p.pq")} AS d64,
       |    ${PortableHash.dotSqlDuck(
                "list_slice(t.pj, 1, 8)", "list_slice(p.ppj, 1, 8)")} AS dp8,
       |    ${PortableHash.dotSqlDuck("t.pj", "p.ppj")} AS dp16
       |  FROM pt t, probes p WHERE t.vec_id <> p.probe_id),
       |rf AS (SELECT probe_id, vec_id, ROW_NUMBER() OVER
       |    (PARTITION BY probe_id ORDER BY d64 DESC, vec_id) AS r
       |  FROM pairs),
       |r8 AS (SELECT probe_id, vec_id, ROW_NUMBER() OVER
       |    (PARTITION BY probe_id ORDER BY dp8 DESC, vec_id) AS r
       |  FROM pairs),
       |r16 AS (SELECT probe_id, vec_id, ROW_NUMBER() OVER
       |    (PARTITION BY probe_id ORDER BY dp16 DESC, vec_id) AS r
       |  FROM pairs),
       |grid AS (SELECT probe_id, d AS proj_dims
       |  FROM probes, (SELECT unnest([8, 16]) AS d) g),
       |ov AS (
       |  SELECT rf.probe_id, 8 AS proj_dims, COUNT(*) AS n_overlap
       |  FROM rf JOIN r8 USING (probe_id, vec_id)
       |  WHERE rf.r <= 10 AND r8.r <= 10 GROUP BY 1
       |  UNION ALL
       |  SELECT rf.probe_id, 16, COUNT(*)
       |  FROM rf JOIN r16 USING (probe_id, vec_id)
       |  WHERE rf.r <= 10 AND r16.r <= 10 GROUP BY 1)
       |SELECT g.probe_id, CAST(g.proj_dims AS BIGINT) AS proj_dims,
       |  CAST(COALESCE(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
       |  CAST(COALESCE(ov.n_overlap, 0) * 1000 // 10 AS BIGINT) AS recall_pm
       |FROM grid g LEFT JOIN ov USING (probe_id, proj_dims)
       |ORDER BY probe_id, proj_dims""".stripMargin
  }

  // -------------------------------------------------------------------
  // sim_bucket_drift: EMBEDDING-DISTRIBUTION drift — the vector-side
  // twin of tx_source_tv: split the corpus into two cohorts (even/odd
  // vec_id, standing in for old/new ingest batches), histogram each
  // over the shared 8-plane hyperplane buckets, and report the
  // per-bucket ppm shares plus the total-variation distance between
  // the cohorts in exact ppm. The monitor that catches an embedding
  // model swap or a corpus-composition shift BEFORE ANN recall decays:
  // bucket occupancy is exactly what the LSH/IVF tiers key on, so
  // drift in this histogram IS drift in their performance envelope.
  //
  // Scale shape: one scan → bucket + cohort → ONE map-side-combined
  // aggregate to ≤ 2·256 rows; the TV fold runs over that aggregate.
  // All 256 possible buckets of the 8-plane signature are a bounded
  // output at any corpus size.
  // -------------------------------------------------------------------
  private def bucketDrift(spark: SparkSession, dir: String): DataFrame = {
    val planes = 8
    val e = emb(spark, dir).withColumn("q", expr(quantize))
      .select(pmod(col("vec_id"), lit(2)).as("cohort"),
        bucketCol(planes).as("bucket"))
      .groupBy("cohort", "bucket").agg(count(lit(1)).as("c"))
    val tot = e.groupBy("cohort").agg(sum(col("c")).as("n"))
    val p = e.join(tot, Seq("cohort"))
      .select(col("cohort"), col("bucket"),
        col("c"), expr("(c * 1000000L) div n").as("p_ppm"))
    val a = p.filter(col("cohort") === 0)
      .select(col("bucket"), col("c").as("c0"), col("p_ppm").as("p0"))
    val b = p.filter(col("cohort") === 1)
      .select(col("bucket"), col("c").as("c1"), col("p_ppm").as("p1"))
    a.join(b, Seq("bucket"), "full_outer")
      .na.fill(0L, Seq("c0", "c1", "p0", "p1"))
      .select(col("bucket"), col("c0"), col("c1"), col("p0"), col("p1"),
        abs(col("p0") - col("p1")).as("l1_ppm"))
      .orderBy("bucket")
  }

  private val bucketDriftSql =
    s"""WITH qt AS (SELECT vec_id, $quantizeDuck AS q FROM embeddings),
       |bk AS (SELECT vec_id % 2 AS cohort, ${bucketSqlDuck(8)} AS bucket
       |       FROM qt),
       |h AS (SELECT cohort, bucket, COUNT(*) AS c FROM bk GROUP BY 1, 2),
       |t AS (SELECT cohort, SUM(c) AS n FROM h GROUP BY 1),
       |p AS (SELECT h.cohort, bucket, c,
       |        CAST(c * 1000000 // t.n AS BIGINT) AS p_ppm
       |      FROM h JOIN t ON t.cohort = h.cohort)
       |SELECT COALESCE(a.bucket, b.bucket) AS bucket,
       |  COALESCE(a.c, 0) AS c0, COALESCE(b.c, 0) AS c1,
       |  COALESCE(a.p_ppm, 0) AS p0, COALESCE(b.p_ppm, 0) AS p1,
       |  CAST(ABS(COALESCE(a.p_ppm, 0) - COALESCE(b.p_ppm, 0)) AS BIGINT)
       |    AS l1_ppm
       |FROM (SELECT * FROM p WHERE cohort = 0) a
       |FULL OUTER JOIN (SELECT * FROM p WHERE cohort = 1) b
       |  ON a.bucket = b.bucket
       |ORDER BY bucket""".stripMargin

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
      .withColumn("dot", dotLong(col("q"), col("query_q")))
      .select(col("vec_id"), col("dot"))
      .orderBy(col("dot").desc, col("vec_id").asc)
      .limit(20)
  }

  private val topkQuantizedSql =
    s"""SELECT b.vec_id,
       |  ${PortableHash.dotSqlDuck(
            s"(SELECT $quantizeDuck FROM embeddings WHERE vec_id = 0)",
            "list_transform(b.embedding, v -> CAST(round(CAST(v AS DOUBLE)*10000) AS BIGINT))")} AS dot
       |FROM embeddings b WHERE b.vec_id <> 0
       |ORDER BY dot DESC, vec_id ASC LIMIT 20""".stripMargin

  // -------------------------------------------------------------------
  // sim_topk_cosine: brute-force cosine top-k. Cosine is computed from
  // the quantized integer dot/norms (identical in both engines) and
  // floored to micro-units — raw float accumulation is engine- and
  // order-dependent, so this is the deterministic formulation of the
  // "natural" float query. Oracle-backed.
  // -------------------------------------------------------------------
  private def topkCosine(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir).withColumn("q", expr(quantize))
    val query = e.filter(col("vec_id") === 0).select(col("q").as("query_q"))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(query))
      // fused one-pass scaled cosine (bit-identical to the unfused
      // three-dot form — FusedArrayMathSpec); NULL = zero-norm side,
      // filtered exactly where the old na/nb guard cut
      .withColumn("cosine_e6",
        graft.functions.GraftFunctions.cosineFloor(
          col("q"), col("query_q"), 1000000.0))
      .filter(col("cosine_e6").isNotNull)
      .select(col("vec_id"), col("cosine_e6"))
      .orderBy(col("cosine_e6").desc, col("vec_id").asc)
      .limit(20)
  }

  private val topkCosineSql =
    s"""WITH qt AS (SELECT vec_id, $quantizeDuck AS q FROM embeddings),
       |qq AS (SELECT q FROM qt WHERE vec_id = 0),
       |scored AS (SELECT t.vec_id,
       |    ${PortableHash.dotSqlDuck("t.q", "qq.q")} AS dot,
       |    ${PortableHash.dotSqlDuck("t.q", "t.q")} AS na,
       |    ${PortableHash.dotSqlDuck("qq.q", "qq.q")} AS nb
       |  FROM qt t, qq WHERE t.vec_id <> 0)
       |SELECT vec_id,
       |  CAST(floor(1000000.0 * CAST(dot AS DOUBLE) /
       |    sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))) AS BIGINT) AS cosine_e6
       |FROM scored WHERE na > 0 AND nb > 0
       |ORDER BY cosine_e6 DESC, vec_id ASC LIMIT 20""".stripMargin

  // -------------------------------------------------------------------
  // sim_range_search: the RANGE twin of top-k — every vector whose
  // cosine to the query clears a threshold (radius search: "all
  // near-duplicates of this item", where top-k's fixed k either
  // truncates or pads). Same single-scan broadcast shape and the same
  // deterministic integer cosine as sim_topk_cosine; the predicate is
  // evaluated map-side, so the only data that moves is the matching
  // set — which is the right contract at 100 TB: output ∝ matches,
  // not corpus. Oracle-backed.
  // -------------------------------------------------------------------
  private val RangeThresholdE6 = 200000L // cosine ≥ 0.20

  private def rangeSearch(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir).withColumn("q", expr(quantize))
    val query = e.filter(col("vec_id") === 0).select(col("q").as("query_q"))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(query))
      // fused one-pass scaled cosine; NULL (zero-norm) rows drop at
      // the threshold filter, same rows as the old na/nb guard
      .withColumn("cosine_e6",
        graft.functions.GraftFunctions.cosineFloor(
          col("q"), col("query_q"), 1000000.0))
      .filter(col("cosine_e6") >= RangeThresholdE6)
      .select(col("vec_id"), col("cosine_e6"))
      .orderBy(col("cosine_e6").desc, col("vec_id").asc)
  }

  private val rangeSearchSql =
    s"""WITH qt AS (SELECT vec_id, $quantizeDuck AS q FROM embeddings),
       |qq AS (SELECT q FROM qt WHERE vec_id = 0),
       |scored AS (SELECT t.vec_id,
       |    ${PortableHash.dotSqlDuck("t.q", "qq.q")} AS dot,
       |    ${PortableHash.dotSqlDuck("t.q", "t.q")} AS na,
       |    ${PortableHash.dotSqlDuck("qq.q", "qq.q")} AS nb
       |  FROM qt t, qq WHERE t.vec_id <> 0)
       |SELECT vec_id,
       |  CAST(floor(1000000.0 * CAST(dot AS DOUBLE) /
       |    sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))) AS BIGINT) AS cosine_e6
       |FROM scored WHERE na > 0 AND nb > 0
       |  AND floor(1000000.0 * CAST(dot AS DOUBLE) /
       |    sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))) >= $RangeThresholdE6
       |ORDER BY cosine_e6 DESC, vec_id ASC""".stripMargin

  // -------------------------------------------------------------------
  // the shared physical ANN layout: the 6-plane LSH signature (64
  // cells, sized so cells stay non-trivial at test SF; at 10^9 vectors
  // you'd use 16-20 planes) as a parquet PARTITION column, written once
  // per SF under target/ behind a _SUCCESS check (ingest cost, paid
  // once — same convention as [[ScanPruning.partitionedCustomerPath]]).
  // -------------------------------------------------------------------
  private val BucketedPlanes = 6

  private def annLayoutPath(spark: SparkSession, dir: String): String = {
    // path fingerprints the generator params: changing the plane count
    // or the quantization rebuilds the layout instead of silently
    // reusing a stale one
    val path = FixtureCache.dir("ann_layout", dir,
      "planes" -> BucketedPlanes, "quantize" -> quantize)
    if (!new java.io.File(path, "_SUCCESS").exists()) {
      emb(spark, dir)
        .withColumn("q", expr(quantize))
        .withColumn("bucket", bucketCol(BucketedPlanes))
        .write.mode("overwrite").partitionBy("bucket").parquet(path.toString)
    }
    path.toString
  }

  /** query vector's (quantized vector, bucket) — a driver-side point
    * read of ONE partition-pruned row, not a data loop
    */
  private def queryPoint(indexed: DataFrame): (Array[Long], Any) = {
    val row = indexed.filter(col("vec_id") === 0)
      .select(col("q"), col("bucket")).head()
    (row.getSeq[Long](0).toArray, row.get(1))
  }

  // -------------------------------------------------------------------
  // sim_ann_lsh: MULTI-PROBE ANN over the bucketed layout — the recall
  // knob of partition-pruned ANN. Candidates live in the query's
  // partition plus its `planes` Hamming-1 neighbor partitions; the
  // probe set is a literal partition-filter IN-list, so the scan reads
  // ≤ planes+1 of 2^planes partitions (7 of 64 here) and the corpus is
  // never fully scanned — the full-scan bit_count tier this replaces
  // was the one 100 TB anti-pattern left under the gate. Plan-guarded
  // (PlanShapeSpec "multi-probe ANN"). Oracle-backed: DuckDB replays
  // the same Hamming-≤1 candidate rule arithmetically.
  // -------------------------------------------------------------------
  private def annLsh(spark: SparkSession, dir: String): DataFrame = {
    val indexed = spark.read.parquet(annLayoutPath(spark, dir))
    val (queryQ, queryBucket) = queryPoint(indexed)
    val qb = queryBucket.toString.toLong
    val probeLongs = qb +: (0 until BucketedPlanes).map(i => qb ^ (1L << i))
    // match the inferred partition-column type so the IN-list stays a
    // partition filter (a cast on the partition attribute defeats
    // pruning)
    val probes: Seq[Any] = queryBucket match {
      case _: java.lang.Integer => probeLongs.map(_.toInt)
      case _                    => probeLongs
    }
    indexed
      .filter(col("bucket").isin(probes: _*)) // partition-filter IN-list
      .filter(col("vec_id") =!= 0)
      .withColumn("query_q", lit(queryQ))
      .withColumn("dot", dotLong(col("q"), col("query_q")))
      .select(col("vec_id"), col("dot"))
      .orderBy(col("dot").desc, col("vec_id").asc)
      .limit(20)
  }

  private val annLshSql =
    s"""WITH qt AS (SELECT vec_id, $quantizeDuck AS q FROM embeddings),
       |sig AS (SELECT vec_id, q, ${bucketSqlDuck(BucketedPlanes)} AS bucket FROM qt),
       |qq AS (SELECT q, bucket FROM sig WHERE vec_id = 0)
       |SELECT s.vec_id,
       |  ${PortableHash.dotSqlDuck("s.q", "qq.q")} AS dot
       |FROM sig s, qq
       |WHERE s.vec_id <> 0 AND bit_count(xor(s.bucket, qq.bucket)) <= 1
       |ORDER BY dot DESC, vec_id ASC LIMIT 20""".stripMargin

  // -------------------------------------------------------------------
  // sim_ann_bucketed: single-probe ANN over the same layout — the
  // query computes its probe key and reads exactly ONE partition;
  // `.explain` shows PartitionFilters, not a post-scan filter.
  // Oracle-backed.
  // -------------------------------------------------------------------
  private def annBucketed(spark: SparkSession, dir: String): DataFrame = {
    val indexed = spark.read.parquet(annLayoutPath(spark, dir))
    val (queryQ, queryBucket) = queryPoint(indexed)
    indexed
      .filter(col("bucket") === queryBucket) // partition pruning
      .filter(col("vec_id") =!= 0)
      .withColumn("query_q", lit(queryQ))
      .withColumn("dot", dotLong(col("q"), col("query_q")))
      .select(col("vec_id"), col("dot"))
      .orderBy(col("dot").desc, col("vec_id").asc)
      .limit(20)
  }

  private val annBucketedSql =
    s"""WITH qt AS (SELECT vec_id, $quantizeDuck AS q FROM embeddings),
       |sig AS (SELECT vec_id, q, ${bucketSqlDuck(BucketedPlanes)} AS bucket FROM qt),
       |qq AS (SELECT q, bucket FROM sig WHERE vec_id = 0)
       |SELECT s.vec_id,
       |  ${PortableHash.dotSqlDuck("s.q", "qq.q")} AS dot
       |FROM sig s, qq
       |WHERE s.vec_id <> 0 AND s.bucket = qq.bucket
       |ORDER BY dot DESC, vec_id ASC LIMIT 20""".stripMargin

  // -------------------------------------------------------------------
  // sim_ivf_label: IVF-style coarse quantization demo — centroids from
  // a groupBy (the label partition stands in for k-means cells);
  // probe = nearest centroid, search only that cell. The plan shape
  // (centroid broadcast + cell-pruned scan) is the 100 TB IVF path.
  // Centroid components use floor(avg(..)) — Spark's double→long cast
  // truncates while DuckDB's rounds, so the floor is explicit in both.
  // Oracle-backed.
  // -------------------------------------------------------------------
  private def ivfLabel(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir).withColumn("q", expr(quantize))

    val cent = e.groupBy("label")
      .agg(array((0 until 64).map(d =>
        floor(avg(col("q").getItem(d))).cast("long")): _*).as("centroid"))

    val query = e.filter(col("vec_id") === 0).select(col("q").as("query_q"))

    // nearest centroid to the query (broadcast both tiny sides)
    val probe = cent.crossJoin(broadcast(query))
      .withColumn("cdot", dotLong(col("centroid"), col("query_q")))
      .orderBy(col("cdot").desc, col("label").asc)
      .limit(1)
      .select(col("label").as("probe_label"), col("query_q"))

    // search only the probed cell
    e.filter(col("vec_id") =!= 0)
      .join(broadcast(probe), col("label") === col("probe_label"))
      .withColumn("dot", dotLong(col("q"), col("query_q")))
      .select(col("vec_id"), col("label"), col("dot"))
      .orderBy(col("dot").desc, col("vec_id").asc)
      .limit(20)
  }

  private val ivfLabelSql: String = {
    val centroid = (0 until 64)
      .map(d => s"CAST(floor(avg(q[${d + 1}])) AS BIGINT)")
      .mkString("[", ", ", "]")
    s"""WITH qt AS (SELECT vec_id, label, $quantizeDuck AS q FROM embeddings),
       |cent AS (SELECT label, $centroid AS centroid FROM qt GROUP BY label),
       |qq AS (SELECT q FROM qt WHERE vec_id = 0),
       |probe AS (SELECT c.label AS probe_label FROM cent c, qq
       |  ORDER BY ${PortableHash.dotSqlDuck("c.centroid", "qq.q")} DESC, c.label ASC LIMIT 1)
       |SELECT t.vec_id, t.label,
       |  ${PortableHash.dotSqlDuck("t.q", "qq.q")} AS dot
       |FROM qt t, qq, probe p
       |WHERE t.label = p.probe_label AND t.vec_id <> 0
       |ORDER BY dot DESC, vec_id ASC LIMIT 20""".stripMargin
  }

  // -------------------------------------------------------------------
  // sim_kmeans_assign: real Lloyd's k-means over the quantized
  // embeddings (the IVF cell builder sim_ivf_label stands in for) —
  // deterministic end to end: init = the vectors of vec_id 0..K-1,
  // L2² distance in exact integer math (‖q‖² − 2·q·c + ‖c‖², three
  // dotLong calls), argmin tie-broken by centroid id, centroids
  // recomputed as per-dimension floor(avg). Two refinement rounds,
  // then the final assignment is emitted.
  //
  // The Spark shape is the one that scales (and is what Spark ML's
  // KMeans does underneath): centroids BROADCAST to every task, the
  // assignment argmin is a map-side partial `min(struct(dist, cid))`
  // aggregate (only one row per vector ever shuffles), and the driver
  // sees exactly K×64 integers per round. Empty clusters drop out in
  // both engines identically. Oracle: the same two rounds unrolled as
  // generated SQL.
  // -------------------------------------------------------------------
  /** K scales with the corpus: k = clamp(8, ⌈√n⌉, 4096). SemDeDup's
    * prune cost is Σ cᵢ² ≈ n²/k, so a FIXED k degenerates toward
    * all-pairs as n grows; k ≈ √n keeps expected per-cluster pair work
    * ≈ n (linear) while the centroid table stays broadcast-sized
    * (cap 4096 × 64 longs = 2 MB — the paper's k≈100k on LAION obeys
    * the same "k grows with n, centroids stay tiny" shape). Both
    * engines derive k from the same count with the same IEEE
    * ceil(sqrt(n)) — sqrt is correctly rounded, so they agree exactly.
    */
  private val KmKFloor = 8L
  private val KmKCap = 4096L
  private[ops] def kmK(n: Long): Long =
    math.min(KmKCap, math.max(KmKFloor, math.ceil(math.sqrt(n.toDouble)).toLong))
  private val kmKSqlDuck =
    s"(SELECT LEAST($KmKCap, GREATEST($KmKFloor, CAST(ceil(sqrt(count(*))) AS BIGINT))) FROM embeddings)"
  private val KmRefines = 2

  private def kmeansAssign(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = emb(spark, dir).withColumn("q", expr(quantize))
      .select(col("vec_id"), col("q")).persist()
    val k = kmK(e.count())

    def assign(cents: Seq[(Long, Seq[Long])]): DataFrame = {
      val centDf = cents.toDF("cid", "cvec")
      e.crossJoin(broadcast(centDf))
        // fused one-pass Σ(q_i−c_i)² — exact long arithmetic, equal to
        // the q·q − 2·q·c + c·c expansion (FusedArrayMathSpec)
        .withColumn("dist",
          graft.functions.GraftFunctions.l2sqLong(col("q"), col("cvec")))
        .groupBy("vec_id")
        .agg(min(struct(col("dist"), col("cid"))).as("m"))
        .select(col("vec_id"), col("m.cid").as("cluster"), col("m.dist").as("dist"))
    }

    def recompute(assigned: DataFrame): Seq[(Long, Seq[Long])] =
      assigned.join(e, "vec_id")
        .groupBy("cluster")
        .agg(array((0 until 64).map(d =>
          floor(avg(col("q").getItem(d))).cast("long")): _*).as("cvec"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1)))
        .sortBy(_._1).toSeq

    var cents: Seq[(Long, Seq[Long])] = e.filter(col("vec_id") < k)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq
    (1 to KmRefines).foreach { _ => cents = recompute(assign(cents)) }

    val out = assign(cents).orderBy("vec_id").localCheckpoint()
    e.unpersist()
    out
  }

  private val kmAssignCache = SubstrateCache.frame("embeddings.parquet")

  /** The final k-means assignment as a SESSION substrate: Lloyd's runs
    * once per (application, SF dir, fixture generation) and the
    * localCheckpoint'ed (vec_id, cluster, dist) table serves both
    * `sim_kmeans_assign` and the cluster-bounded semantic dedup
    * (`dd_semdedup`) — the SemDeDup recipe's step 1 is exactly this
    * clustering, so sharing it mirrors how a production pipeline
    * amortizes the k-means pass across every downstream cluster-local
    * operator.
    */
  private[ops] def kmeansAssigned(spark: SparkSession, dir: String): DataFrame =
    kmAssignCache.get(spark, dir) { kmeansAssign(spark, dir) }

  /** Quantized embedding table (vec_id, q) — shared with Dedup's
    * cluster-local pair scoring so both sides quantize identically.
    */
  private[ops] def quantized(spark: SparkSession, dir: String): DataFrame =
    emb(spark, dir).withColumn("q", expr(quantize)).select(col("vec_id"), col("q"))

  /** The k-means oracle replay, exposed so dd_semdedup's oracle embeds
    * the identical clustering as a derived table.
    */
  private[ops] def kmeansAssignOracle: String = kmeansAssignSql

  private val kmeansAssignSql: String = {
    val centroid = (0 until 64)
      .map(d => s"CAST(floor(avg(t.q[${d + 1}])) AS BIGINT)")
      .mkString("[", ", ", "]")
    def assignCte(name: String, centsCte: String) =
      s"""$name AS (
         |  SELECT vec_id, cid, dist, ROW_NUMBER() OVER
         |      (PARTITION BY vec_id ORDER BY dist, cid) AS rn
         |  FROM (SELECT t.vec_id, c.cid,
         |          ${PortableHash.dotSqlDuck("t.q", "t.q")}
         |          - 2 * ${PortableHash.dotSqlDuck("t.q", "c.cvec")}
         |          + ${PortableHash.dotSqlDuck("c.cvec", "c.cvec")} AS dist
         |        FROM qt t, $centsCte c) d)""".stripMargin
    def recomputeCte(name: String, assignCteName: String) =
      s"""$name AS (
         |  SELECT a.cid, $centroid AS cvec
         |  FROM $assignCteName a JOIN qt t USING (vec_id)
         |  WHERE a.rn = 1 GROUP BY a.cid)""".stripMargin
    val rounds = (1 to KmRefines).map(i =>
      assignCte(s"a$i", if (i == 1) "c0" else s"c${i - 1}") + ",\n" +
        recomputeCte(s"c$i", s"a$i")).mkString(",\n")
    s"""WITH qt AS (SELECT vec_id, $quantizeDuck AS q FROM embeddings),
       |c0 AS (SELECT vec_id AS cid, q AS cvec FROM qt WHERE vec_id < $kmKSqlDuck),
       |$rounds,
       |${assignCte("afinal", s"c$KmRefines")}
       |SELECT vec_id, CAST(cid AS BIGINT) AS cluster, dist
       |FROM afinal WHERE rn = 1 ORDER BY vec_id""".stripMargin
  }

  // -------------------------------------------------------------------
  // sim_ann_recall: recall@20 of BOTH ANN tiers against the exact
  // brute-force top-20 — the eval loop every production ANN deployment
  // runs to tune planes/probes. One row carries the measured
  // probe-count/recall trade-off as data: the 7-probe multi-probe tier
  // (query bucket + Hamming-1 neighbors) and the 1-probe single-bucket
  // tier, hits = |ANN ∩ exact|, recall_pm = hits/20 in permille.
  // Multi-probe recall is ≥ single-probe by construction (its
  // candidate set is a superset). Oracle recomputes all three tiers in
  // DuckDB.
  // -------------------------------------------------------------------
  private def annRecall(spark: SparkSession, dir: String): DataFrame = {
    val exact = topkQuantized(spark, dir).select(col("vec_id")).persist()
    def hits(ann: DataFrame) =
      exact.join(ann.select(col("vec_id")), Seq("vec_id"), "left_semi")
        .agg(count(lit(1)).as("h"))
    val out = hits(annLsh(spark, dir)).select(col("h").as("hits_multi"))
      .crossJoin(hits(annBucketed(spark, dir)).select(col("h").as("hits_single")))
      .select(
        col("hits_multi"),
        (col("hits_multi") * lit(50)).cast("long").as("recall_multi_pm"),
        col("hits_single"),
        (col("hits_single") * lit(50)).cast("long").as("recall_single_pm"))
      .localCheckpoint()
    exact.unpersist()
    out
  }

  private val annRecallSql =
    s"""WITH exact20 AS ($topkQuantizedSql),
       |multi20 AS ($annLshSql),
       |single20 AS ($annBucketedSql),
       |hm AS (SELECT CAST(count(*) AS BIGINT) AS hits_multi
       |  FROM exact20 WHERE vec_id IN (SELECT vec_id FROM multi20)),
       |hs AS (SELECT CAST(count(*) AS BIGINT) AS hits_single
       |  FROM exact20 WHERE vec_id IN (SELECT vec_id FROM single20))
       |SELECT hits_multi, CAST(hits_multi * 50 AS BIGINT) AS recall_multi_pm,
       |  hits_single, CAST(hits_single * 50 AS BIGINT) AS recall_single_pm
       |FROM hm, hs""".stripMargin

  // -------------------------------------------------------------------
  // sim_pair_hist: distribution of pairwise similarities on a
  // deterministic keyed-hash sample — the diagnostic run before
  // choosing a near-dup threshold (where does the corpus's similarity
  // mass sit?). The hash sample (≈10%) makes the O(s²) pair space
  // tractable and REPRODUCIBLE (same vectors every run, unlike
  // `.sample()`); pairs form by broadcasting the sampled side against
  // itself with the a<b canonicalization, dots are the codegen'd
  // integer dot product, and bins shift by +2e8 before the integer
  // divide so negative cosines can't hit trunc-vs-floor division
  // asymmetry. Bin width 1e7 ≈ 0.1 cosine.
  // -------------------------------------------------------------------
  private def pairHist(spark: SparkSession, dir: String): DataFrame = {
    val s = emb(spark, dir).withColumn("q", expr(quantize))
      .filter(pmod(PortableHash.hashCol(concat(lit("pairs:"), col("vec_id"))),
        lit(10)) === 0)
      .select(col("vec_id"), col("q"))
    val b = s.select(col("vec_id").as("vb"), col("q").as("qb"))
    s.join(broadcast(b), col("vec_id") < col("vb"))
      .select(dotLong(col("q"), col("qb")).as("dot"))
      .select(expr("(dot + 200000000) div 10000000").as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"))
      .select(col("bin"), ((col("bin") - 20) * 10000000L).as("lo_dot"), col("n"))
      .orderBy("bin")
  }

  private val pairHistSql = {
    val h = PortableHash.hashSql("'pairs:' || CAST(vec_id AS VARCHAR)")
    s"""WITH s AS (
       |  SELECT vec_id, $quantizeDuck AS q FROM embeddings
       |  WHERE ($h) % 10 = 0),
       |p AS (
       |  SELECT ${PortableHash.dotSqlDuck("a.q", "b.q")} AS dot
       |  FROM s a JOIN s b ON a.vec_id < b.vec_id),
       |bins AS (
       |  SELECT (dot + 200000000) // 10000000 AS bin FROM p)
       |SELECT CAST(bin AS BIGINT) AS bin,
       |  CAST((bin - 20) * 10000000 AS BIGINT) AS lo_dot, COUNT(*) AS n
       |FROM bins GROUP BY bin ORDER BY 1""".stripMargin
  }

  // -------------------------------------------------------------------
  // sim_silhouette: embedding-space cluster diagnostics — for every
  // vector, squared L2 to its OWN label centroid vs the nearest OTHER
  // label centroid, reported per label as (count, how many vectors sit
  // closer to a foreign centroid, total separation margin). This is
  // the silhouette-style health check run before trusting labels for
  // IVF cells or stratified sampling. All arithmetic is the exact
  // integer form (quantized vectors, floor(avg) centroids, three
  // codegen'd dotLong calls per pair) → bit-exact cross-engine.
  // Plan shape: centroids are a K×64 table BROADCAST to every task;
  // per-vector work is map-side; only (vec, label, 2 longs) rows reach
  // the two hash aggregates. Scan-bounded at any corpus size.
  // -------------------------------------------------------------------
  private def silhouette(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir).withColumn("q", expr(quantize))
    val cent = e.groupBy("label")
      .agg(array((0 until 64).map(d =>
        floor(avg(col("q").getItem(d))).cast("long")): _*).as("cvec"))
      .select(col("label").as("c_label"), col("cvec"))
    e.crossJoin(broadcast(cent))
      // fused one-pass squared-L2 (same exact longs as the expansion)
      .withColumn("dist",
        graft.functions.GraftFunctions.l2sqLong(col("q"), col("cvec")))
      .groupBy("vec_id", "label")
      .agg(
        min(when(col("c_label") === col("label"), col("dist"))).as("d_own"),
        min(when(col("c_label") =!= col("label"), col("dist"))).as("d_other"))
      .groupBy("label")
      .agg(
        count(lit(1)).as("n_vecs"),
        sum(when(col("d_other") < col("d_own"), 1L).otherwise(0L)).as("n_confused"),
        sum(col("d_other") - col("d_own")).as("margin_sum"))
      .orderBy("label")
  }

  private val silhouetteSql: String = {
    val centroid = (0 until 64)
      .map(d => s"CAST(floor(avg(q[${d + 1}])) AS BIGINT)")
      .mkString("[", ", ", "]")
    s"""WITH qt AS (SELECT vec_id, label, $quantizeDuck AS q FROM embeddings),
       |cent AS (SELECT label AS c_label, $centroid AS cvec FROM qt GROUP BY label),
       |p AS (SELECT t.vec_id, t.label, c.c_label,
       |    ${PortableHash.dotSqlDuck("t.q", "t.q")}
       |    - 2 * ${PortableHash.dotSqlDuck("t.q", "c.cvec")}
       |    + ${PortableHash.dotSqlDuck("c.cvec", "c.cvec")} AS dist
       |  FROM qt t, cent c),
       |d AS (SELECT vec_id, label,
       |    MIN(CASE WHEN c_label = label THEN dist END) AS d_own,
       |    MIN(CASE WHEN c_label <> label THEN dist END) AS d_other
       |  FROM p GROUP BY 1, 2)
       |SELECT label, COUNT(*) AS n_vecs,
       |  CAST(SUM(CASE WHEN d_other < d_own THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_confused,
       |  CAST(SUM(d_other - d_own) AS BIGINT) AS margin_sum
       |FROM d GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // -------------------------------------------------------------------
  // sim_knn_batch: the BATCH-query shape — Q probe vectors broadcast,
  // ONE corpus scan serves all probes (per-query scans multiply the
  // dominant cost Q-fold). Per-probe top-k runs through the
  // [[graft.functions.TopK.TopKByScore]] typed Aggregator: the buffer
  // is the k-bounded candidate list, so map-side partial aggregation
  // sends at most k rows per (probe × input partition) into the
  // shuffle — the window/row_number formulation would shuffle EVERY
  // scored row to Q reducers (here Q=5: five hot reducers at any
  // scale). Integer-quantized dot products → oracle-exact; the oracle
  // is the window formulation in DuckDB, so the two formulations must
  // agree row-for-row.
  // -------------------------------------------------------------------
  private val KnnProbes = 5
  private val KnnK = 3

  private def knnBatch(spark: SparkSession, dir: String): DataFrame = {
    val topk = udaf(new graft.functions.TopK.TopKByScore(KnnK))
    val e = emb(spark, dir).withColumn("q", expr(quantize))
    val probes = e.filter(col("vec_id") < KnnProbes)
      .select(col("vec_id").as("probe_id"), col("q").as("probe_q"))
    e.filter(col("vec_id") >= KnnProbes)
      .crossJoin(broadcast(probes))
      .select(col("probe_id"),
        dotLong(col("q"), col("probe_q")).as("dot"), col("vec_id"))
      .groupBy("probe_id")
      .agg(topk(col("dot"), col("vec_id")).as("nn"))
      .select(col("probe_id"), posexplode(col("nn")))
      .select(col("probe_id"), (col("pos") + 1).cast("long").as("rk"),
        col("col.id").as("vec_id"), col("col.score").as("dot"))
      .orderBy("probe_id", "rk")
  }

  private val knnBatchSql =
    s"""WITH qt AS (SELECT vec_id, $quantizeDuck AS q FROM embeddings),
       |probes AS (SELECT vec_id AS probe_id, q AS pq FROM qt
       |           WHERE vec_id < $KnnProbes),
       |scored AS (
       |  SELECT p.probe_id, t.vec_id,
       |    ${PortableHash.dotSqlDuck("t.q", "p.pq")} AS dot
       |  FROM qt t, probes p WHERE t.vec_id >= $KnnProbes)
       |SELECT probe_id, CAST(rk AS BIGINT) AS rk, vec_id, CAST(dot AS BIGINT) AS dot
       |FROM (SELECT probe_id, vec_id, dot,
       |        ROW_NUMBER() OVER (PARTITION BY probe_id
       |          ORDER BY dot DESC, vec_id ASC) AS rk
       |      FROM scored) r
       |WHERE rk <= $KnnK ORDER BY probe_id, rk""".stripMargin

  // -------------------------------------------------------------------
  // sim_label_knn_acc: the EMBEDDING-SPACE LABEL audit — kNN
  // classification accuracy against the fixture's label column, the
  // end-to-end number that says whether a space encodes the structure
  // users will query for BEFORE an index is built on it. A 1-in-50
  // probe panel is classified by the majority label of its 10 nearest
  // neighbors (quantized dot space, self excluded); per-class
  // accuracy in exact permille. The recall@k family (sim_ann_recall,
  // sim_pq_recall) measures index tiers AGAINST brute force; this
  // measures the space against ground truth — together they separate
  // "the index is lossy" from "the embeddings are". On THIS fixture
  // the audit correctly reports ~chance accuracy (measured
  // within-label mean cosine 0.0016 vs 0.0003 between — the synthetic
  // vectors carry almost no label signal), which is precisely the
  // failure this table exists to catch early.
  //
  // Scale shape: the panel broadcasts into ONE corpus scan; top-10
  // per probe via the TopK typed aggregator (per-group map-side heaps
  // capped at k rows per mapper — never a per-probe sort); neighbor
  // labels attach by an id-keyed join of the k·|panel| winner rows
  // (tiny); the vote/argmax windows run over ≤ |panel|·k rows.
  // -------------------------------------------------------------------
  private val AccK = 10

  private def labelKnnAcc(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val topk = udaf(new graft.functions.TopK.TopKByScore(AccK))
    val e = emb(spark, dir).withColumn("q", expr(quantize))
    val probes = e.filter(pmod(col("vec_id"), lit(50)) === 0)
      .select(col("vec_id").as("probe_id"), col("q").as("probe_q"),
        col("label").cast("long").as("true_label"))
    val nn = e.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"),
        dotLong(col("q"), col("probe_q")).as("dot"), col("vec_id"))
      .groupBy("probe_id")
      .agg(topk(col("dot"), col("vec_id")).as("nn"))
      .select(col("probe_id"), explode(col("nn")).as("w"))
      .select(col("probe_id"), col("w.id").as("vec_id"))
      .join(e.select(col("vec_id"), col("label").cast("long").as("nl")),
        "vec_id")
    val byVotes = Window.partitionBy("probe_id")
      .orderBy(col("cnt").desc, col("nl").asc)
    val pred = nn.groupBy("probe_id", "nl")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(byVotes))
      .filter(col("rk") === 1)
      .select(col("probe_id"), col("nl").as("pred_label"))
    pred.join(probes.select(col("probe_id"), col("true_label")), "probe_id")
      .groupBy(col("true_label").as("label"))
      .agg(count(lit(1)).as("n_probes"),
        sum((col("pred_label") === col("true_label")).cast("long"))
          .as("n_correct"))
      .withColumn("acc_pm", expr("(1000 * n_correct) div n_probes"))
      .orderBy("label")
  }

  private val labelKnnAccSql =
    s"""WITH qt AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
       |    $quantizeDuck AS q FROM embeddings),
       |probes AS (SELECT vec_id AS probe_id, q AS pq,
       |    label AS true_label FROM qt WHERE vec_id % 50 = 0),
       |scored AS (SELECT p.probe_id, t.vec_id, t.label AS nl,
       |    ${PortableHash.dotSqlDuck("t.q", "p.pq")} AS dot
       |  FROM qt t, probes p WHERE t.vec_id <> p.probe_id),
       |nn AS (SELECT probe_id, nl FROM (
       |    SELECT probe_id, nl, ROW_NUMBER() OVER (PARTITION BY probe_id
       |      ORDER BY dot DESC, vec_id ASC) AS rk
       |    FROM scored) r WHERE rk <= $AccK),
       |votes AS (SELECT probe_id, nl, COUNT(*) AS cnt FROM nn GROUP BY 1, 2),
       |pred AS (SELECT probe_id, nl AS pred_label FROM (
       |    SELECT probe_id, nl, ROW_NUMBER() OVER (PARTITION BY probe_id
       |      ORDER BY cnt DESC, nl ASC) AS rk
       |    FROM votes) v WHERE rk = 1)
       |SELECT p.true_label AS label, COUNT(*) AS n_probes,
       |  CAST(SUM(CASE WHEN pr.pred_label = p.true_label THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_correct,
       |  CAST((1000 * SUM(CASE WHEN pr.pred_label = p.true_label
       |    THEN 1 ELSE 0 END)) // COUNT(*) AS BIGINT) AS acc_pm
       |FROM pred pr JOIN probes p ON pr.probe_id = p.probe_id
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------------------
  // sim_quantize_audit: INT8 VECTOR COMPRESSION audit — the 4× memory/
  // bandwidth step every embedding store takes (float32 → int8) before
  // serving at scale, plus the question that decides whether it's safe:
  // how much error does it add? The e4 fixed-point vectors (the
  // engine's exact representation) are re-quantized to e2 with ±127
  // clamping (= int8 range); the reconstruction error is then an EXACT
  // integer per element, aggregated per label: total/max error and the
  // clamp count (values beyond ±1.27 saturate — the audit's red flag).
  // One scan, per-row array math, a label-sized aggregate. The same
  // fixed-scale idiom as the quantized similarity tier, so the audit
  // numbers speak for those queries' int8 variants directly.
  // -------------------------------------------------------------------
  private def quantizeAudit(spark: SparkSession, dir: String): DataFrame =
    emb(spark, dir)
      .withColumn("q", expr(quantize))
      .withColumn("q8", expr(
        """transform(q, x -> greatest(CAST(-127 AS BIGINT),
          |  least(CAST(127 AS BIGINT), CAST(round(x / 100.0D) AS BIGINT))))"""
          .stripMargin))
      .select(col("label").cast("long").as("label"),
        expr("aggregate(zip_with(q, q8, (a, b) -> abs(a - b * 100)), 0L, (s, v) -> s + v)")
          .as("vec_err"),
        expr("array_max(zip_with(q, q8, (a, b) -> abs(a - b * 100)))")
          .as("vec_max_err"),
        // boundary is INCLUSIVE: x = ±12750 rounds to ±128, which IS
        // saturated to ±127 (its error shows in sum_err_e4)
        expr("aggregate(q, 0L, (s, x) -> s + CASE WHEN abs(x) >= 12750 THEN 1 ELSE 0 END)")
          .as("n_clamped"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("vec_err")).as("sum_err_e4"),
        max(col("vec_max_err")).as("max_err_e4"),
        sum(col("n_clamped")).as("n_clamped"))
      .orderBy("label")

  private val quantizeAuditSql =
    s"""WITH q AS (SELECT label, $quantizeDuck AS q FROM embeddings),
       |p AS (SELECT label,
       |    list_transform(q, x -> greatest(CAST(-127 AS BIGINT),
       |      least(CAST(127 AS BIGINT), CAST(round(x / 100.0) AS BIGINT)))) AS q8,
       |    q
       |  FROM q),
       |e AS (SELECT label,
       |    CAST(list_sum(list_transform(list_zip(q, q8),
       |      zz -> abs(zz[1] - zz[2] * 100))) AS BIGINT) AS vec_err,
       |    CAST(list_max(list_transform(list_zip(q, q8),
       |      zz -> abs(zz[1] - zz[2] * 100))) AS BIGINT) AS vec_max_err,
       |    CAST(list_sum(list_transform(q,
       |      x -> CASE WHEN abs(x) >= 12750 THEN 1 ELSE 0 END)) AS BIGINT)
       |      AS n_clamped
       |  FROM p)
       |SELECT CAST(label AS BIGINT) AS label, COUNT(*) AS n_vecs,
       |  CAST(SUM(vec_err) AS BIGINT) AS sum_err_e4,
       |  CAST(MAX(vec_max_err) AS BIGINT) AS max_err_e4,
       |  CAST(SUM(n_clamped) AS BIGINT) AS n_clamped
       |FROM e GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------------------
  // sim_pq_topk / sim_pq_recall: PRODUCT QUANTIZATION — the vector-
  // compression tier that makes 100 TB-scale ANN fit in memory. The
  // 64-dim vector splits into M=8 subvectors of 8 dims; each subspace
  // gets a K=16-entry codebook (deterministically SAMPLED centroids —
  // subvectors of the vec_ids j·31 mod N — so both engines build the
  // identical codebook with no iterative training to replay); every
  // corpus vector is then stored as 8 four-bit codes — 8 bytes instead
  // of 256, a 32× compression. A query never touches the raw corpus:
  // it builds a 128-entry lookup table (its own squared L2 to every
  // centroid, the "asymmetric distance" of Jégou et al.), and each
  // candidate's approximate distance is 8 LUT additions over its
  // codes. All arithmetic is exact integer micro-units (squared
  // distances of quantized vectors — no division, no floats), so the
  // DuckDB oracle replays codebook, encoding, LUT and ranking
  // bit-for-bit. Scale shape: the codebook (128 subvectors) and LUT
  // (128 longs) broadcast; the only per-vector state that moves is the
  // 8-code row — the raw vectors are read once at index build and
  // never again.
  // -------------------------------------------------------------------
  private val PqM = 8       // subspaces
  private val PqD = 8       // dims per subspace
  private val PqK = 16      // centroids per subspace (4-bit codes)
  private val PqRounds = 2  // Lloyd refinement rounds per subspace

  /** (vec_id, s, xs): quantized subvector s of every corpus vector */
  private def pqSub(e: DataFrame): DataFrame =
    e.select(col("vec_id"),
      posexplode(expr(
        s"transform(sequence(0, ${PqM - 1}), s -> slice(q, s * $PqD + 1, $PqD))"))
        .as(Seq("s", "xs")))

  /** squared L2 of every (vector subspace, centroid) pair — the shared
    * scoring kernel for assignment, encoding and the ADC lookup table
    */
  private def pqScore(sub: DataFrame, cb: DataFrame): DataFrame =
    sub.join(broadcast(cb), "s")
      .withColumn("d",
        dotLong(col("xs"), col("xs")) - lit(2) * dotLong(col("xs"), col("c")) +
          dotLong(col("c"), col("c")))

  /** argmin centroid per (vec_id, s): ties to the smaller code — min
    * over (d, j) structs is the lexicographic tie-break both engines
    * share
    */
  private def pqAssign(scored: DataFrame): DataFrame =
    scored.groupBy("vec_id", "s")
      .agg(min(struct(col("d"), col("j"))).as("m"))
      .select(col("vec_id"), col("s"), col("m").getField("j").as("code"))

  /** Trained per-subspace codebook (s, j, c): deterministically SAMPLED
    * init (subvectors of vec_ids j·31 mod N) plus [[PqRounds]] Lloyd
    * refinements — assign every subvector to its nearest centroid,
    * recompute each centroid as the per-dimension floor(avg) of its
    * members (exact in both engines; empty clusters keep the previous
    * centroid). No randomness, no driver-side training state: the
    * oracle replays the identical rounds.
    */
  private def pqCodebook(spark: SparkSession, e: DataFrame): DataFrame = {
    val n = e.count() // one scalar action: the corpus size, for sampling
    val cbIds = spark.range(PqK)
      .select(col("id").as("j"), (col("id") * 31 % n).as("vec_id"))
    val cb0 = e.join(broadcast(cbIds), "vec_id")
      .select(col("j"),
        posexplode(expr(
          s"transform(sequence(0, ${PqM - 1}), s -> slice(q, s * $PqD + 1, $PqD))"))
          .as(Seq("s", "c")))
    val sub = pqSub(e)
    def refine(cb: DataFrame): DataFrame = {
      val members = pqAssign(pqScore(sub, cb)).join(sub, Seq("vec_id", "s"))
      val recomputed = members.groupBy(col("s").as("rs"), col("code").as("rj"))
        .agg(array((0 until PqD).map(d =>
          floor(avg(element_at(col("xs"), d + 1))).cast("long")): _*).as("c1"))
      cb.join(broadcast(recomputed),
          cb("s") === col("rs") && cb("j") === col("rj"), "left")
        .select(cb("s"), cb("j"), coalesce(col("c1"), cb("c")).as("c"))
    }
    (1 to PqRounds).foldLeft(cb0)((cb, _) => refine(cb))
  }

  /** the ADC ranking pipeline over a scored table: encode, broadcast
    * the query's 128-entry LUT, rank by summed lookups, top `k`
    */
  private def pqAdcFrame(scored: DataFrame, k: Int): DataFrame = {
    val codes = pqAssign(scored)
    // aliased to break the shared lineage with `codes` — both derive
    // from `scored`, and unaliased column refs would resolve ambiguously
    val lut = scored.filter(col("vec_id") === 0)
      .select(col("s").as("ls"), col("j").as("lj"), col("d"))
    codes.filter(col("vec_id") =!= 0)
      .join(broadcast(lut),
        col("s") === col("ls") && col("code") === col("lj"))
      .groupBy("vec_id")
      .agg(sum(col("d")).as("adc_dist"))
      .orderBy(col("adc_dist").asc, col("vec_id").asc)
      .limit(k)
  }

  private val pqCandCache = SubstrateCache.frame("embeddings.parquet")
  private val adcAllCache = SubstrateCache.frame("embeddings.parquet")

  /** The COMPLETE ADC index image — (vec_id, adc_dist, label) for every
    * corpus vector — as a SESSION substrate: codebook training + corpus
    * encoding + LUT ranking run once per (application, SF dir). This is
    * what a deployed IVFADC index persists (8 code bytes + cell id per
    * vector); sim_ivfpq_recall reads it per probe point and
    * [[pqCandidates]] takes its PqCand-deep head, so no PQ consumer
    * ever retrains per call — the same discipline as Graph.pairCounts /
    * Dedup.minhashPairs / MinHashLsh.frozenIndex.
    */
  private[ops] def adcAllOf(spark: SparkSession, dir: String): DataFrame =
    adcAllCache.get(spark, dir) {
      val e = emb(spark, dir).withColumn("q", expr(quantize))
        .select("vec_id", "label", "q").persist()
      val scored = pqScore(pqSub(e), pqCodebook(spark, e)).persist()
      val lut = scored.filter(col("vec_id") === 0)
        .select(col("s").as("ls"), col("j").as("lj"), col("d"))
      val out = pqAssign(scored).filter(col("vec_id") =!= 0)
        .join(broadcast(lut),
          col("s") === col("ls") && col("code") === col("lj"))
        .groupBy("vec_id")
        .agg(sum(col("d")).as("adc_dist"))
        .join(e.select("vec_id", "label"), "vec_id")
        .localCheckpoint()
      scored.unpersist(); e.unpersist()
      out
    }

  /** The PqCand-deep ADC ranking as a SESSION substrate — the ordered
    * head of [[adcAllOf]]; sim_pq_topk is its 20-row head, sim_pq_recall
    * re-ranks its full depth.
    */
  private[ops] def pqCandidates(spark: SparkSession, dir: String): DataFrame =
    pqCandCache.get(spark, dir) {
      adcAllOf(spark, dir)
        .select(col("vec_id"), col("adc_dist"))
        .orderBy(col("adc_dist").asc, col("vec_id").asc)
        .limit(PqCand)
        .localCheckpoint()
    }

  /** the ADC ranking's physical plan over a materialized scored table,
    * exposed for PlanShapeSpec: the LUT attach must broadcast (128
    * rows) and the top-k must be a heap, never a global sort
    */
  private[graft] def pqAdcPlan(spark: SparkSession,
      dir: String): org.apache.spark.sql.execution.SparkPlan = {
    val e = emb(spark, dir).withColumn("q", expr(quantize))
      .select("vec_id", "q").persist()
    val scored = pqScore(pqSub(e), pqCodebook(spark, e)).persist()
    scored.count()
    val plan = pqAdcFrame(scored, 20).queryExecution.executedPlan
    scored.unpersist(); e.unpersist()
    plan
  }

  private def pqTopk(spark: SparkSession, dir: String): DataFrame =
    pqCandidates(spark, dir).limit(20)

  /** shared oracle CTE prefix: sampled init → [[PqRounds]] Lloyd
    * rounds → codebook, codes, LUT, ADC ranking
    */
  private val pqCtes = {
    def sq(x: String, c: String) =
      s"""${PortableHash.dotSqlDuck(x, x)}
         |    - 2 * ${PortableHash.dotSqlDuck(x, c)}
         |    + ${PortableHash.dotSqlDuck(c, c)}""".stripMargin
    val avgList = (1 to PqD)
      .map(d => s"CAST(floor(avg(sub.xs[$d])) AS BIGINT)")
      .mkString("[", ", ", "]")
    // one assignment + recompute + coalesce round against cb{i-1}
    def round(i: Int) =
      s"""sc${i - 1} AS (SELECT sub.vec_id, sub.s, cb${i - 1}.j,
         |    ${sq("sub.xs", s"cb${i - 1}.cv")} AS d
         |  FROM sub JOIN cb${i - 1} ON sub.s = cb${i - 1}.s),
         |a${i - 1} AS (SELECT vec_id, s, j AS code FROM (
         |    SELECT vec_id, s, j, ROW_NUMBER() OVER
         |      (PARTITION BY vec_id, s ORDER BY d, j) AS rn
         |    FROM sc${i - 1}) r WHERE rn = 1),
         |avg$i AS (SELECT a${i - 1}.s, a${i - 1}.code AS j, $avgList AS cv
         |  FROM a${i - 1} JOIN sub USING (vec_id, s) GROUP BY 1, 2),
         |cb$i AS (SELECT c0.s, c0.j, COALESCE(c1.cv, c0.cv) AS cv
         |  FROM cb${i - 1} c0 LEFT JOIN avg$i c1
         |    ON c0.s = c1.s AND c0.j = c1.j)""".stripMargin
    val rounds = (1 to PqRounds).map(round).mkString(",\n")
    s"""qt AS (SELECT vec_id, $quantizeDuck AS q FROM embeddings),
       |ids AS (SELECT j, (j * 31) % (SELECT COUNT(*) FROM embeddings) AS cvid
       |        FROM range(0, $PqK) t(j)),
       |cb0 AS (SELECT c.j, s,
       |    list_slice(qt.q, s * $PqD + 1, s * $PqD + $PqD) AS cv
       |  FROM ids c JOIN qt ON qt.vec_id = c.cvid, range(0, $PqM) t2(s)),
       |sub AS (SELECT vec_id, s,
       |    list_slice(q, s * $PqD + 1, s * $PqD + $PqD) AS xs
       |  FROM qt, range(0, $PqM) t(s)),
       |$rounds,
       |cb AS (SELECT s, j, cv FROM cb$PqRounds),
       |scored AS (SELECT sub.vec_id, sub.s, cb.j,
       |    ${sq("sub.xs", "cb.cv")} AS d
       |  FROM sub JOIN cb ON sub.s = cb.s),
       |codes AS (SELECT vec_id, s, j AS code FROM (
       |    SELECT vec_id, s, j, ROW_NUMBER() OVER
       |      (PARTITION BY vec_id, s ORDER BY d, j) AS rn
       |    FROM scored) r WHERE rn = 1),
       |lut AS (SELECT s, j, d FROM scored WHERE vec_id = 0),
       |pq20 AS (
       |  SELECT c.vec_id, CAST(SUM(l.d) AS BIGINT) AS adc_dist
       |  FROM codes c JOIN lut l ON c.s = l.s AND c.code = l.j
       |  WHERE c.vec_id <> 0 GROUP BY 1
       |  ORDER BY adc_dist, vec_id LIMIT 20)""".stripMargin
  }

  private val pqTopkSql =
    s"""WITH $pqCtes
       |SELECT vec_id, adc_dist FROM pq20 ORDER BY adc_dist, vec_id""".stripMargin

  /** exact squared-L2 top-20 of vec 0 — the PQ ground truth */
  private def exactL2Topk(spark: SparkSession, e: DataFrame): DataFrame = {
    val qq = e.filter(col("vec_id") === 0).select(col("q").as("qq"))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(qq))
      .withColumn("d",
        dotLong(col("q"), col("q")) - lit(2) * dotLong(col("q"), col("qq")) +
          dotLong(col("qq"), col("qq")))
      .select(col("vec_id"), col("d"))
      .orderBy(col("d").asc, col("vec_id").asc)
      .limit(20)
  }

  /** candidate-set size for the re-rank tier: ADC retrieves PqCand,
    * exact distances re-rank them to 20 — the IVFPQ+refine pipeline,
    * where raw vectors are read for candidates only
    */
  private val PqCand = 100

  /** The exact squared-L2 top-20 of the query vector — the ground-truth
    * panel BOTH recall gates (sim_pq_recall, sim_ivfpq_recall) audit
    * against, session-cached like GraphAnn's truth panel: 20 rows of
    * corpus-determined metadata, one brute-force pass per (application,
    * SF dir, fixture generation) instead of one per gate call.
    */
  private val exactTop20Cache = SubstrateCache.frame("embeddings.parquet")

  private def exactTop20(spark: SparkSession, dir: String): DataFrame =
    exactTop20Cache.get(spark, dir) {
      val e = emb(spark, dir).withColumn("q", expr(quantize))
        .select("vec_id", "q")
      exactL2Topk(spark, e).localCheckpoint()
    }

  /** Per-cell IVF centroids (floor(avg) per dimension) — the K-row
    * trained-index metadata shared by sim_ivf_sweep and
    * sim_ivfpq_recall (identical construction in both), session-cached:
    * one corpus aggregate per generation, K×64 ints.
    */
  private val ivfCentCache = SubstrateCache.frame("embeddings.parquet")

  private[ops] def ivfCentroids(spark: SparkSession, dir: String): DataFrame =
    ivfCentCache.get(spark, dir) {
      emb(spark, dir).withColumn("q", expr(quantize))
        .groupBy("label")
        .agg(array((0 until 64).map(d =>
          floor(avg(col("q").getItem(d))).cast("long")): _*).as("centroid"))
        .localCheckpoint()
    }

  private def pqRecall(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir).withColumn("q", expr(quantize))
      .select("vec_id", "q").persist()
    val exact = exactTop20(spark, dir) // session substrate (truth panel)
    val cand = pqCandidates(spark, dir) // session substrate, stays cached
    val pq = cand.limit(20).select(col("vec_id"))
    // true distances: the regret term, and the re-rank scorer — at
    // scale this probe runs against the PqCand candidates only, not
    // the corpus (the join below restricts it)
    val trueD = e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(e.filter(col("vec_id") === 0).select(col("q").as("qq"))))
      .withColumn("td",
        dotLong(col("q"), col("q")) - lit(2) * dotLong(col("q"), col("qq")) +
          dotLong(col("qq"), col("qq")))
      .select(col("vec_id"), col("td"))
    val rerank = cand.select(col("vec_id")).join(trueD, "vec_id")
      .orderBy(col("td").asc, col("vec_id").asc).limit(20)
    val out = exact.join(pq, Seq("vec_id"), "left_semi")
      .agg(count(lit(1)).as("hits_adc"))
      .crossJoin(exact.join(rerank.select(col("vec_id")), Seq("vec_id"), "left_semi")
        .agg(count(lit(1)).as("hits_rerank")))
      .crossJoin(exact.agg(sum(col("d")).as("sum_exact_d")))
      .crossJoin(pq.join(trueD, "vec_id").agg(sum(col("td")).as("sum_adc_d")))
      .select(col("hits_adc"),
        (col("hits_adc") * 50).cast("long").as("recall_adc_pm"),
        col("hits_rerank"),
        (col("hits_rerank") * 50).cast("long").as("recall_rerank_pm"),
        col("sum_exact_d"), col("sum_adc_d"))
      .localCheckpoint()
    e.unpersist() // exact is the session substrate — never released here
    out
  }

  private val pqRecallSql =
    s"""WITH $pqCtes,
       |cand AS (
       |  SELECT c.vec_id, CAST(SUM(l.d) AS BIGINT) AS adc_dist
       |  FROM codes c JOIN lut l ON c.s = l.s AND c.code = l.j
       |  WHERE c.vec_id <> 0 GROUP BY 1
       |  ORDER BY adc_dist, vec_id LIMIT $PqCand),
       |qq AS (SELECT q FROM qt WHERE vec_id = 0),
       |truth AS (SELECT t.vec_id,
       |    ${PortableHash.dotSqlDuck("t.q", "t.q")}
       |    - 2 * ${PortableHash.dotSqlDuck("t.q", "qq.q")}
       |    + ${PortableHash.dotSqlDuck("qq.q", "qq.q")} AS d
       |  FROM qt t, qq WHERE t.vec_id <> 0),
       |exact20 AS (SELECT vec_id, d FROM truth ORDER BY d, vec_id LIMIT 20),
       |rerank20 AS (SELECT t.vec_id FROM truth t
       |  WHERE t.vec_id IN (SELECT vec_id FROM cand)
       |  ORDER BY t.d, t.vec_id LIMIT 20),
       |ha AS (SELECT CAST(COUNT(*) AS BIGINT) AS hits_adc FROM exact20
       |      WHERE vec_id IN (SELECT vec_id FROM pq20)),
       |hr AS (SELECT CAST(COUNT(*) AS BIGINT) AS hits_rerank FROM exact20
       |      WHERE vec_id IN (SELECT vec_id FROM rerank20)),
       |se AS (SELECT CAST(SUM(d) AS BIGINT) AS sum_exact_d FROM exact20),
       |sp AS (SELECT CAST(SUM(t.d) AS BIGINT) AS sum_adc_d
       |       FROM truth t WHERE t.vec_id IN (SELECT vec_id FROM pq20))
       |SELECT hits_adc, CAST(hits_adc * 50 AS BIGINT) AS recall_adc_pm,
       |  hits_rerank, CAST(hits_rerank * 50 AS BIGINT) AS recall_rerank_pm,
       |  sum_exact_d, sum_adc_d FROM ha, hr, se, sp""".stripMargin

  // -------------------------------------------------------------------
  // sim_ivfpq_recall: IVFADC — the billion-scale ANN architecture
  // (Jégou et al., "Product Quantization for Nearest Neighbor Search",
  // TPAMI 2011, §IV) composed from the two tiers this file already
  // measures separately: IVF cell pruning (sim_ivf_sweep) decides WHICH
  // rows are scanned, PQ/ADC (sim_pq_topk) decides what each scanned
  // row COSTS — 8 LUT additions over 8-byte codes instead of a 64-dim
  // exact product over raw floats. For nprobe ∈ {1, 2, 4}: rank cells
  // by centroid squared-L2 to the query, restrict the PRE-ENCODED code
  // table to those cells, rank candidates by ADC, and report the scan
  // volume plus TWO recalls@20 — against the exact L2 top-20 (the
  // end-to-end loss a user experiences) and against the full-corpus
  // ADC top-20 (isolating the cell-pruning term from the quantization
  // term; their gap is what re-ranking cannot recover without raising
  // nprobe). This is the operating-point table that sizes a 100 TB
  // vector index: memory = n × 8 code bytes, query cost = nprobe/K of
  // the corpus × one LUT add per subspace.
  // Scale shape: codebook + LUT + probed-cell list (≤4 rows) broadcast;
  // the only n-proportional state is the (vec_id, adc_dist, label) code
  // table, built ONCE per call and reused across all three probe
  // points; every top-20 is a TakeOrdered heap, never a global sort.
  // All arithmetic is exact integer micro-units, so both engines agree
  // bit-for-bit.
  // -------------------------------------------------------------------
  private def ivfpqRecall(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // ADC distance of EVERY corpus vector, tagged with its IVF cell —
    // the persisted index image (8 code bytes/row at scale; raw vectors
    // are read only by the exact ground-truth substrate), built ONCE
    // per session by the adcAllOf substrate. Round-15 restructure
    // (guide §1.2): the per-np branch fan-out evaluated the candidate
    // subtree ~3× per probe point and ran ~12 separate aggregate jobs
    // per call; the three probe points now share ONE ranked-cell
    // attach, per-np counts come from the 8-row per-cell count table,
    // and the hit audits run over the UNIONED top-20s — a single query
    // tree. The centroid table and the exact ground truth moved to
    // session substrates (each also serves another gate). The final
    // localCheckpoint is gone, so plan audits see the real tree, not a
    // checkpoint stub.
    val adcAll = adcAllOf(spark, dir)
    val query = emb(spark, dir).filter(col("vec_id") === 0)
      .select(expr(quantize).as("qq"))
    val exact = exactTop20(spark, dir).select("vec_id")
    val adcFull20 = adcAll.orderBy(col("adc_dist").asc, col("vec_id").asc)
      .limit(20).select("vec_id")
    // cell ranking: centroid substrate (shared with sim_ivf_sweep),
    // ranked by squared L2 ascending; rk over K rows (a single-partition
    // window over index METADATA, never corpus rows)
    val ranked = ivfCentroids(spark, dir).crossJoin(broadcast(query))
      .withColumn("cd",
        dotLong(col("centroid"), col("centroid")) -
          lit(2) * dotLong(col("centroid"), col("qq")) +
          dotLong(col("qq"), col("qq")))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("cd").asc, col("label").asc)))
      .select(col("label").as("probe_label"), col("rk"))
    val adcR = adcAll.join(broadcast(ranked),
      col("label") === col("probe_label"))
    // one probe-point axis to left-join per-np facts onto (a missing
    // group — e.g. zero hits — must still produce its row)
    import spark.implicits._
    val nps = IvfProbes.map(_.toLong).toDF("nprobe")
    // n_scanned for every np from ONE corpus pass: per-cell-rank counts
    // (≤ K rows), then the cumulative count per probe point
    val cellCounts = adcR.groupBy("rk").agg(count(lit(1)).as("cn"))
    val scanned = nps.join(broadcast(cellCounts),
        col("rk") <= col("nprobe"), "left")
      .groupBy("nprobe").agg(sum(col("cn")).as("n_scanned"))
    // per-np ADC top-20 (bounded heaps over the in-memory index image),
    // unioned so each hit audit is ONE join + aggregate
    val tops = IvfProbes.map { np =>
      adcR.filter(col("rk") <= np)
        .orderBy(col("adc_dist").asc, col("vec_id").asc)
        .limit(20).select(lit(np.toLong).as("nprobe"), col("vec_id"))
    }.reduce(_ unionAll _)
    val hitsExact = tops.join(exact, Seq("vec_id"), "left_semi")
      .groupBy("nprobe").agg(count(lit(1)).as("he"))
    val hitsAdc = tops.join(adcFull20, Seq("vec_id"), "left_semi")
      .groupBy("nprobe").agg(count(lit(1)).as("ha"))
    scanned
      .join(hitsExact, Seq("nprobe"), "left")
      .join(hitsAdc, Seq("nprobe"), "left")
      .select(col("nprobe"), col("n_scanned"),
        coalesce(col("he"), lit(0L)).as("hits_exact"),
        coalesce(col("ha"), lit(0L)).as("hits_vs_adc"))
      .select(col("nprobe"), col("n_scanned"), col("hits_exact"),
        expr("(1000 * hits_exact) div 20").as("recall_pm"),
        col("hits_vs_adc"))
      .orderBy("nprobe")
  }

  // lazy: references IvfProbes, declared further down with sim_ivf_sweep
  private lazy val ivfpqRecallSql: String = {
    def sq(x: String, c: String) =
      s"""${PortableHash.dotSqlDuck(x, x)}
         |    - 2 * ${PortableHash.dotSqlDuck(x, c)}
         |    + ${PortableHash.dotSqlDuck(c, c)}""".stripMargin
    val centroid = (0 until 64)
      .map(d => s"CAST(floor(avg(qt.q[${d + 1}])) AS BIGINT)")
      .mkString("[", ", ", "]")
    val blocks = IvfProbes.map { np =>
      val probed =
        s"(SELECT label FROM ranked ORDER BY cd ASC, label ASC LIMIT $np)"
      s"""SELECT CAST($np AS BIGINT) AS nprobe,
         |  (SELECT COUNT(*) FROM adcall WHERE label IN $probed) AS n_scanned,
         |  (SELECT COUNT(*) FROM (
         |     SELECT vec_id FROM adcall WHERE label IN $probed
         |     ORDER BY adc_dist, vec_id LIMIT 20) t
         |   WHERE t.vec_id IN (SELECT vec_id FROM exact20)) AS hits_exact,
         |  (SELECT COUNT(*) FROM (
         |     SELECT vec_id FROM adcall WHERE label IN $probed
         |     ORDER BY adc_dist, vec_id LIMIT 20) t
         |   WHERE t.vec_id IN (SELECT vec_id FROM adcfull20)) AS hits_vs_adc""".stripMargin
    }
    val union = blocks.mkString("\nUNION ALL\n")
    s"""WITH $pqCtes,
       |lab AS (SELECT vec_id, label FROM embeddings),
       |adcall AS (SELECT c.vec_id, CAST(SUM(l.d) AS BIGINT) AS adc_dist,
       |    MIN(lb.label) AS label
       |  FROM codes c JOIN lut l ON c.s = l.s AND c.code = l.j
       |  JOIN lab lb ON lb.vec_id = c.vec_id
       |  WHERE c.vec_id <> 0 GROUP BY c.vec_id),
       |qq2 AS (SELECT q FROM qt WHERE vec_id = 0),
       |cent AS (SELECT lb.label, $centroid AS centroid
       |  FROM qt JOIN lab lb USING (vec_id) GROUP BY lb.label),
       |ranked AS (SELECT c.label, ${sq("c.centroid", "qq2.q")} AS cd
       |  FROM cent c, qq2),
       |exact20 AS (SELECT t.vec_id FROM qt t, qq2 WHERE t.vec_id <> 0
       |  ORDER BY ${sq("t.q", "qq2.q")} ASC, t.vec_id ASC LIMIT 20),
       |adcfull20 AS (SELECT vec_id FROM adcall
       |  ORDER BY adc_dist, vec_id LIMIT 20)
       |SELECT nprobe, n_scanned, hits_exact,
       |  CAST((1000 * hits_exact) // 20 AS BIGINT) AS recall_pm,
       |  hits_vs_adc
       |FROM ($union) s ORDER BY nprobe""".stripMargin
  }

  // -------------------------------------------------------------------
  // sim_mips_norm: MAX-INNER-PRODUCT search via the norm-augmentation
  // reduction (Bachrach et al. '14 / Shrivastava-Li asymmetric LSH).
  // MIPS — "highest raw dot product", the scoring rule when embedding
  // NORM carries signal (recommender item popularity, learned
  // importance) — admits no direct cosine/L2 ANN index because inner
  // product violates the triangle inequality. The classic fix: append
  // one coordinate √(M²−‖x‖²) to every corpus vector (M = max norm)
  // and 0 to the query; augmented vectors all have norm M, so
  //   cos(x̃, q̃) = ⟨x,q⟩ / (M·‖q‖)
  // — a CONSTANT denominator — and cosine order over the augmented
  // space IS inner-product order, unlocking every cosine-ANN tier
  // above (LSH buckets, IVF, PQ) for MIPS workloads.
  //
  // The augmented coordinate never needs materializing: the augmented
  // cosine is computable from the integer dot and the two integer
  // squared norms alone, so the whole reduction stays in the
  // deterministic quantized algebra — the query emits BOTH the raw
  // integer dot (the MIPS answer) and the augmented cosine, and the
  // orderings provably coincide row for row. Scale shape: M² is a
  // 1-row partial aggregate; scoring is the same single
  // broadcast-probe scan as every brute tier; top-k plans as
  // TakeOrderedAndProject.
  // -------------------------------------------------------------------
  private def mipsNorm(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir).withColumn("q", expr(quantize))
    val query = e.filter(col("vec_id") === 0)
      .select(col("q").as("query_q"),
        dotLong(col("q"), col("q")).as("s_qq"))
    val m2 = e.filter(col("vec_id") =!= 0)
      .select(max(dotLong(col("q"), col("q"))).as("m2"))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(query))
      .crossJoin(broadcast(m2))
      .withColumn("dot", dotLong(col("q"), col("query_q")))
      .withColumn("cos_aug_e6",
        expr("""CAST(floor((1000000.0 * CAST(dot AS DOUBLE)) /
                sqrt(CAST(m2 AS DOUBLE) * CAST(s_qq AS DOUBLE))) AS BIGINT)"""))
      .select(col("vec_id"), col("dot"), col("cos_aug_e6"))
      .orderBy(col("dot").desc, col("vec_id").asc)
      .limit(20)
  }

  private val mipsNormSql =
    s"""WITH qt AS (SELECT vec_id, $quantizeDuck AS q FROM embeddings),
       |qq AS (SELECT q, ${PortableHash.dotSqlDuck("q", "q")} AS s_qq
       |       FROM qt WHERE vec_id = 0),
       |m AS (SELECT MAX(${PortableHash.dotSqlDuck("q", "q")}) AS m2
       |      FROM qt WHERE vec_id <> 0),
       |scored AS (SELECT t.vec_id,
       |    ${PortableHash.dotSqlDuck("t.q", "qq.q")} AS dot,
       |    qq.s_qq, m.m2
       |  FROM qt t, qq, m WHERE t.vec_id <> 0)
       |SELECT vec_id, dot,
       |  CAST(floor((1000000.0 * CAST(dot AS DOUBLE)) /
       |    sqrt(CAST(m2 AS DOUBLE) * CAST(s_qq AS DOUBLE))) AS BIGINT)
       |    AS cos_aug_e6
       |FROM scored
       |ORDER BY dot DESC, vec_id ASC LIMIT 20""".stripMargin

  // -------------------------------------------------------------------
  // sim_hard_negatives: HARD-NEGATIVE MINING for contrastive training —
  // for each anchor vector, the most-similar vector with a DIFFERENT
  // label (the "hardest" negative: maximum dot among impostors). The
  // contrastive/metric-learning data loop lives on this operator; easy
  // random negatives teach nothing at scale.
  //
  // Scale shape: the anchor set is the deterministic id-residue sample
  // (vec_id ≡ 0 mod 50) — a bounded panel that BROADCASTS; the corpus
  // makes ONE scan, scoring each row against all anchors map-side
  // (work = corpus × anchors, linear in the corpus for a fixed panel),
  // and the per-anchor argmax is max(struct(dot, −vec_id)) — a
  // map-side-combining hash aggregate holding ONE row per anchor per
  // mapper, never a per-anchor sort. Mining negatives for EVERY corpus
  // vector instead is the batch-kNN problem — that path is
  // sim_knn_batch's typed TopK aggregator; this panel shape is the one
  // you run continuously during training. Deterministic ties: lowest
  // vec_id wins.
  // -------------------------------------------------------------------
  private def hardNegatives(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir).withColumn("q", expr(quantize))
    val anchors = e.filter(pmod(col("vec_id"), lit(50)) === 0)
      .select(col("vec_id").as("a_id"), col("label").as("a_label"),
        col("q").as("a_q"))
    e.crossJoin(broadcast(anchors))
      .filter(col("label") =!= col("a_label"))
      .withColumn("dot", dotLong(col("q"), col("a_q")))
      .groupBy("a_id")
      .agg(max(struct(col("dot"), (-col("vec_id")).as("neg_vid"))).as("m"))
      .select(col("a_id").as("anchor_id"),
        (-col("m.neg_vid")).as("neg_id"), col("m.dot").as("dot"))
      .orderBy("anchor_id")
  }

  private val hardNegativesSql =
    s"""WITH qt AS (SELECT vec_id, label, $quantizeDuck AS q FROM embeddings),
       |anc AS (SELECT vec_id AS a_id, label AS a_label, q AS a_q
       |        FROM qt WHERE vec_id % 50 = 0),
       |scored AS (SELECT a.a_id, t.vec_id,
       |    ${PortableHash.dotSqlDuck("t.q", "a.a_q")} AS dot
       |  FROM qt t JOIN anc a ON t.label <> a.a_label),
       |r AS (SELECT *, row_number() OVER
       |        (PARTITION BY a_id ORDER BY dot DESC, vec_id ASC) AS rn
       |      FROM scored)
       |SELECT a_id AS anchor_id, vec_id AS neg_id, dot
       |FROM r WHERE rn = 1 ORDER BY anchor_id""".stripMargin

  // -------------------------------------------------------------------
  // sim_ivf_sweep: the IVF RECALL/COST CURVE measured — for
  // nprobe ∈ {1, 2, 4}, search only the nprobe query-nearest cells and
  // report recall@20 against the exact brute-force top-20, plus the
  // candidate volume scanned. This is the ANN operating-point table:
  // at 100 TB you pick nprobe from THIS curve (measured on your own
  // corpus), not from a paper — the same measured-design discipline as
  // dd_lsh_tuning's S-curve and sim_ann_recall/sim_pq_recall. All
  // scoring stays in the exact integer dot algebra, so recall is a
  // deterministic integer in both engines, not a float estimate.
  // Scale shape per probe: centroid ranking is K rows broadcast; the
  // cell search scans only the probed partitions' rows; the recall
  // join intersects two 20-row sets.
  // -------------------------------------------------------------------
  private val IvfProbes = Seq(1, 2, 4)

  private def ivfSweep(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir).withColumn("q", expr(quantize))
    val cent = ivfCentroids(spark, dir) // session substrate (K rows)
    val query = e.filter(col("vec_id") === 0).select(col("q").as("query_q"))
    val ranked = cent.crossJoin(broadcast(query))
      .withColumn("cdot", dotLong(col("centroid"), col("query_q")))
    val brute = e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(query))
      .withColumn("dot", dotLong(col("q"), col("query_q")))
      .select(col("vec_id"), col("dot"))
      .orderBy(col("dot").desc, col("vec_id").asc)
      .limit(20)
      .select(col("vec_id"))
    IvfProbes.map { np =>
      val probed = ranked.orderBy(col("cdot").desc, col("label").asc)
        .limit(np).select(col("label").as("probe_label"), col("query_q"))
      val cand = e.filter(col("vec_id") =!= 0)
        .join(broadcast(probed), col("label") === col("probe_label"))
      val scanned = cand.agg(count(lit(1)).as("n_scanned"))
      val hits = cand
        .withColumn("dot", dotLong(col("q"), col("query_q")))
        .select(col("vec_id"), col("dot"))
        .orderBy(col("dot").desc, col("vec_id").asc)
        .limit(20)
        .join(brute, Seq("vec_id"), "left_semi")
        .agg(count(lit(1)).as("hits"))
      scanned.crossJoin(broadcast(hits))
        .select(lit(np.toLong).as("nprobe"), col("n_scanned"), col("hits"),
          expr("(1000 * hits) div 20").as("recall_pm"))
    }.reduce(_ unionAll _).orderBy("nprobe")
  }

  private val ivfSweepSql: String = {
    val centroid = (0 until 64)
      .map(d => s"CAST(floor(avg(q[${d + 1}])) AS BIGINT)")
      .mkString("[", ", ", "]")
    val blocks = IvfProbes.map { np =>
      s"""SELECT CAST($np AS BIGINT) AS nprobe,
         |  (SELECT COUNT(*) FROM qt t
         |   WHERE t.vec_id <> 0 AND t.label IN
         |     (SELECT label FROM ranked ORDER BY cdot DESC, label ASC
         |      LIMIT $np)) AS n_scanned,
         |  (SELECT COUNT(*) FROM (
         |     SELECT t.vec_id FROM qt t, qq
         |     WHERE t.vec_id <> 0 AND t.label IN
         |       (SELECT label FROM ranked ORDER BY cdot DESC, label ASC
         |        LIMIT $np)
         |     ORDER BY ${PortableHash.dotSqlDuck("t.q", "qq.q")} DESC,
         |       t.vec_id ASC LIMIT 20) iv
         |   WHERE iv.vec_id IN (SELECT vec_id FROM brute)) AS hits""".stripMargin
    }
    val union = blocks.mkString("\nUNION ALL\n")
    s"""WITH qt AS (SELECT vec_id, label, $quantizeDuck AS q FROM embeddings),
       |cent AS (SELECT label, $centroid AS centroid FROM qt GROUP BY label),
       |qq AS (SELECT q FROM qt WHERE vec_id = 0),
       |ranked AS (SELECT c.label,
       |    ${PortableHash.dotSqlDuck("c.centroid", "qq.q")} AS cdot
       |  FROM cent c, qq),
       |brute AS (SELECT t.vec_id FROM qt t, qq WHERE t.vec_id <> 0
       |  ORDER BY ${PortableHash.dotSqlDuck("t.q", "qq.q")} DESC,
       |    t.vec_id ASC LIMIT 20)
       |SELECT nprobe, n_scanned, hits,
       |  CAST((1000 * hits) // 20 AS BIGINT) AS recall_pm
       |FROM ($union) s
       |ORDER BY nprobe""".stripMargin
  }

  // -------------------------------------------------------------------
  // sim_ivf_persist: the PERSISTED-INDEX roundtrip — the deployment
  // step every other sim_ query stops short of. A production ANN
  // index is not a session object; it is TABLES on storage (FAISS's
  // inverted lists ≙ a postings table partitioned by cell; the coarse
  // quantizer ≙ a centroid table), built by one job and served by
  // many later ones that never see the training pipeline. This gate
  // builds the index from the session's k-means substrate, WRITES it
  // as two parquet tables — postings partitioned by cell (so a probe
  // that selects nprobe cells prunes at the partition/file level, the
  // layout that matters at 100 TB) and the per-cell centroids — then
  // serves the query vector STRICTLY from fresh reads of the
  // persisted tables: rank read-back centroids (broadcast, K rows),
  // probe the top-2 cells, exact integer dot over only those cells'
  // postings, top-10. The oracle recomputes the same answer from the
  // raw embeddings in DuckDB, so the gate proves the roundtrip loses
  // nothing: persisted-index serving ≡ fresh computation.
  //
  // Scale shape: index build is the k-means substrate + one join +
  // one partitioned write; serving reads K centroid rows + the probed
  // cells' partitions only. Partition values round-trip through path
  // strings, so the cell id is re-cast to long on read.
  // -------------------------------------------------------------------
  private val IvfPersistProbes = 2

  private def ivfPersist(spark: SparkSession, dir: String): DataFrame = {
    val tag = new java.io.File(dir).getName.replace('.', '_')
    val ixDir = s"target/ivf_index/$tag"
    val lists = kmeansAssigned(spark, dir).select("vec_id", "cluster")
      .join(quantized(spark, dir), "vec_id")
    lists.write.mode("overwrite").partitionBy("cluster")
      .parquet(s"$ixDir/postings.parquet")
    lists.groupBy("cluster")
      .agg(array((0 until 64).map(d =>
        floor(avg(col("q").getItem(d))).cast("long")): _*).as("cvec"))
      .write.mode("overwrite").parquet(s"$ixDir/centroids.parquet")

    // serving path: persisted tables only
    val post = spark.read.parquet(s"$ixDir/postings.parquet")
      .select(col("vec_id"), col("cluster").cast("long").as("cluster"),
        col("q"))
    val cents = spark.read.parquet(s"$ixDir/centroids.parquet")
    val query = quantized(spark, dir).filter(col("vec_id") === 0)
      .select(col("q").as("qq"))
    val probed = cents.crossJoin(broadcast(query))
      .withColumn("cdot", dotLong(col("cvec"), col("qq")))
      .orderBy(col("cdot").desc, col("cluster").asc)
      .limit(IvfPersistProbes)
      .select(col("cluster").cast("long").as("cluster"), col("qq"))
    post.filter(col("vec_id") =!= 0)
      .join(broadcast(probed), Seq("cluster"))
      .withColumn("dot", dotLong(col("q"), col("qq")))
      .select(col("vec_id"), col("cluster"), col("dot"))
      .orderBy(col("dot").desc, col("vec_id").asc)
      .limit(10)
  }

  private val ivfPersistSql: String = {
    val centroid = (0 until 64)
      .map(d => s"CAST(floor(avg(q[${d + 1}])) AS BIGINT)")
      .mkString("[", ", ", "]")
    s"""WITH asg AS (SELECT vec_id, cluster
       |  FROM (${kmeansAssignSql}) ka),
       |qt AS (SELECT vec_id, $quantizeDuck AS q FROM embeddings),
       |post AS (SELECT a.vec_id, a.cluster, t.q
       |  FROM asg a JOIN qt t USING (vec_id)),
       |cents AS (SELECT cluster, $centroid AS cvec
       |  FROM post GROUP BY cluster),
       |qq AS (SELECT q FROM qt WHERE vec_id = 0),
       |probed AS (SELECT cluster FROM (
       |    SELECT c.cluster,
       |      ${PortableHash.dotSqlDuck("c.cvec", "qq.q")} AS cdot
       |    FROM cents c, qq) r
       |  ORDER BY cdot DESC, cluster ASC LIMIT $IvfPersistProbes)
       |SELECT p.vec_id, CAST(p.cluster AS BIGINT) AS cluster,
       |  ${PortableHash.dotSqlDuck("p.q", "qq.q")} AS dot
       |FROM post p, qq
       |WHERE p.vec_id <> 0
       |  AND p.cluster IN (SELECT cluster FROM probed)
       |ORDER BY dot DESC, p.vec_id ASC LIMIT 10""".stripMargin
  }

  // -------------------------------------------------------------------
  // sim_ivf_delta: INCREMENTAL IVF MAINTENANCE measured — the ingest
  // story the vector side was missing (dd_incremental_dup's economics
  // applied to ANN): when a delta batch of vectors arrives, a
  // production index does NOT retrain; it assigns each new vector to
  // its nearest EXISTING cell (min squared-L2 against the frozen K
  // centroids — the k-means cell rule; work ∝ |delta|·K through one
  // broadcast, never corpus) and serves. The question that decides
  // when to schedule a retrain is "what does serving the
  // delta-maintained index cost vs a full retrain?" — answered as a
  // measured row per variant (the sim_ivf_sweep / dd_lsh_recall
  // discipline): recall@20 of an nprobe=2 search against the
  // full-corpus brute-force truth for (a) the frozen index with the
  // delta assigned in and (b) the retrained index (centroids
  // recomputed over base+delta and EVERY vector reassigned — the
  // full-corpus pass the maintenance path avoids; computed here only
  // as the comparison twin). The "training" is the deterministic
  // 3-plane hyperplane partition (8 geometric cells — the portable
  // stand-in for Lloyd's, so both engines derive identical cells);
  // centroids are per-cell integer means. n_moved counts delta
  // vectors whose frozen-centroid cell differs from their
  // retrained-centroid cell — the placement drift retraining would
  // repair. All scoring stays in the exact integer algebra, so every
  // figure is deterministic in both engines.
  //
  // Scale shape: the delta assignment is one scan of the DELTA only ×
  // broadcast K centroids with a per-vec_id argmin window (millions
  // of K-row partitions — the inverse of the ntile trap); the serving
  // search scans only the 2 probed cells; steady-state work is
  // ∝ delta, exactly the dd_incremental_dup asymmetry. The retrain
  // twin's full-corpus reassignment is the measured cost being
  // avoided, not part of the ingest path.
  // -------------------------------------------------------------------
  // Round-14 note: materializing this projection (persist AND
  // localCheckpoint both tried) measured SLOWER than letting each
  // consumer re-run the codegen'd quantize over the 800 KB parquet
  // scan — the cached 64-long arrays cost more to rehydrate per
  // reference than the arithmetic they save. Left as-is, measured.
  private def ivfDelta(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.GraftFunctions.l2sqLong
    val e = emb(spark, dir).withColumn("q", expr(quantize))
      .withColumn("bkt", Hyperplanes.bucketCol(col("q"), 3))
    val base = e.filter(pmod(col("vec_id"), lit(10)) =!= 7)
    val delta = e.filter(pmod(col("vec_id"), lit(10)) === 7)
    def centroids(src: DataFrame) = src.groupBy(col("bkt").as("cell"))
      .agg(array((0 until 64).map(d =>
        floor(avg(col("q").getItem(d))).cast("long")): _*).as("centroid"))
    val centBase = centroids(base)
    val centFull = centroids(e)
    // argmin-L2 cell assignment of a vector set against a frozen
    // centroid table (broadcast K rows; window keyed on the
    // high-cardinality vec_id)
    def assign(vecs: DataFrame, cents: DataFrame): DataFrame = vecs
      .select(col("vec_id"), col("q"))
      .crossJoin(broadcast(cents))
      .withColumn("cdist", l2sqLong(col("q"), col("centroid")))
      .withColumn("rn", row_number().over(Window.partitionBy("vec_id")
        .orderBy(col("cdist").asc, col("cell").asc)))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("q"), col("cell"))
    val asgDeltaFrozen = assign(delta, centBase)
    val asgDeltaRetrain = assign(delta, centFull)
    val moved = asgDeltaFrozen.select(col("vec_id"), col("cell").as("c1"))
      .join(asgDeltaRetrain.select(col("vec_id"), col("cell").as("c2")),
        "vec_id")
      .agg(count(lit(1)).as("n_delta"),
        sum(when(col("c1") =!= col("c2"), 1L).otherwise(0L)).as("n_moved"))
    val idxDelta = assign(base, centBase).unionAll(asgDeltaFrozen)
    val idxRetrain = assign(e, centFull)
    val query = e.filter(col("vec_id") === 0).select(col("q").as("query_q"))
    val brute = e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(query))
      .withColumn("dist", l2sqLong(col("q"), col("query_q")))
      .orderBy(col("dist").asc, col("vec_id").asc)
      .limit(20).select(col("vec_id"))
    def serve(variant: String, cents: DataFrame, idx: DataFrame,
        movedCol: org.apache.spark.sql.Column): DataFrame = {
      val probes = cents.crossJoin(broadcast(query))
        .withColumn("cdist", l2sqLong(col("centroid"), col("query_q")))
        .orderBy(col("cdist").asc, col("cell").asc)
        .limit(2).select(col("cell").as("probe_cell"), col("query_q"))
      val cand = idx.filter(col("vec_id") =!= 0)
        .join(broadcast(probes), col("cell") === col("probe_cell"))
      val scanned = cand.agg(count(lit(1)).as("n_scanned"))
      val hits = cand
        .withColumn("dist", l2sqLong(col("q"), col("query_q")))
        .orderBy(col("dist").asc, col("vec_id").asc)
        .limit(20).select(col("vec_id"))
        .join(brute, Seq("vec_id"), "left_semi")
        .agg(count(lit(1)).as("hits"))
      scanned.crossJoin(broadcast(hits)).crossJoin(broadcast(moved))
        .select(lit(variant).as("variant"), col("n_delta"),
          movedCol.as("n_moved"), col("n_scanned"), col("hits"),
          expr("(1000 * hits) div 20").as("recall_pm"))
    }
    serve("delta_assign", centBase, idxDelta, col("n_moved"))
      .unionAll(serve("retrain", centFull, idxRetrain, lit(0L)))
      .orderBy("variant")
  }

  private val ivfDeltaSql: String = {
    val centroid = (0 until 64)
      .map(d => s"CAST(floor(avg(q[${d + 1}])) AS BIGINT)")
      .mkString("[", ", ", "]")
    def l2(a: String, b: String) =
      s"(${PortableHash.dotSqlDuck(a, a)} - 2 * ${PortableHash.dotSqlDuck(a, b)}" +
        s" + ${PortableHash.dotSqlDuck(b, b)})"
    def asg(src: String, cents: String) =
      s"""SELECT vec_id, q, cell FROM (
         |    SELECT s.vec_id, s.q, c.cell,
         |      ROW_NUMBER() OVER (PARTITION BY s.vec_id
         |        ORDER BY ${l2("s.q", "c.centroid")} ASC, c.cell ASC) AS rn
         |    FROM $src s, $cents c) t WHERE rn = 1""".stripMargin
    def serve(variant: String, cents: String, idx: String,
        movedExpr: String) =
      s"""SELECT '$variant' AS variant,
         |  (SELECT n_delta FROM mv) AS n_delta,
         |  $movedExpr AS n_moved,
         |  (SELECT COUNT(*) FROM $idx i
         |   WHERE i.vec_id <> 0 AND i.cell IN
         |     (SELECT cell FROM $cents c, qq
         |      ORDER BY ${l2("c.centroid", "qq.q")} ASC, cell ASC
         |      LIMIT 2)) AS n_scanned,
         |  (SELECT COUNT(*) FROM (
         |     SELECT i.vec_id FROM $idx i, qq
         |     WHERE i.vec_id <> 0 AND i.cell IN
         |       (SELECT cell FROM $cents c, qq
         |        ORDER BY ${l2("c.centroid", "qq.q")} ASC, cell ASC
         |        LIMIT 2)
         |     ORDER BY ${l2("i.q", "qq.q")} ASC,
         |       i.vec_id ASC LIMIT 20) s
         |   WHERE s.vec_id IN (SELECT vec_id FROM brute)) AS hits""".stripMargin
    s"""WITH q0 AS (SELECT vec_id, $quantizeDuck AS q FROM embeddings),
       |qt AS (SELECT vec_id, q,
       |    ${Hyperplanes.bucketSqlDuck("q", 3)} AS bkt FROM q0),
       |b AS (SELECT * FROM qt WHERE vec_id % 10 <> 7),
       |d AS (SELECT * FROM qt WHERE vec_id % 10 = 7),
       |cb AS (SELECT bkt AS cell, $centroid AS centroid FROM b GROUP BY bkt),
       |cf AS (SELECT bkt AS cell, $centroid AS centroid FROM qt GROUP BY bkt),
       |qq AS (SELECT q FROM qt WHERE vec_id = 0),
       |af AS (${asg("d", "cb")}),
       |ar AS (${asg("d", "cf")}),
       |ab AS (${asg("b", "cb")}),
       |aa AS (${asg("qt", "cf")}),
       |idx_delta AS (SELECT * FROM ab UNION ALL SELECT * FROM af),
       |idx_full AS (SELECT * FROM aa),
       |mv AS (SELECT COUNT(*) AS n_delta,
       |    SUM(CASE WHEN af.cell <> ar.cell THEN 1 ELSE 0 END) AS n_moved
       |  FROM af JOIN ar USING (vec_id)),
       |brute AS (SELECT t.vec_id FROM qt t, qq WHERE t.vec_id <> 0
       |  ORDER BY ${l2("t.q", "qq.q")} ASC,
       |    t.vec_id ASC LIMIT 20)
       |SELECT variant, CAST(n_delta AS BIGINT) AS n_delta,
       |  CAST(n_moved AS BIGINT) AS n_moved,
       |  CAST(n_scanned AS BIGINT) AS n_scanned,
       |  CAST(hits AS BIGINT) AS hits,
       |  CAST((1000 * hits) // 20 AS BIGINT) AS recall_pm
       |FROM (
       |${serve("delta_assign", "cb", "idx_delta",
        "(SELECT n_moved FROM mv)")}
       |UNION ALL
       |${serve("retrain", "cf", "idx_full", "0")}
       |) u ORDER BY variant""".stripMargin
  }


  // -------------------------------------------------------------------
  // sim_batch_ivf: BATCHED ANN SERVING through the IVF index — a panel
  // of queries (the id-residue sample) answered in one pass, the shape
  // of production retrieval (nightly re-embedding joins, RAG corpus
  // refresh) as opposed to sim_ivf_label's single probe. The key scale
  // move: after each query map-side argmaxes its nearest centroid
  // (centroids broadcast — K×64 ints), candidates come from ONE
  // equi-join of the corpus against the query panel ON THE CELL LABEL
  // — each corpus row meets only the queries probing its cell, work =
  // Σ_q |cell(q)|, never corpus × panel (the crossJoin that kills
  // batch serving). Per-query top-5 is a window over cell-bounded
  // candidate sets keyed by the high-cardinality query id. Exact
  // integer dots; ties to the lower vec_id.
  // -------------------------------------------------------------------
  private def batchIvf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = emb(spark, dir).withColumn("q", expr(quantize))
    val cent = e.groupBy("label")
      .agg(array((0 until 64).map(d =>
        floor(avg(col("q").getItem(d))).cast("long")): _*).as("centroid"))
    val panel = e.filter(pmod(col("vec_id"), lit(50)) === 0)
      .select(col("vec_id").as("qid"), col("q").as("qq"))
    val probed = panel.crossJoin(broadcast(cent))
      .withColumn("cdot", dotLong(col("centroid"), col("qq")))
      .groupBy("qid")
      .agg(max(struct(col("cdot"), (-col("label")).as("nl"))).as("m"),
        first(col("qq")).as("qq"))
      .select(col("qid"), (-col("m.nl")).as("probe_label"), col("qq"))
    val w = Window.partitionBy("qid")
      .orderBy(col("dot").desc, col("vec_id").asc)
    e.join(broadcast(probed),
        col("label") === col("probe_label") && col("vec_id") =!= col("qid"))
      .withColumn("dot", dotLong(col("q"), col("qq")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("qid"), col("rank"), col("vec_id"), col("dot"))
      .orderBy("qid", "rank")
  }

  private val batchIvfSql: String = {
    val centroid = (0 until 64)
      .map(d => s"CAST(floor(avg(q[${d + 1}])) AS BIGINT)")
      .mkString("[", ", ", "]")
    s"""WITH qt AS (SELECT vec_id, label, $quantizeDuck AS q FROM embeddings),
       |cent AS (SELECT label, $centroid AS centroid FROM qt GROUP BY label),
       |panel AS (SELECT vec_id AS qid, q AS qq FROM qt WHERE vec_id % 50 = 0),
       |ranked AS (SELECT p.qid, p.qq, c.label,
       |    row_number() OVER (PARTITION BY p.qid ORDER BY
       |      ${PortableHash.dotSqlDuck("c.centroid", "p.qq")} DESC,
       |      c.label ASC) AS crn
       |  FROM panel p, cent c),
       |probed AS (SELECT qid, qq, label AS probe_label
       |  FROM ranked WHERE crn = 1),
       |cand AS (SELECT pr.qid, t.vec_id,
       |    ${PortableHash.dotSqlDuck("t.q", "pr.qq")} AS dot
       |  FROM qt t JOIN probed pr
       |    ON t.label = pr.probe_label AND t.vec_id <> pr.qid),
       |rk AS (SELECT qid, vec_id, dot,
       |    row_number() OVER (PARTITION BY qid
       |      ORDER BY dot DESC, vec_id ASC) AS rank
       |  FROM cand)
       |SELECT qid, CAST(rank AS BIGINT) AS rank, vec_id, dot
       |FROM rk WHERE rank <= 5
       |ORDER BY qid, rank""".stripMargin
  }

  // -------------------------------------------------------------------
  // sim_rrf_fusion: RECIPROCAL RANK FUSION of two independent ANN
  // tiers — the standard ensemble step of hybrid retrieval (Cormack et
  // al., SIGIR'09): each tier contributes 1/(60+rank) per candidate,
  // and candidates surfacing in BOTH lists dominate. Tiers fused here
  // are the two cheap ones: IVF (nearest-centroid cell) and
  // multi-probe hyperplane LSH (bucket Hamming ≤ 1) — the production
  // shape where no exact pass exists to fuse against. Scores are
  // exact integers (floor(10⁹/(60+rank)) — no cross-engine float
  // summation), so fusion ranks hash-match.
  //
  // Scale shape: the query panel broadcasts once per tier; each
  // tier's candidates are cell-/bucket-bounded (work = Σ|cell(q)|,
  // never corpus × panel); per-query ranks are windows over the
  // bounded candidate sets; the fusion join moves only ≤ 2·20 ranked
  // rows per query.
  // -------------------------------------------------------------------
  private val RrfK = 60
  private val RrfDepth = 20

  /** Fusion substrate shared by sim_rrf_fusion and sim_rrf_recall:
    * (probed panel, IVF-tier ranks, LSH-tier ranks, fused scores).
    * SESSION-CACHED with the tier rank tables materialized: the tiers
    * are panel-bounded (≤ |panel|·20 rows), but un-materialized they
    * replanned the whole corpus-scan + candidate-join + window
    * pipeline once per downstream reference — sim_rrf_recall's plan
    * repeated each tier ~4× (47 KB, 21 exchanges, round-14 audit).
    */
  private val rrfTiersCache =
    new SubstrateCache[(DataFrame, DataFrame, DataFrame, DataFrame)](
      "embeddings.parquet", (_: (DataFrame, DataFrame, DataFrame, DataFrame)) => ())

  private def rrfTiers(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) =
    rrfTiersCache.get(spark, dir) {
      val (probed, tierIvf, tierLsh, fused) = rrfTiersBuild(spark, dir)
      val ti = tierIvf.localCheckpoint()
      val tl = tierLsh.localCheckpoint()
      (probed, ti, tl, fusedOf(ti, tl))
    }

  private def rrfTiersBuild(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val e = emb(spark, dir).withColumn("q", expr(quantize))
      .withColumn("bucket", bucketCol(BucketedPlanes))
    val cent = e.groupBy("label")
      .agg(array((0 until 64).map(d =>
        floor(avg(col("q").getItem(d))).cast("long")): _*).as("centroid"))
    val panel = e.filter(pmod(col("vec_id"), lit(50)) === 0)
      .select(col("vec_id").as("qid"), col("q").as("qq"),
        col("bucket").as("qbucket"))
    val probed = panel.crossJoin(broadcast(cent))
      .withColumn("cdot", dotLong(col("centroid"), col("qq")))
      .groupBy("qid")
      .agg(max(struct(col("cdot"), (-col("label")).as("nl"))).as("m"),
        first(col("qq")).as("qq"), first(col("qbucket")).as("qbucket"))
      .select(col("qid"), (-col("m.nl")).as("probe_label"), col("qq"),
        col("qbucket"))
      // panel-sized (one row per query): materialize so both tiers read
      // the same tiny table instead of replanning the centroid argmax,
      // and the candidate joins are the only joins left in the plan
      .localCheckpoint()
    val byDot = Window.partitionBy("qid")
      .orderBy(col("dot").desc, col("vec_id").asc)
    val tierIvf = e
      .join(broadcast(probed),
        col("label") === col("probe_label") && col("vec_id") =!= col("qid"))
      .withColumn("dot", dotLong(col("q"), col("qq")))
      .withColumn("rank_a", row_number().over(byDot))
      .filter(col("rank_a") <= RrfDepth)
      .select(col("qid"), col("vec_id"), col("rank_a"))
    // the multi-probe neighborhood (query bucket + Hamming-1 flips)
    // EXPLODES into an equi-join key — a per-row Hamming predicate
    // would plan as a nested loop over the corpus; the exploded probe
    // list keeps the candidate join keyed on the bucket column
    // (probe values are distinct, so no candidate duplicates)
    val probes = probed.select(col("qid"), col("qq"),
      explode(array(col("qbucket") +:
        (0 until BucketedPlanes).map(i =>
          col("qbucket").bitwiseXOR(lit(1L << i))): _*)).as("pbucket"))
    val tierLsh = e
      .join(broadcast(probes),
        col("bucket") === col("pbucket") && col("vec_id") =!= col("qid"))
      .withColumn("dot", dotLong(col("q"), col("qq")))
      .withColumn("rank_b", row_number().over(byDot))
      .filter(col("rank_b") <= RrfDepth)
      .select(col("qid").as("qid_b"), col("vec_id").as("vec_id_b"),
        col("rank_b"))
    (probed, tierIvf, tierLsh, fusedOf(tierIvf, tierLsh))
  }

  /** RRF score join over the two tier rank tables (each ≤ |panel|·20
    * rows) — kept lazy; the tiers it reads are materialized.
    */
  private def fusedOf(tierIvf: DataFrame, tierLsh: DataFrame): DataFrame =
    tierIvf
      .join(tierLsh, col("qid") === col("qid_b") &&
        col("vec_id") === col("vec_id_b"), "full_outer")
      .select(coalesce(col("qid"), col("qid_b")).as("qid"),
        coalesce(col("vec_id"), col("vec_id_b")).as("vec_id"),
        (coalesce(expr(s"1000000000 div ($RrfK + rank_a)"), lit(0L)) +
          coalesce(expr(s"1000000000 div ($RrfK + rank_b)"), lit(0L)))
          .as("rrf"))

  /** fused top-5 per query with the (rrf desc, vec_id) total order */
  private def rrfTop5(fused: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byRrf = Window.partitionBy("qid")
      .orderBy(col("rrf").desc, col("vec_id").asc)
    fused.withColumn("rank", row_number().over(byRrf))
      .filter(col("rank") <= 5)
  }

  private def rrfFusion(spark: SparkSession, dir: String): DataFrame =
    rrfTop5(rrfTiers(spark, dir)._4)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("rrf"))
      .orderBy("qid", "rank")

  // -------------------------------------------------------------------
  // sim_rrf_recall: the fusion MEASURED — recall@5 of the IVF tier,
  // the LSH tier, and their RRF fusion against the exact brute top-5
  // for the same panel, in one oracle row. This is the number that
  // justifies (or kills) the ensemble: fusion must recover neighbors
  // either tier alone misses, and the measured-design discipline
  // (dd_lsh_tuning / sim_ivf_sweep / sim_ann_recall) applies to the
  // combiner too. The brute pass is panel-bounded (corpus × |panel|
  // comparisons in one broadcast scan) — the standard sampled recall
  // estimation a production deployment runs on an eval panel, never
  // on the full query load.
  // -------------------------------------------------------------------
  private def rrfRecall(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (probed, tierIvf, tierLsh, fused) = rrfTiers(spark, dir)
    val e = emb(spark, dir).withColumn("q", expr(quantize))
    val byDot = Window.partitionBy("qid")
      .orderBy(col("dot").desc, col("vec_id").asc)
    val exact = e
      .join(broadcast(probed.select(col("qid"), col("qq"))),
        col("vec_id") =!= col("qid"))
      .withColumn("dot", dotLong(col("q"), col("qq")))
      .withColumn("rk", row_number().over(byDot))
      .filter(col("rk") <= 5)
      .select(col("qid"), col("vec_id"))
    def hits(cand: DataFrame): DataFrame =
      exact.join(cand, Seq("qid", "vec_id"), "left_semi")
        .agg(count(lit(1)).as("h"))
    val nSlots = exact.agg(count(lit(1)).as("n_slots"))
    val hIvf = hits(tierIvf.filter(col("rank_a") <= 5))
      .select(col("h").as("hits_ivf"))
    val hLsh = hits(tierLsh.select(col("qid_b").as("qid"),
        col("vec_id_b").as("vec_id"), col("rank_b"))
      .filter(col("rank_b") <= 5))
      .select(col("h").as("hits_lsh"))
    val hFus = hits(rrfTop5(fused).select(col("qid"), col("vec_id")))
      .select(col("h").as("hits_fused"))
    nSlots.crossJoin(hIvf).crossJoin(hLsh).crossJoin(hFus)
      .select(col("n_slots"), col("hits_ivf"), col("hits_lsh"),
        col("hits_fused"),
        expr("(1000 * hits_ivf) div n_slots").as("recall_ivf_pm"),
        expr("(1000 * hits_lsh) div n_slots").as("recall_lsh_pm"),
        expr("(1000 * hits_fused) div n_slots").as("recall_fused_pm"))
  }

  private val rrfSqlPrefix: String = {
    val centroid = (0 until 64)
      .map(d => s"CAST(floor(avg(q[${d + 1}])) AS BIGINT)")
      .mkString("[", ", ", "]")
    s"""WITH qt AS (SELECT vec_id, label, $quantizeDuck AS q FROM embeddings),
       |sig AS (SELECT vec_id, label, q, ${bucketSqlDuck(BucketedPlanes)}
       |          AS bucket FROM qt),
       |cent AS (SELECT label, $centroid AS centroid FROM qt GROUP BY label),
       |panel AS (SELECT vec_id AS qid, q AS qq, bucket AS qbucket
       |          FROM sig WHERE vec_id % 50 = 0),
       |probed AS (SELECT qid, qq, qbucket, label AS probe_label FROM (
       |    SELECT p.qid, p.qq, p.qbucket, c.label,
       |      row_number() OVER (PARTITION BY p.qid ORDER BY
       |        ${PortableHash.dotSqlDuck("c.centroid", "p.qq")} DESC,
       |        c.label ASC) AS crn
       |    FROM panel p, cent c) r WHERE crn = 1),
       |ta AS (SELECT qid, vec_id, rank_a FROM (
       |    SELECT pr.qid, t.vec_id,
       |      row_number() OVER (PARTITION BY pr.qid ORDER BY
       |        ${PortableHash.dotSqlDuck("t.q", "pr.qq")} DESC,
       |        t.vec_id ASC) AS rank_a
       |    FROM sig t JOIN probed pr
       |      ON t.label = pr.probe_label AND t.vec_id <> pr.qid) x
       |  WHERE rank_a <= $RrfDepth),
       |tb AS (SELECT qid, vec_id, rank_b FROM (
       |    SELECT pr.qid, t.vec_id,
       |      row_number() OVER (PARTITION BY pr.qid ORDER BY
       |        ${PortableHash.dotSqlDuck("t.q", "pr.qq")} DESC,
       |        t.vec_id ASC) AS rank_b
       |    FROM sig t JOIN probed pr
       |      ON bit_count(xor(t.bucket, pr.qbucket)) <= 1
       |        AND t.vec_id <> pr.qid) x
       |  WHERE rank_b <= $RrfDepth),
       |fused AS (SELECT COALESCE(a.qid, b.qid) AS qid,
       |    COALESCE(a.vec_id, b.vec_id) AS vec_id,
       |    COALESCE(1000000000 // ($RrfK + a.rank_a), 0)
       |      + COALESCE(1000000000 // ($RrfK + b.rank_b), 0) AS rrf
       |  FROM ta a FULL OUTER JOIN tb b
       |    ON a.qid = b.qid AND a.vec_id = b.vec_id)""".stripMargin
  }

  private val rrfFusionSql: String =
    s"""$rrfSqlPrefix
       |SELECT qid, CAST(rank AS BIGINT) AS rank, vec_id,
       |  CAST(rrf AS BIGINT) AS rrf
       |FROM (SELECT qid, vec_id, rrf,
       |        row_number() OVER (PARTITION BY qid
       |          ORDER BY rrf DESC, vec_id ASC) AS rank
       |      FROM fused) f
       |WHERE rank <= 5
       |ORDER BY qid, rank""".stripMargin

  private val rrfRecallSql: String =
    s"""$rrfSqlPrefix,
       |exact AS (SELECT qid, vec_id FROM (
       |    SELECT pr.qid, t.vec_id,
       |      row_number() OVER (PARTITION BY pr.qid ORDER BY
       |        ${PortableHash.dotSqlDuck("t.q", "pr.qq")} DESC,
       |        t.vec_id ASC) AS rk
       |    FROM qt t, probed pr WHERE t.vec_id <> pr.qid) x
       |  WHERE rk <= 5),
       |fivf AS (SELECT qid, vec_id FROM ta WHERE rank_a <= 5),
       |flsh AS (SELECT qid, vec_id FROM tb WHERE rank_b <= 5),
       |ffus AS (SELECT qid, vec_id FROM (
       |    SELECT qid, vec_id,
       |      row_number() OVER (PARTITION BY qid
       |        ORDER BY rrf DESC, vec_id ASC) AS rank
       |    FROM fused) f WHERE rank <= 5),
       |n AS (SELECT COUNT(*) AS n_slots FROM exact),
       |hi AS (SELECT COUNT(*) AS hits_ivf FROM exact
       |       SEMI JOIN fivf USING (qid, vec_id)),
       |hl AS (SELECT COUNT(*) AS hits_lsh FROM exact
       |       SEMI JOIN flsh USING (qid, vec_id)),
       |hf AS (SELECT COUNT(*) AS hits_fused FROM exact
       |       SEMI JOIN ffus USING (qid, vec_id))
       |SELECT n_slots, hits_ivf, hits_lsh, hits_fused,
       |  CAST((1000 * hits_ivf) // n_slots AS BIGINT) AS recall_ivf_pm,
       |  CAST((1000 * hits_lsh) // n_slots AS BIGINT) AS recall_lsh_pm,
       |  CAST((1000 * hits_fused) // n_slots AS BIGINT) AS recall_fused_pm
       |FROM n, hi, hl, hf""".stripMargin

  // -------------------------------------------------------------------
  // sim_inertia: per-cluster INERTIA (within-cluster sum of squared
  // distances) over the session k-means assignment — THE quality /
  // convergence diagnostic for the clustering substrate every
  // cluster-bounded consumer (dd_semdedup, sim_ivf_*) depends on:
  // rising inertia on a refresh means the cluster count stopped
  // tracking corpus growth. One scan over the cached (vec_id,
  // cluster, dist) table — dist is already the exact integer squared
  // L2 to the assigned centroid, so the rollup adds nothing to the
  // Lloyd's cost and is exact at any scale.
  // -------------------------------------------------------------------
  private def inertia(spark: SparkSession, dir: String): DataFrame =
    kmeansAssigned(spark, dir)
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("dist")).as("inertia"),
        max(col("dist")).as("max_dist"))
      .orderBy("cluster")

  private val inertiaSql =
    s"""SELECT cluster, COUNT(*) AS n_vecs,
       |  CAST(SUM(dist) AS BIGINT) AS inertia,
       |  CAST(MAX(dist) AS BIGINT) AS max_dist
       |FROM ($kmeansAssignSql) ka
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------------------
  // sim_mmr_select: MAXIMAL MARGINAL RELEVANCE (Carbonell & Goldstein,
  // SIGIR'98) — greedy diversity-aware selection, the missing third
  // mode next to top-k (pure relevance) and dedup (pure redundancy
  // removal): pick k items that are RELEVANT to the query AND far
  // from each other. λ = 1/2, so the integer objective is simply
  // rel − max-dot-to-selected; round 1 has no selected set and picks
  // by pure relevance. All arithmetic is the quantized BIGINT dot
  // (sim_topk_quantized's), so both engines replay the greedy chain
  // decision-for-decision — ties broken by vec_id, making the whole
  // selection order deterministic.
  //
  // Scale shape: greedy MMR is inherently sequential in k, so the
  // honest distributed form is k rounds of: one corpus scan computing
  // score = rel − maxdot map-side, one TakeOrderedAndProject(1) (per-
  // partition top-1 heaps + driver merge — never a sort), then fold
  // the picked vector (64 ints — a point lookup, the sim_ann_lsh
  // driver-side convention) into each candidate's running maxdot via
  // the codegen'd dotLong. Per-candidate state is ONE BIGINT (the
  // running max), not the k picked vectors; localCheckpoint truncates
  // the k-deep lineage. At 100 TB: k scans of the embedding table,
  // each embarrassingly parallel — the same cost profile as k top-k
  // queries, with no pairwise candidate×candidate work anywhere.
  // -------------------------------------------------------------------
  private val MmrK = 5

  private def mmrSelect(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir).withColumn("q", expr(quantize))
    val qv = e.filter(col("vec_id") === 0).select("q")
      .head().getSeq[Long](0) // query vector: driver-side point lookup
    val qlit = qv.mkString("array(", "L,", "L)")
    var cand = e.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("q"),
        dotLong(col("q"), expr(qlit)).as("rel"))
      .withColumn("maxdot", lit(null).cast("long"))
      .localCheckpoint()
    val picks = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]()
    for (rank <- 1 to MmrK) {
      val p = cand
        .withColumn("mmr", col("rel") - coalesce(col("maxdot"), lit(0L)))
        .orderBy(col("mmr").desc, col("vec_id").asc)
        .limit(1).head()
      val (pid, pq) = (p.getLong(0), p.getSeq[Long](1))
      picks += ((rank.toLong, pid, p.getLong(2), p.getLong(4)))
      if (rank < MmrK) {
        val plit = pq.mkString("array(", "L,", "L)")
        val d = dotLong(col("q"), expr(plit))
        cand = cand.filter(col("vec_id") =!= pid)
          .withColumn("maxdot", coalesce(greatest(col("maxdot"), d), d))
          .localCheckpoint()
      }
    }
    import spark.implicits._
    picks.toSeq.toDF("rank", "vec_id", "rel", "mmr")
  }

  /** Plan guard hook: one MMR round over the candidate table — must
    * plan as map-side score projection + TakeOrderedAndProject(1), no
    * join of any kind (the picked vectors fold in as literals).
    */
  private[graft] def mmrRoundPlan(spark: SparkSession, dir: String)
      : org.apache.spark.sql.execution.SparkPlan = {
    val e = emb(spark, dir).withColumn("q", expr(quantize))
    val qv = e.filter(col("vec_id") === 0).select("q")
      .head().getSeq[Long](0)
    val qlit = qv.mkString("array(", "L,", "L)")
    e.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("q"),
        dotLong(col("q"), expr(qlit)).as("rel"))
      .withColumn("maxdot", dotLong(col("q"), expr(qlit)))
      .withColumn("mmr", col("rel") - coalesce(col("maxdot"), lit(0L)))
      .orderBy(col("mmr").desc, col("vec_id").asc)
      .limit(1)
      .queryExecution.executedPlan
  }

  private val mmrSelectSql = {
    val sel = (1 to MmrK).map { r =>
      val prev = if (r == 1) "c0" else s"c${r - 1}"
      val s =
        s"""s$r AS (SELECT vec_id, q, rel, md FROM $prev
           |  ORDER BY rel - coalesce(md, 0) DESC, vec_id ASC LIMIT 1)"""
          .stripMargin
      val c = if (r == MmrK) "" else {
        val dot = PortableHash.dotSqlDuck("c.q", "s.q")
        s""",
           |c$r AS (SELECT c.vec_id, c.q, c.rel,
           |    coalesce(greatest(c.md, $dot), $dot) AS md
           |  FROM c${r - 1} c, s$r s WHERE c.vec_id <> s.vec_id)"""
          .stripMargin
      }
      s + c
    }.mkString(",\n")
    val out = (1 to MmrK).map(r =>
      s"SELECT $r AS rank, vec_id, rel, rel - coalesce(md, 0) AS mmr FROM s$r")
      .mkString("\nUNION ALL ")
    s"""WITH qt AS (SELECT vec_id, $quantizeDuck AS q FROM embeddings),
       |qq AS (SELECT q FROM qt WHERE vec_id = 0),
       |c0 AS (SELECT t.vec_id, t.q,
       |    ${PortableHash.dotSqlDuck("t.q", "qq.q")} AS rel,
       |    CAST(NULL AS BIGINT) AS md
       |  FROM qt t, qq WHERE t.vec_id <> 0),
       |$sel
       |SELECT * FROM ($out) ORDER BY rank""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_mmr_select"     -> (mmrSelect _),
    "sim_label_knn_acc"  -> (labelKnnAcc _),
    "sim_rrf_fusion"     -> (rrfFusion _),
    "sim_rrf_recall"     -> (rrfRecall _),
    "sim_inertia"        -> (inertia _),
    "sim_dim_variance"   -> (dimVariance _),
    "sim_prune_recall"   -> (pruneRecall _),
    "sim_pca_recall"     -> (pcaRecall _),
    "sim_mrl_recall"     -> (mrlRecall _),
    "sim_rp_recall"      -> (rpRecall _),
    "sim_bucket_drift"   -> (bucketDrift _),
    "sim_batch_ivf"      -> (batchIvf _),
    "sim_ivf_sweep"      -> (ivfSweep _),
    "sim_ivf_persist"    -> (ivfPersist _),
    "sim_ivf_delta"      -> (ivfDelta _),
    "sim_hard_negatives" -> (hardNegatives _),
    "sim_mips_norm"      -> (mipsNorm _),
    "sim_pq_topk"        -> (pqTopk _),
    "sim_pq_recall"      -> (pqRecall _),
    "sim_ivfpq_recall"   -> (ivfpqRecall _),
    "sim_quantize_audit" -> (quantizeAudit _),
    "sim_knn_batch"      -> (knnBatch _),
    "sim_silhouette"     -> (silhouette _),
    "sim_pair_hist"      -> (pairHist _),
    "sim_kmeans_assign"  -> (kmeansAssigned _),
    "sim_ann_recall"     -> (annRecall _),
    "sim_topk_quantized" -> (topkQuantized _),
    "sim_topk_cosine"    -> (topkCosine _),
    "sim_range_search"   -> (rangeSearch _),
    "sim_ann_lsh"        -> (annLsh _),
    "sim_ann_bucketed"   -> (annBucketed _),
    "sim_ivf_label"      -> (ivfLabel _)
  )

  // a def, not a val: sim_pca_recall's oracle is GENERATED when the
  // query runs (driver-eigen literals), so the map must be re-read at
  // dump time — Verify writes oracle_sql.json after all queries finish
  def oracleSql: Map[String, String] = Map(
    "sim_mmr_select"     -> mmrSelectSql,
    "sim_label_knn_acc"  -> labelKnnAccSql,
    "sim_rrf_fusion"     -> rrfFusionSql,
    "sim_rrf_recall"     -> rrfRecallSql,
    "sim_inertia"        -> inertiaSql,
    "sim_batch_ivf"      -> batchIvfSql,
    "sim_ivf_sweep"      -> ivfSweepSql,
    "sim_ivf_persist"    -> ivfPersistSql,
    "sim_ivf_delta"      -> ivfDeltaSql,
    "sim_hard_negatives" -> hardNegativesSql,
    "sim_mips_norm"      -> mipsNormSql,
    "sim_pq_topk"        -> pqTopkSql,
    "sim_pq_recall"      -> pqRecallSql,
    "sim_ivfpq_recall"   -> ivfpqRecallSql,
    "sim_quantize_audit" -> quantizeAuditSql,
    "sim_dim_variance"   -> dimVarianceSql,
    "sim_prune_recall"   -> pruneRecallSql,
    "sim_pca_recall"     -> pcaOracleSqlRef.get(),
    "sim_mrl_recall"     -> mrlRecallSql,
    "sim_rp_recall"      -> rpRecallSql,
    "sim_bucket_drift"   -> bucketDriftSql,
    "sim_knn_batch"      -> knnBatchSql,
    "sim_silhouette"     -> silhouetteSql,
    "sim_pair_hist"      -> pairHistSql,
    "sim_kmeans_assign"  -> kmeansAssignSql,
    "sim_ann_recall"     -> annRecallSql,
    "sim_topk_quantized" -> topkQuantizedSql,
    "sim_topk_cosine"    -> topkCosineSql,
    "sim_range_search"   -> rangeSearchSql,
    "sim_ann_lsh"        -> annLshSql,
    "sim_ann_bucketed"   -> annBucketedSql,
    "sim_ivf_label"      -> ivfLabelSql
  )
}
