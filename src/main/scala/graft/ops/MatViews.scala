package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Expression}
import org.apache.spark.sql.catalyst.plans.logical.Project
import org.apache.spark.sql.functions._

import graft.plans.MvRewrite

/** Materialized-view serving over the lineitem fact (SURVEY.md §2b
  * maintenance/storage tier + the plans/MvRewrite optimizer rule).
  *
  * The rollup is built ONCE per SF as a disk fixture (write-once
  * marker, mtime-keyed) at the (l_returnflag, l_linestatus) grain with
  * two pre-summed measures and the row count; the gate query then asks
  * the RAW table the coarser l_returnflag question, and the installed
  * rewrite rule serves it from the rollup — MvRewriteSpec pins that the
  * executed plan reads the MV fixture and never touches
  * lineitem.parquet. The DuckDB oracle computes the same answer from
  * the raw table, so the gate proves the rewrite is exact, not just
  * plan-shaped.
  */
object MatViews {

  /** The measure expressions, shared verbatim by the MV builder, the
    * rewrite registration, and the gate query — the rule matches by
    * canonical expression equality, so all three must be one source of
    * truth.
    */
  private def qtyLong(c: Column): Column = c.cast("long")
  private def discCents(price: Column, disc: Column): Column =
    round(price * (lit(1.0) - disc) * 100).cast("long")

  /** Write-once (l_returnflag, l_linestatus) rollup fixture. */
  private def mvLineitemPath(spark: SparkSession, dir: String): String = {
    val stamp =
      try java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(dir, "lineitem.parquet")).toMillis
      catch { case _: Exception => 0L }
    val pathF = FixtureCache.dir("mv_lineitem", dir,
      "grain" -> "rf_ls", "v" -> 2, "src" -> stamp)
    val marker = new java.io.File(pathF, "_GRAFT_SUCCESS")
    if (!marker.exists()) {
      spark.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(qtyLong(col("l_quantity"))).as("mv_sum_qty"),
          sum(discCents(col("l_extendedprice"), col("l_discount")))
            .as("mv_disc_cents"),
          max(qtyLong(col("l_quantity"))).as("mv_max_qty"),
          min(qtyLong(col("l_quantity"))).as("mv_min_qty"),
          count(lit(1)).as("mv_n_rows"))
        .coalesce(1)
        .write.mode("overwrite").parquet(pathF.toString)
      marker.createNewFile()
    }
    pathF.toString
  }

  /** The name-normalized OPTIMIZED form of a measure Column over the
    * base table — exactly what the rule will see under `sum(...)` in a
    * user plan (constant folding and implicit casts already applied),
    * with attribute identity erased by name (MvRewrite.normalize).
    */
  private def measureTemplate(
      spark: SparkSession, base: String, c: Column): Expression = {
    val plan = spark.read.parquet(base).select(c.as("m"))
      .queryExecution.optimizedPlan
    val raw = plan.collectFirst {
      case Project(Seq(Alias(child, _)), _) => child
    }.getOrElse(sys.error(s"measure template did not optimize to a " +
      s"single-alias Project:\n$plan"))
    MvRewrite.normalize(raw)
  }

  /** Build + register the MV for this dir and install the rule. */
  private[ops] def serveFromMv(spark: SparkSession, dir: String): Unit = {
    val mvPath = mvLineitemPath(spark, dir)
    val base = s"$dir/lineitem.parquet"
    val baseKey = MvRewrite.keyFor(spark, base)
    MvRewrite.register(
      baseKey,
      MvRewrite.MvDef(
        dims = Seq("l_returnflag", "l_linestatus"),
        measures = Seq(
          "mv_sum_qty" ->
            measureTemplate(spark, base, qtyLong(col("l_quantity"))),
          "mv_disc_cents" ->
            measureTemplate(spark, base,
              discCents(col("l_extendedprice"), col("l_discount")))),
        countCol = "mv_n_rows",
        mvPath = mvPath,
        maxes = Seq("mv_max_qty" ->
          measureTemplate(spark, base, qtyLong(col("l_quantity")))),
        mins = Seq("mv_min_qty" ->
          measureTemplate(spark, base, qtyLong(col("l_quantity")))),
        baseStamp = MvRewrite.stampFor(baseKey)))
    MvRewrite.install(spark)
  }

  // -------------------------------------------------------------------
  // ax_mv_rewrite: the user asks the RAW fact table a question the MV
  // grain subsumes (group by l_returnflag alone — coarser than the
  // rollup's two-dimension grain, so the MV re-aggregates). At 100 TB
  // the difference is a full fact scan vs a few-hundred-row summary
  // read; the oracle answers from the raw table, proving exactness.
  // -------------------------------------------------------------------
  private def mvRewrite(spark: SparkSession, dir: String): DataFrame = {
    serveFromMv(spark, dir)
    spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy(col("l_returnflag"))
      .agg(
        sum(qtyLong(col("l_quantity"))).as("sum_qty"),
        sum(discCents(col("l_extendedprice"), col("l_discount")))
          .as("disc_cents"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("l_returnflag").asc)
  }

  private val mvRewriteSql =
    """SELECT l_returnflag,
      |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |  CAST(SUM(CAST(round(l_extendedprice*(1.0-l_discount)*100)
      |    AS BIGINT)) AS BIGINT) AS disc_cents,
      |  COUNT(*) AS n_lines
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------------------
  // ax_mv_filter: a DIM-FILTERED raw-table question served by the same
  // rollup — the predicate selects whole MV groups (l_linestatus is a
  // grain column), so the rule maps it onto the rollup verbatim and
  // re-aggregates the coarser key. At 100 TB: a predicate + group-by
  // the user writes against the fact costs a summary read.
  // -------------------------------------------------------------------
  private def mvFilter(spark: SparkSession, dir: String): DataFrame = {
    serveFromMv(spark, dir)
    spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_linestatus") === "F")
      .groupBy(col("l_returnflag"))
      .agg(
        sum(qtyLong(col("l_quantity"))).as("sum_qty"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("l_returnflag").asc)
  }

  private val mvFilterSql =
    """SELECT l_returnflag,
      |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |  COUNT(*) AS n_lines
      |FROM lineitem WHERE l_linestatus = 'F'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------------------
  // ax_mv_delta: INCREMENTAL maintenance of the same rollup — the third
  // leg of the MV story (build once / serve via the rewrite rule /
  // maintain from the delta). The stored rollup holds everything
  // shipped BEFORE the cut (a write-once fixture standing in for
  // yesterday's MV); at query time only the post-cut slice of the fact
  // is aggregated (at 100 TB: the new partitions), and the merge is
  // `stored ∪ delta → re-aggregate` — sum/count are distributive, so
  // upkeep work is Θ(delta + |MV|), never a fact re-scan. The oracle
  // computes the full-table rollup directly, proving the incremental
  // path lands on EXACTLY the batch answer.
  // -------------------------------------------------------------------
  private[ops] val DeltaCut = "2001-06-01"

  private[ops] def mvPreCutPath(spark: SparkSession, dir: String): String = {
    val stamp =
      try java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(dir, "lineitem.parquet")).toMillis
      catch { case _: Exception => 0L }
    val pathF = FixtureCache.dir("mv_lineitem_pre", dir,
      "grain" -> "rf_ls", "cut" -> DeltaCut, "v" -> 1, "src" -> stamp)
    val marker = new java.io.File(pathF, "_GRAFT_SUCCESS")
    if (!marker.exists()) {
      rollup(spark.read.parquet(s"$dir/lineitem.parquet")
          .filter(col("l_shipdate") < lit(DeltaCut)))
        .coalesce(1)
        .write.mode("overwrite").parquet(pathF.toString)
      marker.createNewFile()
    }
    pathF.toString
  }

  /** the (l_returnflag, l_linestatus) rollup of a lineitem slice */
  private[ops] def rollup(li: DataFrame): DataFrame = li
    .groupBy(col("l_returnflag"), col("l_linestatus"))
    .agg(
      sum(qtyLong(col("l_quantity"))).as("mv_sum_qty"),
      sum(discCents(col("l_extendedprice"), col("l_discount")))
        .as("mv_disc_cents"),
      count(lit(1)).as("mv_n_rows"))

  private def mvDelta(spark: SparkSession, dir: String): DataFrame = {
    val stored = spark.read.parquet(mvPreCutPath(spark, dir))
    val delta = rollup(spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_shipdate") >= lit(DeltaCut)))
    stored.unionByName(delta)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("mv_sum_qty")).as("mv_sum_qty"),
        sum(col("mv_disc_cents")).as("mv_disc_cents"),
        sum(col("mv_n_rows")).as("mv_n_rows"))
      .orderBy(col("l_returnflag").asc, col("l_linestatus").asc)
  }

  private val mvDeltaSql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS mv_sum_qty,
      |  CAST(SUM(CAST(round(l_extendedprice*(1.0-l_discount)*100)
      |    AS BIGINT)) AS BIGINT) AS mv_disc_cents,
      |  COUNT(*) AS mv_n_rows
      |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -------------------------------------------------------------------
  // ax_mv_star: JOIN-AWARE MV serving — the rollup is materialized over
  // the FK star join lineitem ⋈ orders at a grain drawn from BOTH sides
  // (o_orderpriority from the dim, l_returnflag from the fact), and the
  // user's aggregate-above-the-join is served from it: zero fact bytes,
  // zero dim bytes, zero join at query time. This is the single most
  // common real-world MV shape (an aggregate over a star join); at
  // 100 TB the difference is a fact-scan + shuffle join vs a read of a
  // ~15-row summary. The matcher pins the join exactly (inner, the
  // registered equi-pair) and absorbs only the IsNotNull(join key)
  // conjuncts the optimizer infers — anything else falls back to raw.
  // The oracle computes the same answer from the raw join.
  // -------------------------------------------------------------------
  private def mvStarPath(spark: SparkSession, dir: String): String = {
    val stamp =
      try java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(dir, "lineitem.parquet")).toMillis
      catch { case _: Exception => 0L }
    val pathF = FixtureCache.dir("mv_star", dir,
      "grain" -> "op_rf", "v" -> 1, "src" -> stamp)
    val marker = new java.io.File(pathF, "_GRAFT_SUCCESS")
    if (!marker.exists()) {
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      val ord = spark.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), col("o_orderpriority"))
      li.join(broadcast(ord), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"), col("l_returnflag"))
        .agg(
          sum(qtyLong(col("l_quantity"))).as("mv_sum_qty"),
          sum(discCents(col("l_extendedprice"), col("l_discount")))
            .as("mv_disc_cents"),
          count(lit(1)).as("mv_n_rows"))
        .coalesce(1)
        .write.mode("overwrite").parquet(pathF.toString)
      marker.createNewFile()
    }
    pathF.toString
  }

  private[ops] def serveStarFromMv(
      spark: SparkSession, dir: String): Unit = {
    val mvPath = mvStarPath(spark, dir)
    val fact = s"$dir/lineitem.parquet"
    val dim = s"$dir/orders.parquet"
    val factKey = MvRewrite.keyFor(spark, fact)
    val dimKey = MvRewrite.keyFor(spark, dim)
    MvRewrite.registerStar(MvRewrite.StarMvDef(
      factKey = factKey,
      dimKey = dimKey,
      joinFactCol = "l_orderkey",
      joinDimCol = "o_orderkey",
      serve = MvRewrite.MvDef(
        dims = Seq("o_orderpriority", "l_returnflag"),
        measures = Seq(
          "mv_sum_qty" ->
            measureTemplate(spark, fact, qtyLong(col("l_quantity"))),
          "mv_disc_cents" ->
            measureTemplate(spark, fact,
              discCents(col("l_extendedprice"), col("l_discount")))),
        countCol = "mv_n_rows",
        mvPath = mvPath),
      factStamp = MvRewrite.stampFor(factKey),
      dimStamp = MvRewrite.stampFor(dimKey)))
    MvRewrite.install(spark)
  }

  private def mvStar(spark: SparkSession, dir: String): DataFrame = {
    serveStarFromMv(spark, dir)
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val ord = spark.read.parquet(s"$dir/orders.parquet")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_returnflag") === "R")
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(qtyLong(col("l_quantity"))).as("sum_qty"),
        sum(discCents(col("l_extendedprice"), col("l_discount")))
          .as("disc_cents"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("o_orderpriority").asc)
  }

  private val mvStarSql =
    """SELECT o.o_orderpriority,
      |  CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |  CAST(SUM(CAST(round(l.l_extendedprice*(1.0-l.l_discount)*100)
      |    AS BIGINT)) AS BIGINT) AS disc_cents,
      |  COUNT(*) AS n_lines
      |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |WHERE l.l_returnflag = 'R'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------------------
  // ax_mv_minmax: the full distributive-aggregate algebra served from
  // one rollup — max and min re-aggregate exactly like sum and count
  // (max of partial maxes), so the same grain answers range questions.
  // -------------------------------------------------------------------
  private def mvMinMax(spark: SparkSession, dir: String): DataFrame = {
    serveFromMv(spark, dir)
    spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy(col("l_linestatus"))
      .agg(
        max(qtyLong(col("l_quantity"))).as("max_qty"),
        min(qtyLong(col("l_quantity"))).as("min_qty"),
        sum(qtyLong(col("l_quantity"))).as("sum_qty"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("l_linestatus").asc)
  }

  private val mvMinMaxSql =
    """SELECT l_linestatus,
      |  CAST(MAX(CAST(l_quantity AS BIGINT)) AS BIGINT) AS max_qty,
      |  CAST(MIN(CAST(l_quantity AS BIGINT)) AS BIGINT) AS min_qty,
      |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |  COUNT(*) AS n_lines
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ax_mv_rewrite" -> (mvRewrite _),
    "ax_mv_filter"  -> (mvFilter _),
    "ax_mv_minmax"  -> (mvMinMax _),
    "ax_mv_star"    -> (mvStar _),
    "ax_mv_delta"   -> (mvDelta _)
  )

  val oracleSql: Map[String, String] = Map(
    "ax_mv_rewrite" -> mvRewriteSql,
    "ax_mv_filter"  -> mvFilterSql,
    "ax_mv_minmax"  -> mvMinMaxSql,
    "ax_mv_star"    -> mvStarSql,
    "ax_mv_delta"   -> mvDeltaSql
  )
}
