package graft.plans

import graft.SparkTestSession
import graft.ops.Extensions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The MV rewrite must fire exactly when it is allowed to — and NEVER
  * otherwise. Positive pins: the gate query's executed plan reads the
  * rollup fixture and touches the raw fact zero times, at both the
  * coarser and the exact grain. Negative pins: a filter, an unsupported
  * aggregate, or a non-dimension grouping key each force the raw scan.
  * Exactness: the served answer equals a raw recompute taken with the
  * catalog cleared.
  */
class MvRewriteSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def gate() = Extensions.queries("ax_mv_rewrite")(spark, dir)

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("gate query is served from the MV, raw fact never scanned") {
    val p = planOf(gate())
    assert(p.contains("mv_lineitem"), s"MV fixture not in plan:\n$p")
    assert(!p.contains("lineitem.parquet"),
      s"raw fact scan survived the rewrite:\n$p")
  }

  test("exact-grain query (both dims) also rewrites, with count(*)") {
    gate() // registers the MV + installs the rule
    val df = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity").cast("long")).as("q"),
        count(lit(1)).as("n"))
    val p = planOf(df)
    assert(p.contains("mv_lineitem") && !p.contains("lineitem.parquet"))
  }

  test("served answer equals a raw recompute (catalog cleared)") {
    val served = gate().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    MvRewrite.clear()
    try {
      val raw = spark.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_returnflag"))
        .agg(
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * 100).cast("long")).as("disc_cents"),
          count(lit(1)).as("n_lines"))
      assert(!planOf(raw).contains("mv_lineitem"),
        "cleared catalog must not rewrite")
      val expect = raw.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1)
      assert(served.sameElements(expect))
    } finally gate() // re-register for any later suite
  }

  test("a measure-column filter blocks the rewrite") {
    gate()
    val df = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_quantity") > 10)
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity").cast("long")).as("q"))
    assert(!planOf(df).contains("mv_lineitem"),
      "a measure-filtered query must not be served by the unfiltered grain")
  }

  test("a dimension-only filter is served from the MV (ax_mv_filter)") {
    val df = Extensions.queries("ax_mv_filter")(spark, dir)
    val p = planOf(df)
    assert(p.contains("mv_lineitem") && !p.contains("lineitem.parquet"),
      s"dim-filtered query not served from the rollup:\n$p")
  }

  test("an unsupported aggregate blocks the rewrite") {
    gate()
    val df = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy(col("l_returnflag"))
      .agg(avg(col("l_quantity")).as("a"))
    assert(!planOf(df).contains("mv_lineitem"),
      "avg is not derivable from the registered measures")
  }

  test("a non-dimension grouping key blocks the rewrite") {
    gate()
    val df = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy(col("l_shipdate"))
      .agg(sum(col("l_quantity").cast("long")).as("q"))
    assert(!planOf(df).contains("mv_lineitem"),
      "l_shipdate is not in the rollup grain")
  }

  test("the SQL front door is served from the MV too") {
    val p = planOf(Extensions.queries("sq_mv_serve_sql")(spark, dir))
    assert(p.contains("mv_lineitem"), s"SQL text not served from MV:\n$p")
    assert(!p.contains("lineitem.parquet"),
      s"raw fact scan survived the SQL-side rewrite:\n$p")
  }

  test("the min/max SQL twin is served from the MV too") {
    val p = planOf(Extensions.queries("sq_mv_minmax_sql")(spark, dir))
    assert(p.contains("mv_lineitem"),
      s"min/max SQL text not served from MV:\n$p")
    assert(!p.contains("lineitem.parquet"),
      s"raw fact scan survived the min/max SQL-side rewrite:\n$p")
  }

  test("star upkeep reads the stored join rollup and joins only the delta slice") {
    val df = Extensions.queries("ax_mv_star_delta")(spark, dir)
    val p = planOf(df)
    assert(p.contains("mv_star_pre"), s"stored star rollup not read:\n$p")
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"),
      s"delta slice filter not pushed to the fact scan:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the delta must acquire its grain via a broadcast dim join:\n$p")
  }

  test("incremental upkeep reads the stored rollup and only the delta slice") {
    val df = Extensions.queries("ax_mv_delta")(spark, dir)
    val p = planOf(df)
    assert(p.contains("mv_lineitem_pre"), s"stored rollup not read:\n$p")
    // the fact scan must carry the pushed post-cut shipdate predicate
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"),
      s"delta slice filter not pushed to the fact scan:\n$p")
  }

  test("a nondeterministic filter blocks the rewrite") {
    gate()
    // rand() < p is NONDETERMINISTIC and references no column —
    // remapping it onto the rollup would sample whole MV groups instead
    // of raw rows; the matcher must leave it alone. (An out-of-range
    // constant like 2.0 won't do: Spark 4 folds that comparison away
    // before the MV rule ever sees the filter.)
    val df = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(rand(7) < lit(0.5))
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity").cast("long")).as("q"))
    assert(!planOf(df).contains("mv_lineitem"),
      "a nondeterministic filter must not be remapped onto the rollup")
  }

  test("a rewritten base (stale registration) blocks the rewrite") {
    import org.apache.spark.sql.catalyst.expressions.{Alias => CAlias}
    import org.apache.spark.sql.catalyst.plans.logical.{Project => CProject}
    val basePath = new java.io.File("target/mvfresh_base").getAbsolutePath
    val mvPath = new java.io.File("target/mvfresh_mv").getAbsolutePath
    try {
      spark.read.parquet(s"$dir/lineitem.parquet").limit(500)
        .write.mode("overwrite").parquet(basePath)
      spark.read.parquet(basePath)
        .groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity").cast("long")).as("mv_q"),
          count(lit(1)).as("mv_n"))
        .write.mode("overwrite").parquet(mvPath)
      val templ = {
        val plan = spark.read.parquet(basePath)
          .select(col("l_quantity").cast("long").as("m"))
          .queryExecution.optimizedPlan
        MvRewrite.normalize(plan.collectFirst {
          case CProject(Seq(CAlias(child, _)), _) => child
        }.get)
      }
      val key = MvRewrite.keyFor(spark, basePath)
      MvRewrite.register(key, MvRewrite.MvDef(
        dims = Seq("l_returnflag"), measures = Seq("mv_q" -> templ),
        countCol = "mv_n", mvPath = mvPath,
        baseStamp = MvRewrite.stampFor(key)))
      MvRewrite.install(spark)
      def q = spark.read.parquet(basePath)
        .groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity").cast("long")).as("q"))
      assert(planOf(q).contains("mvfresh_mv"),
        s"fresh registration must serve from the MV:\n${planOf(q)}")
      // rewrite the base AFTER registration: the stamp check must now
      // fail the match — serving the old rollup would be silently stale
      Thread.sleep(1200) // local FS mtimes can be coarse-grained
      spark.read.parquet(s"$dir/lineitem.parquet").limit(400)
        .write.mode("overwrite").parquet(basePath)
      assert(!planOf(q).contains("mvfresh_mv"),
        "a base rewritten after registration must fall back to the raw scan")
    } finally {
      MvRewrite.clear()
      gate() // re-register the standard MV for later suites
    }
  }

  // ----- join-aware (star) MV serving ---------------------------------

  private def li = spark.read.parquet(s"$dir/lineitem.parquet")
  private def ord = spark.read.parquet(s"$dir/orders.parquet")

  test("the star gate is served from the join rollup: zero fact/dim bytes") {
    val df = Extensions.queries("ax_mv_star")(spark, dir)
    val p = planOf(df)
    assert(p.contains("mv_star"), s"star MV not in plan:\n$p")
    assert(!p.contains("lineitem.parquet") && !p.contains("orders.parquet"),
      s"raw scan survived the star rewrite:\n$p")
    assert(!p.contains("Join"), s"a join survived the star rewrite:\n$p")
  }

  test("star serving is exact: equals the raw join recompute") {
    val served = Extensions.queries("ax_mv_star")(spark, dir).collect()
      .map(_.toSeq).sortBy(_.mkString("|"))
    MvRewrite.clear()
    try {
      val raw = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_returnflag") === "R")
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"),
          sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * 100).cast("long")).as("disc_cents"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("o_orderpriority").asc)
      assert(!planOf(raw).contains("mv_star"))
      val expect = raw.collect().map(_.toSeq).sortBy(_.mkString("|"))
      assert(served.sameElements(expect), "star MV answer diverged from raw")
    } finally Extensions.queries("ax_mv_star")(spark, dir)
  }

  test("a non-registered join key blocks the star rewrite") {
    Extensions.queries("ax_mv_star")(spark, dir)
    // joining fact to dim on the WRONG columns must never be served
    val df = li.join(ord, col("l_suppkey") === col("o_custkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_quantity").cast("long")).as("q"))
    assert(!planOf(df).contains("mv_star"),
      "a non-FK join must not be served from the star rollup")
  }

  test("a measure-column filter blocks the star rewrite") {
    Extensions.queries("ax_mv_star")(spark, dir)
    val df = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_quantity") > 10)
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_quantity").cast("long")).as("q"))
    assert(!planOf(df).contains("mv_star"),
      "a measure-filtered star query must not be served by the rollup")
  }

  test("a dim-table non-grain filter blocks the star rewrite") {
    // scoped to the attribute-grain MV ALONE: once an FK-grain rollup
    // is also registered this exact query is legitimately served by
    // join-back (pinned below), so the negative is "no FK grain"
    MvRewrite.clear()
    try {
      Extensions.queries("ax_mv_star")(spark, dir)
      val df = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .filter(col("o_orderstatus") === "F")
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity").cast("long")).as("q"))
      assert(!planOf(df).contains("mv_star"),
        "o_orderstatus is not in the star grain")
    } finally gate()
  }

  test("a third join blocks the star rewrite") {
    Extensions.queries("ax_mv_star")(spark, dir)
    val cust = spark.read.parquet(s"$dir/customer.parquet")
    val df = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_quantity").cast("long")).as("q"))
    assert(!planOf(df).contains("mv_star"),
      "a query joining beyond the registered star must keep its raw plan")
  }

  test("an outer join blocks the star rewrite") {
    Extensions.queries("ax_mv_star")(spark, dir)
    val df = li.join(ord, col("l_orderkey") === col("o_orderkey"),
        "left_outer")
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_quantity").cast("long")).as("q"))
    assert(!planOf(df).contains("mv_star"),
      "the MV materialized an INNER join; an outer join must not be served")
  }

  test("the star rewrite fires through the SQL front door too") {
    Extensions.queries("ax_mv_star")(spark, dir)
    li.createOrReplaceTempView("mv_star_li")
    ord.createOrReplaceTempView("mv_star_ord")
    val df = spark.sql(
      """SELECT o_orderpriority,
        |  SUM(CAST(l_quantity AS BIGINT)) AS sum_qty,
        |  COUNT(*) AS n_lines
        |FROM mv_star_li JOIN mv_star_ord
        |  ON l_orderkey = o_orderkey
        |WHERE l_returnflag = 'R'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    val p = planOf(df)
    assert(p.contains("mv_star") && !p.contains("lineitem.parquet"),
      s"SQL-text star aggregate not served from the join rollup:\n$p")
  }

  test("a rewritten DIM base makes the star registration stale") {
    // the star's freshness is the PAIR of stamps: rewriting the dim
    // alone must fail the match even though the fact is untouched
    import org.apache.spark.sql.catalyst.expressions.{Alias => CAlias}
    import org.apache.spark.sql.catalyst.plans.logical.{Project => CProject}
    val factPath = new java.io.File("target/mvstar_fact").getAbsolutePath
    val dimPath = new java.io.File("target/mvstar_dim").getAbsolutePath
    val mvPath = new java.io.File("target/mvstar_mini_mv").getAbsolutePath
    try {
      li.limit(500).write.mode("overwrite").parquet(factPath)
      ord.select(col("o_orderkey"), col("o_orderpriority"))
        .write.mode("overwrite").parquet(dimPath)
      spark.read.parquet(factPath)
        .join(spark.read.parquet(dimPath),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity").cast("long")).as("mv_q"),
          count(lit(1)).as("mv_n"))
        .write.mode("overwrite").parquet(mvPath)
      val templ = {
        val plan = spark.read.parquet(factPath)
          .select(col("l_quantity").cast("long").as("m"))
          .queryExecution.optimizedPlan
        MvRewrite.normalize(plan.collectFirst {
          case CProject(Seq(CAlias(child, _)), _) => child
        }.get)
      }
      val factKey = MvRewrite.keyFor(spark, factPath)
      val dimKey = MvRewrite.keyFor(spark, dimPath)
      MvRewrite.registerStar(MvRewrite.StarMvDef(
        factKey = factKey, dimKey = dimKey,
        joinFactCol = "l_orderkey", joinDimCol = "o_orderkey",
        serve = MvRewrite.MvDef(
          dims = Seq("o_orderpriority"),
          measures = Seq("mv_q" -> templ),
          countCol = "mv_n", mvPath = mvPath),
        factStamp = MvRewrite.stampFor(factKey),
        dimStamp = MvRewrite.stampFor(dimKey)))
      MvRewrite.install(spark)
      def q = spark.read.parquet(factPath)
        .join(spark.read.parquet(dimPath),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity").cast("long")).as("q"))
      assert(planOf(q).contains("mvstar_mini_mv"),
        s"fresh star registration must serve:\n${planOf(q)}")
      Thread.sleep(1200) // local FS mtimes can be coarse-grained
      ord.select(col("o_orderkey"), col("o_orderpriority")).limit(400)
        .write.mode("overwrite").parquet(dimPath)
      assert(!planOf(q).contains("mvstar_mini_mv"),
        "a dim rewritten after registration must fall back to the raw join")
    } finally {
      MvRewrite.clear()
      Extensions.queries("ax_mv_star")(spark, dir)
      gate()
    }
  }

  test("the coarser single-side grain is served from the star rollup") {
    Extensions.queries("ax_mv_star")(spark, dir)
    // group by the FACT-side grain column only, no filter, count(*) too
    val df = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity").cast("long")).as("q"),
        count(lit(1)).as("n"))
    val p = planOf(df)
    assert(p.contains("mv_star") && !p.contains("lineitem.parquet"),
      s"coarser star grain not served:\n$p")
  }

  test("a measure the MV does not carry blocks the rewrite") {
    gate()
    val df = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_tax").cast("long")).as("t"))
    assert(!planOf(df).contains("mv_lineitem"),
      "sum(l_tax) has no pre-summed MV column")
  }

  // ----- join-back (FK-grain) star serving ----------------------------

  test("ax_mv_star_attr is served by join-back: rollup x dim, zero fact") {
    val df = Extensions.queries("ax_mv_star_attr")(spark, dir)
    val p = planOf(df)
    assert(p.contains("mv_star_fk"), s"FK rollup not in plan:\n$p")
    assert(!p.contains("lineitem.parquet"),
      s"fact scan survived the join-back rewrite:\n$p")
    assert(p.contains("orders.parquet"),
      "join-back must read the LIVE dim to derive the attribute")
  }

  test("join-back serving is exact: equals the raw join recompute") {
    val served = Extensions.queries("ax_mv_star_attr")(spark, dir).collect()
      .map(_.toSeq).sortBy(_.mkString("|"))
    MvRewrite.clear()
    try {
      val raw = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .filter(col("o_orderpriority") =!= "3-MEDIUM")
        .groupBy(col("o_orderstatus"))
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"),
          sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * 100).cast("long")).as("disc_cents"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("o_orderstatus").asc)
      assert(!planOf(raw).contains("mv_star_fk"))
      val expect = raw.collect().map(_.toSeq).sortBy(_.mkString("|"))
      assert(served.sameElements(expect),
        "join-back answer diverged from the raw join recompute")
    } finally {
      Extensions.queries("ax_mv_star_attr")(spark, dir)
      gate()
    }
  }

  test("ANY dim attribute is servable from the one FK-grain rollup") {
    Extensions.queries("ax_mv_star_attr")(spark, dir)
    // an attribute no registered attribute-grain anticipates
    val df = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("l_quantity").cast("long")).as("q"),
        count(lit(1)).as("n"))
    val p = planOf(df)
    assert(p.contains("mv_star_fk") && !p.contains("lineitem.parquet"),
      s"o_custkey grouping not served by join-back:\n$p")
  }

  test("a grain WITHOUT the FK cannot serve a dim attribute (negative)") {
    MvRewrite.clear()
    try {
      Extensions.queries("ax_mv_star")(spark, dir) // op_rf grain only
      val df = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(sum(col("l_quantity").cast("long")).as("q"))
      assert(!planOf(df).contains("mv_star"),
        "o_orderstatus is not functionally determined by the op_rf grain")
    } finally {
      Extensions.queries("ax_mv_star_attr")(spark, dir)
      gate()
    }
  }

  test("join-back fires through the SQL front door too (zero fact bytes)") {
    val df = Extensions.queries("sq_mv_attr_sql")(spark, dir)
    val p = planOf(df)
    assert(p.contains("mv_star_fk") && !p.contains("lineitem.parquet"),
      s"SQL-text dim-attribute aggregate not served by join-back:\n$p")
  }

  test("a non-grain FACT filter blocks join-back too") {
    Extensions.queries("ax_mv_star_attr")(spark, dir)
    // l_returnflag is lost at the FK grain; the rollup cannot apply it
    val df = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_returnflag") === "R")
      .groupBy(col("o_orderstatus"))
      .agg(sum(col("l_quantity").cast("long")).as("q"))
    assert(!planOf(df).contains("mv_star_fk"),
      "a fact filter below the FK grain must force the raw plan")
  }

  // ----- snowflake (composite-FK, multi-dim) join-back -----------------

  private def part = spark.read.parquet(s"$dir/part.parquet")
  private def snowJoined =
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(part, col("l_partkey") === col("p_partkey"))

  test("ax_mv_snowflake is served: rollup x two live dims, zero fact") {
    val df = Extensions.queries("ax_mv_snowflake")(spark, dir)
    val p = planOf(df)
    assert(p.contains("mv_snow_fk"), s"composite rollup not in plan:\n$p")
    assert(!p.contains("lineitem.parquet"),
      s"fact scan survived the snowflake rewrite:\n$p")
    assert(p.contains("orders.parquet") && p.contains("part.parquet"),
      "both LIVE dims must be re-joined to derive their attributes")
  }

  test("snowflake serving is exact: equals the raw three-table recompute") {
    val served = Extensions.queries("ax_mv_snowflake")(spark, dir)
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    MvRewrite.clear()
    try {
      val raw = snowJoined
        .filter(col("o_orderpriority") =!= "3-MEDIUM" && col("p_size") < 25)
        .groupBy(col("o_orderstatus"), col("p_brand"))
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"),
          sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * 100).cast("long")).as("disc_cents"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("o_orderstatus").asc, col("p_brand").asc)
      assert(!planOf(raw).contains("mv_snow_fk"))
      val expect = raw.collect().map(_.toSeq).sortBy(_.mkString("|"))
      assert(served.sameElements(expect),
        "snowflake answer diverged from the raw recompute")
    } finally {
      Extensions.queries("ax_mv_snowflake")(spark, dir)
      gate()
    }
  }

  test("one-dim groupings over the three-table join serve from the composite rollup") {
    Extensions.queries("ax_mv_snowflake")(spark, dir)
    val byPart = snowJoined.groupBy(col("p_brand"))
      .agg(sum(col("l_quantity").cast("long")).as("q"))
    val p = planOf(byPart)
    assert(p.contains("mv_snow_fk") && !p.contains("lineitem.parquet"),
      s"p_brand grouping not served from the composite grain:\n$p")
  }

  test("a composite grain missing one FK keeps the raw plan (negative)") {
    Extensions.queries("ax_mv_snowflake")(spark, dir)
    MvRewrite.clear()
    try {
      val factKey = MvRewrite.keyFor(spark, s"$dir/lineitem.parquet")
      MvRewrite.registerSnow(MvRewrite.SnowMvDef(
        factKey,
        dims = Seq(
          MvRewrite.DimRef(
            MvRewrite.keyFor(spark, s"$dir/orders.parquet"),
            "l_orderkey", "o_orderkey"),
          MvRewrite.DimRef(
            MvRewrite.keyFor(spark, s"$dir/part.parquet"),
            "l_partkey", "p_partkey")),
        serve = MvRewrite.MvDef(
          dims = Seq("l_orderkey"), // l_partkey NOT in the grain
          measures = Nil, countCol = "mv_n_rows",
          mvPath = s"$dir/lineitem.parquet")))
      MvRewrite.install(spark)
      val df = snowJoined.groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"))
      val p = planOf(df)
      assert(p.contains("lineitem.parquet"),
        s"a grain without l_partkey cannot determine part attributes:\n$p")
    } finally {
      MvRewrite.clear()
      Extensions.queries("ax_mv_snowflake")(spark, dir)
      gate()
    }
  }

  test("a fourth table in the join blocks the snowflake rewrite") {
    Extensions.queries("ax_mv_snowflake")(spark, dir)
    val cust = spark.read.parquet(s"$dir/customer.parquet")
    val df = snowJoined
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("p_brand"))
      .agg(sum(col("l_quantity").cast("long")).as("q"))
    assert(!planOf(df).contains("mv_snow_fk"),
      "an unregistered fourth table must fall back to raw")
  }

  // ----- grouping sets above the star (Aggregate over Expand) ----------

  test("ax_mv_rollup_sets is served: ROLLUP over the star, zero fact") {
    val df = Extensions.queries("ax_mv_rollup_sets")(spark, dir)
    val p = planOf(df)
    assert(p.contains("mv_star_fk"), s"FK rollup not in plan:\n$p")
    assert(!p.contains("lineitem.parquet"),
      s"fact scan survived the grouping-sets rewrite:\n$p")
    assert(p.contains("Expand"),
      "the grouping-sets structure must be preserved, not unrolled")
  }

  test("grouping-sets serving is exact, including the grand total") {
    val served = Extensions.queries("ax_mv_rollup_sets")(spark, dir)
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    MvRewrite.clear()
    try {
      val raw = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"),
          sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * 100).cast("long")).as("disc_cents"),
          count(lit(1)).as("n_lines"))
      assert(!planOf(raw).contains("mv_star_fk"))
      val expect = raw.collect().map(_.toSeq).sortBy(_.mkString("|"))
      assert(served.sameElements(expect),
        "grouping-sets answer diverged from the raw recompute")
    } finally {
      Extensions.queries("ax_mv_rollup_sets")(spark, dir)
      gate()
    }
  }

  test("a grouping set with a non-determined fact column keeps raw") {
    Extensions.queries("ax_mv_rollup_sets")(spark, dir)
    // l_returnflag is lost at the FK grain: no set containing it can
    // be derived from the rollup
    val df = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .rollup(col("o_orderstatus"), col("l_returnflag"))
      .agg(sum(col("l_quantity").cast("long")).as("q"))
    assert(!planOf(df).contains("mv_star_fk"),
      "a non-grain fact column in a grouping set must force raw")
  }

  test("CUBE and grouping_id() are served through the same path") {
    Extensions.queries("ax_mv_rollup_sets")(spark, dir)
    val df = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
    val p = planOf(df)
    assert(p.contains("mv_star_fk") && !p.contains("lineitem.parquet"),
      s"CUBE not served:\n$p")
    val served = df.collect().map(_.toSeq).sortBy(_.mkString("|"))
    MvRewrite.clear()
    try {
      val raw = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
        .collect().map(_.toSeq).sortBy(_.mkString("|"))
      assert(served.sameElements(raw), "CUBE served != raw")
    } finally {
      Extensions.queries("ax_mv_rollup_sets")(spark, dir)
      gate()
    }
  }

  test("snowflake and grouping-sets rewrites fire through the SQL front door") {
    val snow = Extensions.queries("sq_mv_snow_sql")(spark, dir)
    val ps = planOf(snow)
    assert(ps.contains("mv_snow_fk") && !ps.contains("lineitem.parquet"),
      s"SQL-text snowflake aggregate not served:\n$ps")
    val sets = Extensions.queries("sq_mv_sets_sql")(spark, dir)
    val pr = planOf(sets)
    assert(pr.contains("mv_star_fk") && !pr.contains("lineitem.parquet"),
      s"SQL-text ROLLUP not served:\n$pr")
    assert(pr.contains("Expand"))
  }

  test("same-named fact/dim columns resolve by side of origin, not name") {
    // fact(fk, tag) ⋈ dim(pk, tag): grouping by the FACT's tag (lost at
    // the FK grain) must keep the raw plan; grouping by the DIM's tag
    // (same NAME, dim origin) must be served — the name-only resolver
    // this pins against would have silently remapped the fact's tag to
    // the dim and returned wrong results
    import spark.implicits._
    val base = new java.io.File("target/mv_dupname").getAbsoluteFile
    org.apache.commons.io.FileUtils.deleteQuietly(base)
    val factP = s"$base/fact.parquet"
    val dimP = s"$base/dim.parquet"
    val mvP = s"$base/mv.parquet"
    Seq((1L, "a"), (1L, "b"), (2L, "a"), (3L, "c"))
      .toDF("fk", "tag").write.parquet(factP)
    Seq((1L, "x"), (2L, "y"), (3L, "x"))
      .toDF("pk", "tag").write.parquet(dimP)
    spark.read.parquet(factP).groupBy(col("fk"))
      .agg(count(lit(1)).as("mv_n_rows")).write.parquet(mvP)
    MvRewrite.clear()
    try {
      MvRewrite.registerStar(MvRewrite.StarMvDef(
        factKey = MvRewrite.keyFor(spark, factP),
        dimKey = MvRewrite.keyFor(spark, dimP),
        joinFactCol = "fk", joinDimCol = "pk",
        serve = MvRewrite.MvDef(dims = Seq("fk"), measures = Nil,
          countCol = "mv_n_rows", mvPath = mvP)))
      MvRewrite.install(spark)
      val fact = spark.read.parquet(factP)
      val dim = spark.read.parquet(dimP)
      val joined = fact.join(dim, col("fk") === col("pk"))
      val byFactTag = joined.groupBy(fact("tag"))
        .agg(count(lit(1)).as("n"))
      assert(!planOf(byFactTag).contains("mv.parquet"),
        "the fact's tag is not in the grain: must keep the raw plan")
      assert(byFactTag.collect().map(r =>
        (r.getString(0), r.getLong(1))).toSet ==
        Set(("a", 2L), ("b", 1L), ("c", 1L)))
      val byDimTag = joined.groupBy(dim("tag"))
        .agg(count(lit(1)).as("n"))
      val p = planOf(byDimTag)
      assert(p.contains("mv.parquet") && !p.contains("fact.parquet"),
        s"the dim's tag must be served by join-back:\n$p")
      assert(byDimTag.collect().map(r =>
        (r.getString(0), r.getLong(1))).toSet ==
        Set(("x", 3L), ("y", 1L)))
    } finally {
      MvRewrite.clear()
      gate()
    }
  }
}
