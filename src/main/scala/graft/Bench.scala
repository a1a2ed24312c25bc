package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query seconds over
  * `SparkEntry.queries`.
  *
  * Round-1 post-mortem: a single pathological query hung the whole run
  * (rc=124, zero numbers emitted). Hardened per VERDICT.md #3:
  *   - every query runs under a wall-clock budget ([[QueryBudget]]);
  *     on timeout its Spark job group is cancelled and the bench moves
  *     on;
  *   - failures/timeouts are recorded per query in an `"errors"` map
  *     instead of being swallowed;
  *   - progress is printed to stderr incrementally, so even a hard kill
  *     leaves a per-query trail.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val timeoutSec =
      sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT_SEC", "300").toLong
    val spark = Sessions.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val budget = new QueryBudget(spark, timeoutSec)

    // Untimed session warmup. The first timed query otherwise absorbs
    // the one-time session costs — JIT/codegen compilation, shuffle
    // service + parquet reader init (~4 s measured; alphabetically that
    // was ax_approx_quantiles, whose r4/r5 plan audits misread session
    // warmup as sketch cost). One trivial job through the scan→shuffle→
    // agg path first makes every timed number measure the QUERY, not
    // the session bring-up that a long-lived cluster pays once.
    {
      import org.apache.spark.sql.functions.{col, lit, pmod}
      spark.read.parquet(s"$sfDir/nation.parquet")
        .groupBy(pmod(col("n_nationkey"), lit(4))).count().count()
    }

    // Dev loop: SPARK_GRAFT_ONLY=comma,separated,prefixes (driver unset)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.forall(_.exists(name.startsWith)) }

    // Round-5 post-mortem (VERDICT #1/#6): single-shot timing on a
    // shared-host VM with documented 3.4× run-to-run swings cannot
    // adjudicate the 2× guard — one contention window landing mid-run
    // inflated ax_upsert_orders 8.2× with zero code change. So each
    // query now runs REPS times (default 3) and reports the MEDIAN:
    // a contention spike lands in one rep and the median discards it.
    // The first rep doubles as the warmup the streaming queries need
    // (state-store setup dominates their cold run, ±45% swings), and
    // absorbs one-time session-substrate builds — every rep is
    // recorded in target/bench_full.json, so the cold cost stays
    // visible, while the headline measures the QUERY, not the noise.
    // A rep that errors/times out stops further reps for that query.
    // Round-9 post-mortem: reps ran BACK-TO-BACK per query, so a
    // sustained contention window inflated ALL THREE reps of whichever
    // query it landed on and the median stopped protecting
    // (ax_join_size_est r9: reps 7.65/7.85/16.63 vs 1.39 isolated).
    // ROTATED loop: rep 1 of every query, then rep 2, then rep 3 — a
    // window now lands in at most one rep per query and the median
    // discards it. Per-query semantics unchanged: rep-1 pass still runs
    // in family order (absorbing session-substrate builds exactly as
    // before), an errored/timed-out rep still stops further reps for
    // that query, and rep_times keep their per-query rep order.
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
    val ordered = selected.toSeq.sortBy(_._1)
    val repTimes = scala.collection.mutable.LinkedHashMap(
      ordered.map { case (n, _) =>
        n -> scala.collection.mutable.ArrayBuffer.empty[Double] }: _*)
    val qErr = scala.collection.mutable.Map.empty[String, String]
    val lastSecs = scala.collection.mutable.Map.empty[String, Double]
    for (r <- 0 until reps; (name, fn) <- ordered if !qErr.contains(name)) {
      val (sec, e) = budget.run(name) { fn(spark, sfDir).count(); () }
      lastSecs(name) = sec
      System.err.println(f"[bench] $name%-42s rep${r + 1} $sec%8.2f s" +
        e.fold("") { case (tag, detail) => s" ERR:$tag ($detail)" })
      e match {
        case Some((tag, _)) => qErr(name) = tag
        case None           => repTimes(name) += sec
      }
    }
    val results = ordered.map { case (name, _) =>
      val times = repTimes(name)
      val med =
        if (times.isEmpty) lastSecs.getOrElse(name, 0.0)
        else times.sorted.apply((times.size - 1) / 2)
      (name, med, times.toSeq, qErr.get(name))
    }
    budget.shutdown()

    // Round-2 post-mortem: the driver parses the bench JSON from only
    // the LAST ~2000 chars of output. A full 155-query map (~5.5 KB) got
    // clipped mid-line → "parsed": null despite a perfect run. So the
    // stdout line is COMPACT (slowest queries only, 2 decimals, capped
    // error map) and guaranteed to fit the tail window; the complete
    // per-query map goes to stderr and target/bench_full.json.
    def jq(k: String, v: Double) = f""""$k":$v%.2f"""
    val total = results.map(_._2).sum
    val firstRepTotal = results.map(r => r._3.headOption.getOrElse(r._2)).sum
    val slowest = results.sortBy(-_._2).take(40)
    val qs = slowest.map { case (k, v, _, _) => jq(k, v) }.mkString("{", ",", "}")
    val errAll = results.collect { case (k, _, _, Some(e)) => (k, e) }
    val errs = errAll.take(10).map { case (k, e) => s""""$k":"$e"""" }
      .mkString("{", ",", "}")
    // ADVICE: if the dev-loop filter is active, say so in the output —
    // a filtered run must never masquerade as a full one.
    val onlyField = only.fold("")(o =>
      s""","only":"${o.mkString(",")}","n_total":${SparkEntry.queries.size}""")
    val fullJson =
      s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,"value_rep1":$firstRepTotal,"queries":${
        results.map { case (k, v, _, _) => s""""$k":$v""" }.mkString("{", ",", "}")
      },"rep_times":${
        results.map { case (k, _, ts, _) =>
          s""""$k":${ts.mkString("[", ",", "]")}""" }.mkString("{", ",", "}")
      },"errors":${
        errAll.map { case (k, e) => s""""$k":"$e"""" }.mkString("{", ",", "}")
      },"sf":"$sfDir"}"""
    System.err.println(s"[bench-full] $fullJson")
    try {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("target/bench_full.json"), fullJson)
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write target/bench_full.json: $e") }
    println(
      f"""{"metric":"total","value":$total%.2f,"unit":"sec","reps":$reps,"value_rep1":$firstRepTotal%.2f,"queries":$qs,"errors":$errs,"n_queries":${results.size},"n_errors":${errAll.size}$onlyField,"sf":"$sfDir"}""")
    spark.stop()
  }
}
