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

    // Dev loop: SPARK_GRAFT_ONLY=comma,separated,prefixes (driver unset)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.forall(_.exists(name.startsWith)) }

    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err = budget.run(name) { fn(spark, sfDir).count(); () }
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-42s $sec%8.2f s" +
        err.fold("") { case (tag, detail) => s" ERR:$tag ($detail)" })
      (name, sec, err.map(_._1))
    }
    budget.shutdown()

    val qs = results.map { case (k, v, _) => s""""$k":$v""" }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => s""""$k":"$e"""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
