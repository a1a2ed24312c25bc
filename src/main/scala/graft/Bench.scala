package graft

import org.apache.spark.sql.SparkSession

import java.util.concurrent.{Executors, TimeoutException, TimeUnit}
import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

/** Benchmark main: one JSON line with per-query seconds over
  * `SparkEntry.queries`.
  *
  * Round-1 post-mortem: a single pathological query hung the whole run
  * (rc=124, zero numbers emitted). Hardened per VERDICT.md #3:
  *   - every query runs under a wall-clock budget; on timeout its Spark
  *     job group is cancelled (`interruptOnCancel`) and the bench moves
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

    var pool = Executors.newSingleThreadExecutor()

    // Dev loop: SPARK_GRAFT_ONLY=comma,separated,prefixes (driver unset)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.forall(_.exists(name.startsWith)) }

    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      // job group must be set on the thread that submits the jobs
      val fut = Future {
        spark.sparkContext.setJobGroup(name, name, interruptOnCancel = true)
        try fn(spark, sfDir).count()
        finally spark.sparkContext.clearJobGroup()
      }
      val err =
        try { Await.result(fut, Duration(timeoutSec, TimeUnit.SECONDS)); None }
        catch {
          case _: TimeoutException =>
            spark.sparkContext.cancelJobGroup(name)
            // let the worker thread unwind before reusing it; if it is
            // stuck in non-interruptible code, abandon the poisoned
            // executor and start a fresh one — otherwise every later
            // query would queue behind the hang and falsely "timeout"
            val unwound =
              try { Await.ready(fut, Duration(30, TimeUnit.SECONDS)); true }
              catch { case _: Throwable => false }
            if (!unwound) {
              pool.shutdownNow()
              pool = Executors.newSingleThreadExecutor()
            }
            Some("timeout")
          case e: Throwable =>
            Some(Option(e.getCause).getOrElse(e).getClass.getSimpleName)
        }
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-42s $sec%8.2f s${err.fold("")(" ERR:" + _)}")
      (name, sec, err)
    }
    pool.shutdownNow()

    val qs = results.map { case (k, v, _) => s""""$k":$v""" }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => s""""$k":"$e"""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
