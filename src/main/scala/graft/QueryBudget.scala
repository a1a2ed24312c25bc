package graft

import org.apache.spark.sql.SparkSession

import java.util.concurrent.{ExecutorService, Executors, TimeoutException, TimeUnit}
import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

/** Wall-clock budget enforcement for the driver-gate mains.
  *
  * Round-1 post-mortem: one pathological query hung the whole benchmark
  * (rc=124, zero output). The cure — run every query on a worker thread
  * under a timeout, cancel its Spark job group on expiry, and abandon
  * the worker if it is stuck in non-interruptible code — is needed by
  * BOTH gate mains ([[Bench]] and [[Verify]]): a hang in either zeroes
  * that round's entire signal. Shared here so the two cannot drift.
  */
final class QueryBudget(spark: SparkSession, timeoutSec: Long) {

  private var pool: ExecutorService = Executors.newSingleThreadExecutor()

  /** Runs `body` under the budget. Returns (elapsedSec, err): err is
    * None on success, or Some((tag, detail)): tag is a short machine
    * token safe for JSON ("timeout", "timeout_stuck", or the exception
    * class name), detail a human diagnostic line. elapsedSec is the
    * query's own wall time — on timeout it is captured BEFORE the
    * worker-unwind wait, so the up-to-30s teardown never inflates the
    * recorded per-query seconds. The job group is set on the worker
    * thread — the thread that actually submits the Spark jobs — so
    * cancellation reaches them. "timeout_stuck" means the worker never
    * unwound: its write may still be in flight, so callers must treat
    * any output it produced as suspect.
    */
  def run(name: String)(body: => Unit): (Double, Option[(String, String)]) = {
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val t0 = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - t0) / 1e9
    val fut = Future {
      spark.sparkContext.setJobGroup(name, name, interruptOnCancel = true)
      try body
      finally spark.sparkContext.clearJobGroup()
    }
    try { Await.result(fut, Duration(timeoutSec, TimeUnit.SECONDS)); (elapsed, None) }
    catch {
      case _: TimeoutException =>
        val atTimeout = elapsed
        spark.sparkContext.cancelJobGroup(name)
        // let the worker unwind before reusing it; if it is stuck in
        // non-interruptible code, abandon the poisoned executor and
        // start fresh — otherwise every later query queues behind the
        // hang and falsely "times out"
        val unwound =
          try { Await.ready(fut, Duration(30, TimeUnit.SECONDS)); true }
          catch { case _: Throwable => false }
        if (!unwound) {
          pool.shutdownNow()
          pool = Executors.newSingleThreadExecutor()
          (atTimeout, Some(("timeout_stuck", s"exceeded ${timeoutSec}s and " +
            "the worker did not unwind within 30s — executor abandoned")))
        } else (atTimeout, Some(("timeout", s"exceeded ${timeoutSec}s budget")))
      case e: Throwable =>
        val root = Option(e.getCause).getOrElse(e)
        (elapsed, Some((root.getClass.getSimpleName,
          Option(root.getMessage).getOrElse("").linesIterator.take(3)
            .mkString(" | "))))
    }
  }

  def shutdown(): Unit = pool.shutdownNow()
}
