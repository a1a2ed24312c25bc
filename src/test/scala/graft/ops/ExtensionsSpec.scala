package graft.ops

import graft.{SparkEntry, SparkTestSession}
import org.scalatest.funsuite.AnyFunSuite

/** Every declared query must run and (except genuinely-empty near-dup
  * outputs) produce rows on sf0.001; every oracle key must exist in
  * queries.
  */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  // near-dup pair miners may legitimately find nothing at tiny SF
  private val mayBeEmpty = Set(
    "dd_minhash_pairs", "dd_simhash_pairs", "dd_ngram_jaccard",
    "dd_embed_neardup", "ax_cust_no_orders")

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val df = fn(spark, dir)
      // global anti-pattern guard: no interpreted UDF may reach ANY
      // gate query's plan (checkpointed results plan as RDD scans and
      // pass trivially; their pre-checkpoint shapes have their own
      // guards in PlanShapeSpec)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
        s"$name plans an interpreted UDF")
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every oracle key has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
