package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for the round-5 additions, independent of the DuckDB
  * oracle:
  *
  *   - ax_late_suppliers claims its one-pass aggregate is a faithful
  *     DECORRELATION of the textbook Q21 double-correlated
  *     EXISTS + NOT EXISTS phrasing — so run the textbook phrasing
  *     through Spark SQL (whose optimizer plans genuine semi/anti
  *     joins for it) and require identical results.
  *   - tx_para_dedup claims global first-occurrence retention and a
  *     byte-faithful rewrite — invariants checked directly against the
  *     source corpus.
  */
class DecorrelationSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("ax_late_suppliers equals the correlated EXISTS/NOT EXISTS form") {
    Seq("supplier", "nation", "orders", "lineitem").foreach { t =>
      spark.read.parquet(s"$dir/$t.parquet")
        .createOrReplaceTempView(s"q21_$t")
    }
    val textbook = spark.sql(
      """SELECT s.s_name, COUNT(DISTINCT o.o_orderkey) AS numwait
        |FROM q21_supplier s
        |JOIN q21_nation n ON s.s_nationkey = n.n_nationkey
        |JOIN q21_lineitem l1 ON s.s_suppkey = l1.l_suppkey
        |JOIN q21_orders o ON o.o_orderkey = l1.l_orderkey
        |WHERE o.o_orderstatus = 'F' AND n.n_name = 'NATION_19'
        |  AND datediff(l1.l_shipdate, o.o_orderdate) > 90
        |  AND EXISTS (SELECT 1 FROM q21_lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM q21_lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND datediff(l3.l_shipdate, o.o_orderdate) > 90)
        |GROUP BY s.s_name""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted
    val ours = Extensions.queries("ax_late_suppliers")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted
    assert(ours.nonEmpty, "fixture must produce at least one blamed supplier")
    assert(ours.toSeq == textbook.toSeq)
  }

  test("tx_para_dedup keeps each distinct paragraph exactly once") {
    val out = Extensions.queries("tx_para_dedup")(spark, dir).persist()
    try {
      val (paras, kept) = {
        val r = out.agg(sum("n_paras"), sum("n_kept")).collect()(0)
        (r.getLong(0), r.getLong(1))
      }
      assert(kept <= paras)
      assert(kept > 0)
      // global retention: #kept == #distinct paragraphs in the corpus
      val distinctParas = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), TextAnalysis.normCol.as("norm"))
        .filter(length(col("norm")) > 0)
        .select(split(col("norm"), " ").as("w"))
        .withColumn("pos", explode(sequence(lit(0L), expr("(size(w) - 1) div 16"))))
        .select(expr("array_join(slice(w, CAST(pos*16 + 1 AS INT), 16), ' ')")
          .as("chunk"))
        .distinct().count()
      assert(kept == distinctParas)
    } finally out.unpersist()
  }

  test("tx_para_dedup rewrite is the identity on documents with no dups") {
    val out = Extensions.queries("tx_para_dedup")(spark, dir)
    val intact = out.filter(col("n_kept") === col("n_paras"))
      .select(col("doc_id"), col("clean_hash"))
    // word-aligned chunks joined back with single spaces reproduce the
    // normalized text verbatim, so an all-kept doc must hash to its norm
    val expected = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), md5(TextAnalysis.normCol).as("norm_hash"))
    val joined = intact.join(expected, "doc_id").persist()
    try {
      assert(joined.count() > 0, "some doc should survive intact")
      assert(joined.filter(col("clean_hash") =!= col("norm_hash")).count() == 0)
    } finally joined.unpersist()
  }
}
