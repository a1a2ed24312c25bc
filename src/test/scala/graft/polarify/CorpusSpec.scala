package graft.polarify

import graft.SparkTestSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Differential conformance: for every corpus function, the compiled
  * Column must equal the imperative row oracle over the full reference
  * domain (hypothesis used random draws from [-100,100],
  * ref tests/test_parse_body.py:38-43 — we test the whole domain
  * exhaustively, which is strictly stronger).
  */
class CorpusSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private lazy val domainDf = {
    import spark.implicits._
    (-100L to 100L).toDF("x").cache()
  }

  Corpus.all.foreach { c =>
    test(c.name) {
      val out = domainDf
        .select(col("x"), c.program.column(Map("x" -> col("x"))).cast("long").as("r"))
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .toMap
      (-100L to 100L).foreach { v =>
        assert(out(v) === c.oracle(v), s"${c.name}($v)")
      }
    }
  }

  test("null input falls through to the default branch (CaseWhen null-test semantics)") {
    import spark.implicits._
    val df = Seq[Option[Long]](Some(5L), Some(-5L), None).toDF("x")
    val signum = Corpus.base.find(_.name == "signum").get.program
    val out = df.select(signum.column(Map("x" -> col("x"))).cast("long").as("r"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getLong(0))
    // null > 0 is null → not matched; null < 0 → not matched; otherwise 0.
    assert(out.toSeq === Seq(1L, -1L, 0L))
  }
}
