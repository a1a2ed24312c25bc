package graft.polarify

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** SURVEY §7 item 4: null handling. Polars and Spark agree that a null
  * when-test is NOT a match (`null > 0` is null, treated as false), so a
  * null input falls through every case to the otherwise — and to SQL
  * NULL when the program has no default. Pin that behavior down once.
  */
class NullSemanticsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(name: String, xs: Seq[Option[Long]]): Seq[Option[Long]] = {
    val c = Corpus.all.find(_.name == name).get
    xs.toDF("x")
      .select(c.program.column(Map("x" -> col("x"))).cast("long").as("r"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
  }

  test("null input falls through to the default branch") {
    // signum: s=0; if x>0: s=1 elif x<0: s=-1; return s
    assert(run("signum", Seq(Some(5L), None, Some(-5L))) ===
      Seq(Some(1L), Some(0L), Some(-1L)))
  }

  test("null input takes the trailing early-return, never SQL NULL") {
    // signum_no_default: if x>0: return 1; elif x<0: return -1; return 0.
    // The language REJECTS programs where a branch might not return
    // ("Not all branches return"), so every compiled CaseWhen has an
    // otherwise — a null input can never produce SQL NULL from a valid
    // program; it lands on the final return like any unmatched value.
    assert(run("signum_no_default", Seq(Some(5L), None)) ===
      Seq(Some(1L), Some(0L)))
  }

  test("null match subject matches no case and takes the fall-through value") {
    // match_signum: case 0 -> 1, case 2 -> -1, case 3 -> 0, no catch-all;
    // fall-through returns the pre-assigned s = 0. A null subject makes
    // every equality test null (no match) -> 0, same as Polars.
    assert(run("match_signum", Seq(Some(0L), Some(2L), None)) ===
      Seq(Some(1L), Some(-1L), Some(0L)))
  }
}
