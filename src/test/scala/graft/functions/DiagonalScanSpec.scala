package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The native diagonal mismatch-boundary kernel must be BIT-IDENTICAL
  * to the composable split/zip_with/transform chain it replaces in
  * graft.ops.Dedup.spanDiagonalsOf — any divergence silently shifts
  * span boundaries under the gate queries (dd_substring_span,
  * dd_span_guarantee, tx_span_dedup), whose DuckDB oracles replay the
  * chain's SQL text independently.
  *
  * The chain derives the overlap window from (pa, pb) and the two
  * string lengths; the HOF replica below restates it verbatim (same
  * greatest/least algebra, same IF(x, -1, i+1) mismatch emission).
  */
class DiagonalScanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** the pre-round-11 HOF formulation, verbatim */
  private val hofChain = expr(
    """concat(array(0),
      |  filter(transform(zip_with(
      |    split(substring(a, CAST(greatest(pa - pb, 0) + 1 AS INT),
      |      CAST(least(length(a) - (greatest(pa - pb, 0) + 1),
      |                 length(b) - (greatest(pb - pa, 0) + 1)) + 1 AS INT)), ''),
      |    split(substring(b, CAST(greatest(pb - pa, 0) + 1 AS INT),
      |      CAST(least(length(a) - (greatest(pa - pb, 0) + 1),
      |                 length(b) - (greatest(pb - pa, 0) + 1)) + 1 AS INT)), ''),
      |    (x, y) -> x = y), (x, i) -> IF(x, -1, i + 1)), v -> v > 0),
      |  array(least(length(a) - (greatest(pa - pb, 0) + 1),
      |              length(b) - (greatest(pb - pa, 0) + 1)) + 2))""".stripMargin)

  private val native = GraftFunctions.diagonalBoundaries(
    col("a"), col("b"), col("pa"), col("pb"))

  private def assertAgree(rows: Seq[(String, String, Int, Int)]): Unit = {
    val df = rows.toDF("a", "b", "pa", "pb")
      .withColumn("n", native)
      .withColumn("h", hofChain)
    val bad = df.filter(not(col("n") <=> col("h")))
      .select("a", "b", "pa", "pb", "n", "h").take(1)
    assert(bad.isEmpty, s"divergence: ${bad.mkString}")
  }

  test("agrees with the HOF chain on random shared-span corpora") {
    val rnd = new scala.util.Random(11)
    val alpha = "ab " // tiny alphabet → dense accidental matches
    def s(n: Int) = Seq.fill(n)(alpha(rnd.nextInt(alpha.length))).mkString
    val rows = Seq.fill(400) {
      val shared = s(rnd.nextInt(60) + 1)
      val a = s(rnd.nextInt(40)) + shared + s(rnd.nextInt(40))
      val b = s(rnd.nextInt(40)) + shared + s(rnd.nextInt(40))
      // anchor somewhere inside each string (1-based), not necessarily
      // aligned on the shared span — the kernel must not assume the
      // seed filter already passed
      (a, b, rnd.nextInt(a.length) + 1, rnd.nextInt(b.length) + 1)
    }
    assertAgree(rows)
  }

  test("agrees on multi-byte code points (the split('') unit is the code point)") {
    val rnd = new scala.util.Random(13)
    val alpha = Seq("a", "é", "漢", "𝄞", " ") // 1-, 2-, 3-, 4-byte
    def s(n: Int) = Seq.fill(n)(alpha(rnd.nextInt(alpha.length))).mkString
    val rows = Seq.fill(200) {
      val shared = s(rnd.nextInt(20) + 1)
      val a = s(rnd.nextInt(10)) + shared + s(rnd.nextInt(10))
      val b = s(rnd.nextInt(10)) + shared + s(rnd.nextInt(10))
      val na = a.codePointCount(0, a.length)
      val nb = b.codePointCount(0, b.length)
      (a, b, rnd.nextInt(na) + 1, rnd.nextInt(nb) + 1)
    }
    assertAgree(rows)
  }

  test("edge shapes: identical strings, disjoint strings, single char, extreme anchors") {
    assertAgree(Seq(
      ("abcdef", "abcdef", 1, 1),    // all-match diagonal
      ("abcdef", "abcdef", 3, 3),    // same diagonal, different anchor
      ("abcdef", "ghijkl", 2, 2),    // all-mismatch diagonal
      ("a", "a", 1, 1),              // ol = 1, match
      ("a", "b", 1, 1),              // ol = 1, mismatch
      ("abc", "xabc", 1, 2),         // shifted alignment
      ("xxabc", "abcyy", 3, 1),      // offset both sides
      ("abcdef", "abcdef", 6, 1),    // anchor at last char, skewed diagonal
      ("abcdef", "abcdef", 1, 6),    // skew the other way (ol = 1)
      ("ab", "ab", 2, 1)))           // partial overlap
  }

  test("longest-run algebra over the boundary array matches a scala reference") {
    // end-to-end: max run from bnd gaps == brute-force longest common
    // run along the diagonal
    val rnd = new scala.util.Random(17)
    def s(n: Int) = Seq.fill(n)("ab x".charAt(rnd.nextInt(4))).mkString
    val rows = Seq.fill(200) {
      val shared = s(rnd.nextInt(50) + 5)
      (s(rnd.nextInt(20)) + shared, shared + s(rnd.nextInt(20)))
    }.map { case (a, b) => (a, b, 1, 1) }
    val got = rows.toDF("a", "b", "pa", "pb")
      .withColumn("bnd", native)
      .withColumn("max_run", expr(
        """array_max(zip_with(slice(bnd, 2, size(bnd) - 1),
          |  slice(bnd, 1, size(bnd) - 1), (x, y) -> x - y - 1))""".stripMargin))
      .select("a", "b", "max_run").as[(String, String, Int)].collect()
    got.foreach { case (a, b, run) =>
      val ol = math.min(a.length, b.length)
      var best = 0; var cur = 0
      for (i <- 0 until ol) {
        if (a(i) == b(i)) { cur += 1; best = math.max(best, cur) }
        else cur = 0
      }
      assert(run === best, s"a=$a b=$b")
    }
  }
}
