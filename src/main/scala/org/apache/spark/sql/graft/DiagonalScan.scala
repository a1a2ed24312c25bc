// Host-package shim: see ArrayMath.scala's header note — the types an
// input-casting expression must name and the Column<->Expression bridge
// are `private[sql]` in Spark 4.
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, QuaternaryExpression, UnsafeArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Mismatch-boundary scan of one (doc_a, doc_b) diagonal — the
  * verification kernel of the seed-and-extend substring dedup
  * (graft.ops.Dedup.spanDiagonalsOf; semantics of Lee et al.,
  * "Deduplicating Training Data Makes Language Models Better").
  *
  * Given two normalized document strings and one anchor position pair
  * (pa, pb) — both 1-based CHARACTER offsets — the diagonal is the set
  * of aligned positions {(pa−pb) = const}. The expression derives the
  * overlap window exactly as the composable SQL form did:
  *
  *   off_a = greatest(pa − pb, 0) + 1
  *   off_b = greatest(pb − pa, 0) + 1
  *   ol    = least(numChars(a) − off_a, numChars(b) − off_b) + 1
  *
  * and returns `array(0) ++ [1-based i in 1..ol where a[off_a+i−1] ≠
  * b[off_b+i−1]] ++ array(ol+1)` as `array<int>` — the boundary list
  * whose consecutive gaps are the all-match run lengths (longest run =
  * span length; interior runs feed the tx_span_dedup interval rewrite).
  *
  * Equivalence contract (pinned by DiagonalScanSpec against the HOF
  * chain on randomized corpora): byte-identical output to
  *
  *   concat(array(0),
  *     filter(transform(zip_with(
  *       split(substring(a, off_a, ol), ''),
  *       split(substring(b, off_b, ol), ''),
  *       (x, y) -> x = y), (x, i) -> IF(x, -1, i + 1)), v -> v > 0),
  *     array(ol + 1))
  *
  * including the code-POINT comparison unit (Java's empty-regex split
  * never cuts inside a surrogate pair, so the HOF chain compares code
  * points; this loop compares the UTF-8 byte sequence of each code
  * point, which is equality-equivalent) and the ol ≤ 0 degenerate
  * (`[0, ol+1]` — empty substrings split to one empty element that
  * compares equal, contributing no boundary).
  *
  * Why native: the HOF chain materializes FOUR overlap-sized arrays per
  * candidate row (two char splits, the zip, the transform) and runs the
  * three lambdas in Catalyst's interpreted path, breaking whole-stage
  * codegen for the verification projection. This loop walks both
  * strings' bytes once — no per-element allocation, no closure calls,
  * one bounded int buffer — inside whole-stage codegen. The scan runs
  * once per (pair, diagonal) candidate: at the 100 TB target the
  * candidate count tracks the true-duplicate volume, so the constant
  * here prices the whole verification stage.
  */
case class DiagonalBoundaries(
    first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends QuaternaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, StringType, IntegerType, IntegerType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable || fourth.nullable
  override def prettyName: String = "diagonal_boundaries"

  override def nullSafeEval(a: Any, b: Any, pa: Any, pb: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      DiagonalBoundaries.scan(
        a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String],
        pa.asInstanceOf[Int], pb.asInstanceOf[Int]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, pa, pb) =>
      s"""
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray(
         |      org.apache.spark.sql.graft.DiagonalBoundaries$$.MODULE$$
         |        .scan($a, $b, $pa, $pb));
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): DiagonalBoundaries =
    copy(first = newFirst, second = newSecond,
      third = newThird, fourth = newFourth)
}

object DiagonalBoundaries {

  /** The shared kernel — called from both the interpreted eval and the
    * generated code (one static call; the loop itself JITs identically
    * either way, and one implementation keeps the two paths provably
    * in sync).
    */
  def scan(a: UTF8String, b: UTF8String, pa: Int, pb: Int): Array[Int] = {
    val offA = math.max(pa - pb, 0) + 1
    val offB = math.max(pb - pa, 0) + 1
    val ol = math.min(a.numChars() - offA, b.numChars() - offB) + 1
    if (ol <= 0) return Array(0, ol + 1)
    // byte cursors to the 0-based char offsets (offA-1, offB-1)
    var ia = 0
    var c = 0
    while (c < offA - 1) {
      ia += UTF8String.numBytesForFirstByte(a.getByte(ia)); c += 1
    }
    var ib = 0
    c = 0
    while (c < offB - 1) {
      ib += UTF8String.numBytesForFirstByte(b.getByte(ib)); c += 1
    }
    // worst case every position mismatches: ol + 2 boundaries
    val buf = new Array[Int](ol + 2)
    var k = 0
    buf(k) = 0; k += 1
    var i = 1
    while (i <= ol) {
      val la = UTF8String.numBytesForFirstByte(a.getByte(ia))
      val lb = UTF8String.numBytesForFirstByte(b.getByte(ib))
      var eq = la == lb
      if (eq) {
        var j = 0
        while (eq && j < la) {
          if (a.getByte(ia + j) != b.getByte(ib + j)) eq = false
          j += 1
        }
      }
      if (!eq) { buf(k) = i; k += 1 }
      ia += la; ib += lb
      i += 1
    }
    buf(k) = ol + 1; k += 1
    if (k == buf.length) buf else java.util.Arrays.copyOf(buf, k)
  }
}
