// Lives under org.apache.spark.sql because the types an input-casting
// expression must name (AbstractDataType) and the Column<->Expression
// bridge (classic.ExpressionUtils) are `private[sql]` in Spark 4 —
// the same host-package technique other OSS Spark extension libraries
// use. The public graft surface is graft.functions.GraftFunctions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Column <-> Catalyst Expression bridge for graft code outside the sql
  * package (delegates to the session-internal ExpressionUtils).
  */
object Interop {
  /** Eagerly converts through [[ColumnNodeToExpressionConverter]]:
    * the lazy `ExpressionUtils.expression` wrapper stays an Unevaluable
    * `ColumnNodeExpression` if the result is spliced into a plan outside
    * the Dataset API (e.g. from a FunctionRegistry builder), which fails
    * codegen. The converted tree may still carry `UnresolvedFunction`
    * nodes — fine inside analysis, where the analyzer resolves them.
    */
  def expression(c: Column): Expression =
    ColumnNodeToExpressionConverter(c.node)
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Test seam for `SparkSessionExtensions`-based injection:
    * `spark.sql.extensions` is a STATIC conf, read from the
    * SparkContext at first-session build — it cannot be exercised from
    * a test suite sharing one context. This applies an extensions
    * function to a fresh registry the same way session building does
    * (`SparkSessionExtensions.registerFunctions` is private[sql], hence
    * this lives in the shim package).
    */
  def applyInjectedFunctions(
      ext: org.apache.spark.sql.SparkSessionExtensions => Unit)
      : org.apache.spark.sql.catalyst.analysis.FunctionRegistry = {
    val e = new org.apache.spark.sql.SparkSessionExtensions
    ext(e)
    e.registerFunctions(
      org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin.clone())
  }
}

/** Native codegen'd integer dot product over two `array<bigint>` columns.
  *
  * The composable formulation — `aggregate(zip_with(a, b, (x,y) -> x*y),
  * 0L, (acc,v) -> acc+v)` — is correct but runs in Catalyst's
  * *interpreted* expression path (higher-order functions have no codegen
  * and break whole-stage codegen for the enclosing operator), and it
  * materializes the zipped intermediate array per row. On the similarity/
  * near-dup hot paths the dot product runs once per (row × probe), so at
  * the 100 TB target that interpretation overhead dominates the scan.
  * This expression is the same arithmetic as a tight fused Java loop
  * inside whole-stage codegen: no intermediate array, no closure calls.
  *
  * Null semantics match the HOF formulation exactly: null array → null;
  * null element → null (`x*y` with a null operand is null, and folding
  * null into the sum is null). Length mismatch sums over the shorter
  * prefix (our callers only pass equal-length vectors; `zip_with` would
  * null-pad instead — don't rely on mismatched lengths). Overflow wraps
  * (Java long semantics) rather than raising the ANSI error — callers
  * quantize to micro-units, keeping |dot| ≤ ~2^40, far inside range.
  */
case class DotProductLong(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  // element-level nulls can null the result even when both arrays are
  // non-null, so this must stay nullable regardless of child nullability
  override def nullable: Boolean = true
  override def prettyName: String = "dot_long"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductLong =
    copy(left = newLeft, right = newRight)
}
