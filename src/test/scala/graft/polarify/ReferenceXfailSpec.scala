package graft.polarify

import org.scalatest.funsuite.AnyFunSuite

/** The reference's xfail roster, pinned: tests/functions.py:310-319
  * lists 7 inputs its own harness cannot handle (`xfail_functions`,
  * xfail-marked at tests/test_parse_body.py:22). This spec feeds the
  * same 7 VERBATIM sources to our front-end and pins the
  * divergence-by-design:
  *
  *  - walrus / set-unpack / star-assignment / global: rejected cleanly
  *    with a typed error (same family as the reference's closed-world
  *    contract);
  *  - the three literal-only-return functions: the reference xfails
  *    them only because its differential harness can't map a constant
  *    column — the TRANSPILATION is well-defined, and we support them
  *    outright (they already gate as pf_return_*_constant).
  */
class ReferenceXfailSpec extends AnyFunSuite {

  private def reject(src: String, substring: String): Unit = {
    val e = intercept[IllegalArgumentException](Program.fromPython(src).expr)
    assert(e.getMessage.contains(substring),
      s"expected '$substring' in '${e.getMessage}'")
  }

  test("walrus_expr rejects: NamedExpr is outside the closed world") {
    reject(
      """
        |def walrus_expr(x):
        |    if (y := x + 1) > 0:
        |        s = 1
        |    else:
        |        s = -1
        |    return s * y
        |""".stripMargin,
      "ast.NamedExpr")
  }

  test("different_type_assignments rejects: set literal unpack") {
    reject(
      """
        |def different_type_assignments(x):
        |    [a, b] = {1, 2}
        |    return x
        |""".stripMargin,
      "ast.Set")
  }

  test("star_assignments rejects: starred target") {
    reject(
      """
        |def star_assignments(x):
        |    b, *a = [1, 2]
        |    return x
        |""".stripMargin,
      "Starred")
  }

  test("global_variable rejects: Global statement") {
    reject(
      """
        |def global_variable(x):
        |    global a
        |    a = 1
        |    return x + a
        |""".stripMargin,
      "ast.Global")
  }

  test("return_constant compiles (reference xfails only its harness)") {
    val p = Program.fromPython(
      """
        |def return_constant(x):
        |    return 1
        |""".stripMargin)
    assert(p.explain === "1")
  }

  test("return_constant_2 compiles to the folded-by-engine constant expr") {
    val p = Program.fromPython(
      """
        |def return_constant_2(x):
        |    return 1 + 2
        |""".stripMargin)
    assert(p.explain === "(1 + 2)")
  }

  test("return_constant_additional_assignments drops the dead assignment") {
    val p = Program.fromPython(
      """
        |def return_constant_additional_assignments(x):
        |    s = 2
        |    return 1
        |""".stripMargin)
    assert(p.explain === "1")
  }
}
