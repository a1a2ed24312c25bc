package graft.polarify

import graft.polarify.dsl._
import org.scalatest.funsuite.AnyFunSuite

/** `Program.explain` must render the actual when-chain, matching the
  * reference's unparse-the-transpiled-source debugging surface
  * (ref: polarify/__init__.py:17-37, README.md:134-162).
  */
class RenderSpec extends AnyFunSuite {

  private val x = "x".ref

  test("signum explains as a flat when-chain") {
    val signum = Program(
      "s" := 0,
      When(x > 0)("s" := 1).elseWhen(x < 0)("s" := -1),
      Ret("s".ref))
    assert(signum.explain === "when((x > 0), 1).when((x < 0), -1).otherwise(0)")
  }

  test("variables inline before rendering (SSA-by-substitution is visible)") {
    val p = Program(
      "k" := x * 2,
      When("k".ref > 10)(Ret("k".ref)),
      Ret(0))
    assert(p.explain === "when(((x * 2) > 10), (x * 2)).otherwise(0)")
  }

  test("call with kwargs renders name, args and keywords") {
    val call = CallFn("clip", (cols, _) => cols.head, Seq(x),
      kwargs = Seq("lo" -> Lit(-10), "hi" -> Lit(10)))
    val p = Program(Ret(call))
    assert(p.explain === "clip(x, lo=-10, hi=10)")
  }

  test("nested chains render recursively") {
    val p = Program(
      When(x > 0)(
        When(x > 10)(Ret(2)),
        Ret(1)),
      Ret(0))
    assert(p.explain === "when((x > 0), when((x > 10), 2).otherwise(1)).otherwise(0)")
  }

  // -------------------------------------------------------------------
  // transformSourceToNewSource: the reference's runnable-renamed-source
  // emission (ref: polarify/__init__.py:17-37 — body replaced with
  // `import polars as pl; return <pl.when-chain>`, name suffixed
  // `_polarified`, then ast.unparse'd). Every expected literal below
  // was verified `ast.unparse(ast.parse(emitted)) == emitted` under
  // CPython — the emitted text IS unparse-canonical (minimal parens,
  // spaces around binary operators, 4-space indent).
  // -------------------------------------------------------------------

  test("signum source emits the runnable _polarified function") {
    val src = """
def signum(x):
    s = 0
    if x > 0:
        s = 1
    elif x < 0:
        s = -1
    return s
"""
    assert(Program.transformSourceToNewSource(src) ===
      """def signum_polarified(x):
        |    import polars as pl
        |    return pl.when(x > 0).then(1).when(x < 0).then(-1).otherwise(0)""".stripMargin)
  }

  test("nested ifs emit nested pl.when calls with minimal parens") {
    val src = """
def nested(x, y):
    if x > 0:
        if y > 0:
            return x + y
        return x * 2 - 1
    return -x ** 2
"""
    // `-x ** 2` stays paren-free: unary minus binds LOOSER than ** in
    // Python, and ast.unparse prints exactly this
    assert(Program.transformSourceToNewSource(src) ===
      """def nested_polarified(x, y):
        |    import polars as pl
        |    return pl.when(x > 0).then(pl.when(y > 0).then(x + y).otherwise(x * 2 - 1)).otherwise(-x ** 2)""".stripMargin)
  }

  test("match emits |-joined equality tests parenthesized for runnability") {
    val src = """
def m(x):
    match x:
        case 0 | 1:
            return 'small'
        case y if y > 100:
            return 'big'
        case _:
            return 'mid'
"""
    // (x == 0) | (x == 1) NEEDS the parens to run (| binds tighter
    // than ==) — and ast.unparse emits exactly these and no more
    assert(Program.transformSourceToNewSource(src) ===
      """def m_polarified(x):
        |    import polars as pl
        |    return pl.when((x == 0) | (x == 1)).then('small').when(x > 100).then('big').otherwise('mid')""".stripMargin)
  }

  test("ternary source emits a single-case chain") {
    val src = """
def if_expr(x):
    return 1 if x >= 0 else 0
"""
    assert(Program.transformSourceToNewSource(src) ===
      """def if_expr_polarified(x):
        |    import polars as pl
        |    return pl.when(x >= 0).then(1).otherwise(0)""".stripMargin)
  }
}
