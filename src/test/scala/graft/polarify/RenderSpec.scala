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
}
