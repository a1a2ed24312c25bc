package graft.polarify.parser

import graft.SparkTestSession
import graft.polarify._
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Differential conformance for the Python-source front-end: parsed
  * source must compile to Columns matching an imperative oracle over the
  * reference's test domain ([-100,100]). The functions here are
  * deliberately NOT the reference corpus (Corpus.scala covers those via
  * the DSL) — same feature space, different programs.
  */
class PyParserSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private lazy val domainDf = {
    import spark.implicits._
    (-100L to 100L).toDF("x").cache()
  }

  private def check(src: String, oracle: Long => Long,
      fns: Map[String, PyParser.PyFn] = Map.empty): Unit = {
    val program = Program.fromPython(src, fns)
    val out = domainDf
      .select(col("x"), program.column(Map("x" -> col("x"))).cast("long").as("r"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (-100L to 100L).foreach(v => assert(out(v) === oracle(v), s"at x=$v"))
  }

  // ------------------------------------------------------------------
  // statements
  // ------------------------------------------------------------------

  test("if/elif/else with reassignment") {
    check(
      """
        |def grade(x):
        |    g = 0
        |    if x >= 60:
        |        g = 4
        |    elif x >= 30:
        |        g = 3
        |    elif x >= 0:
        |        g = 2
        |    else:
        |        g = 1
        |    return g
        |""".stripMargin,
      v => if (v >= 60) 4 else if (v >= 30) 3 else if (v >= 0) 2 else 1)
  }

  test("early return with trailing dead code") {
    check(
      """
        |def clamp_neg(x):
        |    if x < 0:
        |        return 0
        |    return x
        |    return 999
        |""".stripMargin,
      v => if (v < 0) 0 else v)
  }

  test("inline suite") {
    check(
      "def f(x):\n    if x > 5: return x - 5\n    return 0\n",
      v => if (v > 5) v - 5 else 0)
  }

  test("tuple destructuring and multi-target assignment") {
    check(
      """
        |def span(x):
        |    lo, hi = x - 2, x + 2
        |    a = b = hi - lo
        |    return a + b
        |""".stripMargin,
      _ => 8)
  }

  test("annotated assignment") {
    check(
      """
        |def shifted(x):
        |    base: int = 7
        |    return x + base
        |""".stripMargin,
      v => v + 7)
  }

  test("nested ternaries and arithmetic") {
    check(
      """
        |def fold(x):
        |    y = (x * 2 if x > 0 else -x) + 1
        |    return y % 10 if y > 10 else y
        |""".stripMargin,
      v => { val y = (if (v > 0) v * 2 else -v) + 1; if (y > 10) y % 10 else y })
  }

  test("floor division and power") {
    check(
      """
        |def q(x):
        |    return x // 3 + 2 ** 3
        |""".stripMargin,
      v => math.floorDiv(v, 3) + 8)
  }

  // ------------------------------------------------------------------
  // match statements
  // ------------------------------------------------------------------

  test("match with value, guarded capture and wildcard") {
    check(
      """
        |def describe(x):
        |    match x:
        |        case 0:
        |            return 100
        |        case y if y > 50:
        |            return y + 1
        |        case y if y < -50:
        |            return y - 1
        |        case _:
        |            return 0
        |""".stripMargin,
      v => if (v == 0) 100 else if (v > 50) v + 1 else if (v < -50) v - 1 else 0)
  }

  test("match with or-patterns") {
    check(
      """
        |def tiny_prime(x):
        |    match x:
        |        case 2 | 3 | 5 | 7:
        |            return 1
        |        case -2 | -3 | -5 | -7:
        |            return -1
        |        case _:
        |            return 0
        |""".stripMargin,
      v => if (Set(2L, 3L, 5L, 7L)(v)) 1 else if (Set(-2L, -3L, -5L, -7L)(v)) -1 else 0)
  }

  test("match over a tuple subject (fizzbuzz blocking)") {
    check(
      """
        |def buckets(x):
        |    match x % 3, x % 5:
        |        case 0, 0:
        |            return 15
        |        case 0, _:
        |            return 3
        |        case _, 0:
        |            return 5
        |        case _:
        |            return 0
        |""".stripMargin,
      v =>
        if (v % 3 == 0 && v % 5 == 0) 15
        else if (v % 3 == 0) 3
        else if (v % 5 == 0) 5
        else 0)
  }

  test("tuple match with bindings in sequence patterns") {
    check(
      """
        |def pair_rank(x):
        |    match x // 10, x % 10:
        |        case 0, 0:
        |            return 0
        |        case 0, b:
        |            return b
        |        case a, 0:
        |            return a * 100
        |        case _:
        |            return x
        |""".stripMargin,
      v => {
        // `//` is floor division; `%` keeps the dividend sign in Spark,
        // Scala AND Polars (the reference's delegated engine) alike
        val a = math.floorDiv(v, 10)
        val b = v % 10
        if (a == 0 && b == 0) 0
        else if (a == 0) b
        else if (b == 0) a * 100
        else v
      })
  }

  test("match after assignments sees the mutated environment") {
    check(
      """
        |def env_mut(x):
        |    k = x * 2
        |    match k:
        |        case 0:
        |            return 1
        |        case y if y > 0:
        |            return y
        |        case _:
        |            return -k
        |""".stripMargin,
      v => { val k = v * 2; if (k == 0) 1 else if (k > 0) k else -k })
  }

  // ------------------------------------------------------------------
  // calls
  // ------------------------------------------------------------------

  private val clampFns = Map(
    "clamp" -> PyParser.PyFn((args, kw) =>
      org.apache.spark.sql.functions.greatest(kw("lo"),
        org.apache.spark.sql.functions.least(kw("hi"), args.head))))

  test("call with positional and keyword arguments") {
    check(
      """
        |def scaled(x):
        |    return clamp(x * 3, lo=0 - 20, hi=20)
        |""".stripMargin,
      v => math.max(-20, math.min(20, v * 3)),
      clampFns)
  }

  // ------------------------------------------------------------------
  // explain / front-end equivalence
  // ------------------------------------------------------------------

  test("parsed source and DSL build identical programs (explain-equal)") {
    import graft.polarify.dsl._
    val fromSource = Program.fromPython(
      """
        |def signum(x):
        |    s = 0
        |    if x > 0:
        |        s = 1
        |    elif x < 0:
        |        s = -1
        |    return s
        |""".stripMargin)
    val fromDsl = Program(
      "s" := 0,
      When("x".ref > 0)("s" := 1).elseWhen("x".ref < 0)("s" := -1),
      Ret("s".ref))
    assert(fromSource.explain === fromDsl.explain)
    assert(fromSource.explain === "when((x > 0), 1).when((x < 0), -1).otherwise(0)")
  }

  test("decorator lines and annotations are stripped") {
    check(
      """
        |@polarify
        |def dec(x: int) -> int:
        |    return x + 1
        |""".stripMargin,
      v => v + 1)
  }

  // ------------------------------------------------------------------
  // error contract from source (ref README.md:203-212)
  // ------------------------------------------------------------------

  private def expectError(src: String, substring: String,
      fns: Map[String, PyParser.PyFn] = Map.empty): Unit = {
    val e = intercept[IllegalArgumentException] {
      Program.fromPython(src, fns).expr
    }
    assert(e.getMessage.contains(substring),
      s"expected '$substring' in '${e.getMessage}'")
  }

  test("for loop → Unsupported statement type: ast.For") {
    expectError(
      "def f(x):\n    for i in x:\n        return i\n    return 0\n",
      "Unsupported statement type: ast.For")
  }

  test("while loop → Unsupported statement type: ast.While") {
    expectError(
      "def f(x):\n    while x > 0:\n        return 1\n    return 0\n",
      "Unsupported statement type: ast.While")
  }

  test("global → Unsupported statement type: ast.Global") {
    expectError(
      "def f(x):\n    global y\n    return x\n",
      "Unsupported statement type: ast.Global")
  }

  test("walrus → ast.NamedExpr") {
    expectError(
      "def f(x):\n    s = (y := x) + 1\n    return s\n",
      "ast.NamedExpr")
  }

  test("and/or → ast.BoolOp") {
    expectError(
      "def f(x):\n    if x > 0 and x < 10:\n        return 1\n    return 0\n",
      "ast.BoolOp")
    expectError(
      "def f(x):\n    if x < 0 or x > 10:\n        return 1\n    return 0\n",
      "ast.BoolOp")
  }

  test("chained comparison → Polars can't handle chained comparisons") {
    expectError(
      "def f(x):\n    if 0 < x < 10:\n        return 1\n    return 0\n",
      "Polars can't handle chained comparisons")
  }

  test("star assignment target → inside assignment target") {
    expectError(
      "def f(x):\n    b, *a = [1, x]\n    return b\n",
      "Unsupported expression type inside assignment target")
  }

  test("bare return → return needs a value") {
    expectError("def f(x):\n    return\n", "return needs a value")
  }

  test("missing return → Not all branches return") {
    expectError("def f(x):\n    s = x\n", "Not all branches return")
    expectError(
      "def f(x):\n    if x > 0:\n        return 1\n",
      "Not all branches return")
  }

  test("mapping pattern → ast.MatchMapping") {
    expectError(
      "def f(x):\n    match x:\n        case {1: 2}:\n            return 1\n        case _:\n            return 0\n",
      "ast.MatchMapping")
  }

  test("star pattern → starred patterns are not supported.") {
    expectError(
      "def f(x):\n    match x:\n        case 0, *rest:\n            return 0\n        case _:\n            return 1\n",
      "starred patterns are not supported.")
  }

  test("sequence pattern against scalar subject → Matching lists is not supported.") {
    expectError(
      "def f(x):\n    match x:\n        case [0, 1]:\n            return 0\n        case _:\n            return 1\n",
      "Matching lists is not supported.")
  }

  test("subscript / attribute / dict → unsupported expression types") {
    expectError("def f(x):\n    s = x[0]\n    return s\n", "ast.Subscript")
    expectError("def f(x):\n    s = x.real\n    return s\n", "ast.Attribute")
    expectError("def f(x):\n    s = {}\n    return x\n", "ast.Dict")
    // dict-unpacking has no top-level colon but is still a Dict in
    // CPython's grammar; a set literal stays a Set
    expectError("def f(x):\n    s = {**x}\n    return x\n", "ast.Dict")
    expectError("def f(x):\n    s = {1, 2}\n    return x\n", "ast.Set")
  }

  test("unknown function → helpful resolution error") {
    expectError("def f(x):\n    return mystery(x)\n", "Unknown function: mystery")
  }

  test("bare expression statement → ast.Expr") {
    expectError("def f(x):\n    x + 1\n    return x\n", "ast.Expr")
  }
}
