package graft.polarify

import graft.polarify.dsl._

/** The reference's 48-function conformance corpus, re-expressed in the
  * DSL, each paired with a per-row imperative oracle (the analogue of the
  * reference's `df.map_rows(original)` differential oracle,
  * ref tests/test_parse_body.py:50-53).
  *
  * Base functions: /root/reference/tests/functions.py:12-261;
  * match functions: /root/reference/tests/functions_310.py:5-289.
  */
object Corpus {

  final case class Case(name: String, program: Program, oracle: Long => Long)

  private val x = "x".ref

  // named exactly as the reference's callee (functions.py:57-58) so the
  // explain text of this twin and of the parsed verbatim source agree
  // (ReferenceCorpusSpec)
  private def identityCall(arg: Expr): Expr =
    CallFn("call_target_identity", (cols, _) => cols.head, Seq(arg),
      Some((args, _) => args.head))

  /** kwarg-taking callee — covers the keyword arm of visit_Call
    * (ref main.py:104-107 inlines `node.keywords` alongside `node.args`;
    * the reference corpus itself never exercises it, so this case is an
    * addition, not a port).
    */
  private def clipCall(arg: Expr, lo: Expr, hi: Expr): Expr =
    CallFn("clip",
      (cols, kw) =>
        org.apache.spark.sql.functions.greatest(kw("lo"),
          org.apache.spark.sql.functions.least(kw("hi"), cols.head)),
      Seq(arg),
      Some((args, kw) => s"greatest(${kw("lo")}, least(${kw("hi")}, ${args.head}))"),
      kwargs = Seq("lo" -> lo, "hi" -> hi))

  val base: Seq[Case] = Seq(
    Case("signum",
      Program(
        "s" := 0,
        When(x > 0)("s" := 1).elseWhen(x < 0)("s" := -1),
        Ret("s".ref)),
      v => if (v > 0) 1 else if (v < 0) -1 else 0),

    Case("early_return",
      Program(When(x > 0)(Ret(1)), Ret(0)),
      v => if (v > 0) 1 else 0),

    Case("assign_both_branches",
      Program(
        When(x > 0)("s" := 1).otherwise("s" := -1),
        Ret("s".ref)),
      v => if (v > 0) 1 else -1),

    Case("unary_expr",
      Program("s" := -x, Ret("s".ref)),
      v => -v),

    Case("call_expr",
      Program(
        "k" := x * 2,
        "s" := identityCall("k".ref + 3),
        Ret("s".ref)),
      v => v * 2 + 3),

    Case("call_expr_kwargs",
      Program(
        "k" := x * 2,
        "s" := clipCall("k".ref, Lit(-10) - x, Lit(10) + x),
        Ret("s".ref)),
      v => math.max(-10 - v, math.min(10 + v, v * 2))),

    // built from SOURCE TEXT via the parser front-end — puts the whole
    // source→ast→compile pipeline (the reference's actual entry point,
    // __init__.py:40-53) under the exhaustive differential oracle AND,
    // via SparkEntry, under the driver's DuckDB gate
    Case("pysource_grade",
      Program.fromPython(
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
          |    return g * 10 + (1 if x % 2 == 0 else 0)
          |""".stripMargin),
      v => (if (v >= 60) 4 else if (v >= 30) 3 else if (v >= 0) 2 else 1) * 10 +
        (if (v % 2 == 0) 1 else 0)),

    Case("pysource_destructure",
      Program.fromPython(
        """
          |def spread(x):
          |    a, b = x + 1, x - 1
          |    lo = hi = a * b
          |    if a > 0:
          |        hi = a * 2
          |    return hi - lo
          |""".stripMargin),
      v => {
        val a = v + 1; val b = v - 1
        val lo = a * b
        val hi = if (a > 0) a * 2 else lo
        hi - lo
      }),

    Case("pysource_early",
      Program.fromPython(
        """
          |def clamp(x):
          |    cap: int = 50
          |    if x > cap:
          |        return cap
          |    if x < 0 - cap:
          |        return 0 - cap
          |    return x
          |    cap = 99
          |""".stripMargin),
      v => if (v > 50) 50 else if (v < -50) -50 else v),

    Case("pysource_call",
      Program.fromPython(
        """
          |def scaled(x):
          |    s = double(x) + clip(x, lo=0 - 5, hi=5)
          |    return s
          |""".stripMargin,
        functions = Map(
          "double" -> parser.PyParser.PyFn(
            (args, _) => args.head * 2,
            Some((args, _) => s"(${args.head} * 2)")),
          "clip" -> parser.PyParser.PyFn(
            (args, kw) =>
              org.apache.spark.sql.functions.greatest(kw("lo"),
                org.apache.spark.sql.functions.least(kw("hi"), args.head)),
            Some((args, kw) =>
              s"greatest(${kw("lo")}, least(${kw("hi")}, ${args.head}))")))),
      v => v * 2 + math.max(-5, math.min(5, v))),

    Case("pysource_match",
      Program.fromPython(
        """
          |def route(x):
          |    match x % 4:
          |        case 0:
          |            return x
          |        case 1 | -1:
          |            return x * 2
          |        case r if r > 0:
          |            return r
          |        case _:
          |            return 0 - x
          |""".stripMargin),
      v => (v % 4) match {
        case 0           => v
        case 1 | -1      => v * 2
        case r if r > 0  => r
        case _           => -v
      }),

    Case("if_expr",
      Program("s" := ternary(1, x > 0, -1), Ret("s".ref)),
      v => if (v > 0) 1 else -1),

    Case("if_expr2",
      Program("s" := Lit(1) + ternary(x, x > 0, -1), Ret("s".ref)),
      v => 1 + (if (v > 0) v else -1)),

    Case("if_expr3",
      Program("s" := Lit(1) + ternary(ternary(3, x < 10, 5), x > 0, -1), Ret("s".ref)),
      v => 1 + (if (v > 0) { if (v < 10) 3L else 5L } else -1)),

    Case("compare_expr",
      Program(
        When((Lit(0) < x) & (x < 10))("s" := 1).otherwise("s" := 2),
        Ret("s".ref)),
      v => if (0 < v && v < 10) 1 else 2),

    Case("multiple_if_else",
      Program(
        When(x > 0)("s" := 1).elseWhen(x < 0)("s" := -1).otherwise("s" := 0),
        Ret("s".ref)),
      v => if (v > 0) 1 else if (v < 0) -1 else 0),

    Case("nested_if_else",
      Program(
        When(x > 0)(
          When(x > 1)("s" := 2).otherwise("s" := 1)
        ).elseWhen(x < 0)("s" := -1).otherwise("s" := 0),
        Ret("s".ref)),
      v => if (v > 0) { if (v > 1) 2 else 1 } else if (v < 0) -1 else 0),

    Case("nested_if_else_expr",
      Program(
        When(x > 0)("s" := ternary(2, x > 1, 1))
          .elseWhen(x < 0)("s" := -1)
          .otherwise("s" := 0),
        Ret("s".ref)),
      v => if (v > 0) { if (v > 1) 2 else 1 } else if (v < 0) -1 else 0),

    Case("assignments_inside_branch",
      Program(
        When(x > 0)(
          "s" := 1,
          "s" := "s".ref + 1,
          "s" := x * "s".ref
        ).elseWhen(x < 0)(
          "s" := -1,
          "s" := "s".ref - 1,
          "s" := x
        ).otherwise("s" := 0),
        Ret("s".ref)),
      v => if (v > 0) v * 2 else if (v < 0) v else 0),

    Case("override_default",
      Program(
        "s" := 0,
        When(x > 0)("s" := 10),
        Ret(x * "s".ref)),
      v => if (v > 0) v * 10 else 0),

    Case("no_if_else",
      Program(
        "s" := x * 10,
        "k" := x - 3,
        "k" := "k".ref * 2,
        Ret("s".ref * "k".ref)),
      v => (v * 10) * ((v - 3) * 2)),

    Case("two_if_expr",
      Program(
        "a" := ternary(1, x > 0, 5),
        "b" := ternary(2, x < 0, 2),
        Ret("a".ref + "b".ref)),
      v => (if (v > 0) 1L else 5L) + 2L),

    Case("signum_no_default",
      Program(
        When(x > 0)(Ret(1)).elseWhen(x < 0)(Ret(-1)),
        Ret(0)),
      v => if (v > 0) 1 else if (v < 0) -1 else 0),

    Case("nested_partial_return_with_assignments",
      Program(
        When(x > 0)(
          "s" := 1,
          When(x > 1)(
            "s" := 2,
            Ret("s".ref + x)
          ).otherwise("s" := -1)
        ).otherwise(Ret(Lit(-5) - x)),
        Ret("s".ref * x)),
      v => if (v > 0) { if (v > 1) 2 + v else -1 * v } else -5 - v),

    Case("multiple_equals",
      Program(
        Assign(Seq(NameTarget("a"), NameTarget("b")), Lit(1)),
        Ret(x + "a".ref + "b".ref)),
      v => v + 2),

    Case("tuple_assignments",
      Program(
        Assign(Seq(SeqTarget(Seq(NameTarget("a"), NameTarget("b")))), tup(Lit(1), x)),
        Ret(x + "a".ref + "b".ref)),
      v => v + 1 + v),

    Case("list_assignments",
      Program(
        Assign(Seq(SeqTarget(Seq(NameTarget("a"), NameTarget("b")))),
          ListExpr(Seq(Lit(1), x))),
        Ret(x + "a".ref + "b".ref)),
      v => v + 1 + v),

    Case("annotated_assign",
      Program(AnnAssign("s", Lit(15)), Ret("s".ref + x)),
      v => 15 + v),

    Case("conditional_assign",
      Program(
        "s" := 1,
        When(x > 0)("s" := 2),
        "b" := 3,
        Ret("b".ref)),
      _ => 3),

    Case("multiple_if",
      Program(
        "s" := 1,
        When(x > 0)("s" := 2),
        When(x > 1)("s" := 3),
        Ret("s".ref)),
      v => if (v > 1) 3 else if (v > 0) 2 else 1),

    Case("return_unconditional_constant",
      Program(
        When(x > 0)("s" := 1).otherwise("s" := 2),
        Ret(1)),
      _ => 1),

    Case("return_conditional_constant",
      Program(When(x > 0)(Ret(1)), Ret(0)),
      v => if (v > 0) 1 else 0)
  )

  val matches: Seq[Case] = Seq(
    Case("match_case",
      Program(
        "s" := 0,
        MatchOn(x)(
          CaseVal(0)("s" := 1),
          CaseVal(2)("s" := -1),
          CaseWild()("s" := 0)),
        Ret("s".ref)),
      v => if (v == 0) 1 else if (v == 2) -1 else 0),

    Case("match_with_or",
      Program(
        MatchOn(x)(
          CaseOr(Seq(pv(0), pv(1)))(Ret(0)),
          CaseVal(2)(Ret(Lit(2) * x)),
          CaseVal(3)(Ret(Lit(3) * x))),
        Ret(x)),
      v => if (v == 0 || v == 1) 0 else if (v == 2) v * 2 else if (v == 3) v * 3 else v),

    Case("match_assignments_inside_branch",
      Program(
        MatchOn(x)(
          CaseVal(0)(Ret(0)),
          CaseVal(1)(Ret(Lit(2) * x)),
          CaseVal(2)(Ret(Lit(3) * x))),
        Ret(x)),
      v => if (v == 0) 0 else if (v == 1) v * 2 else if (v == 2) v * 3 else v),

    Case("nested_match",
      Program(
        MatchOn(x)(
          CaseVal(0)(
            MatchOn(x)(
              CaseVal(0)(Ret(1)),
              CaseVal(1)(Ret(2))),
            Ret(3)),
          CaseVal(1)(Ret(4))),
        Ret(5)),
      v => if (v == 0) 1 else if (v == 1) 4 else 5),

    Case("match_compare_expr",
      Program(
        MatchOn(x)(
          CaseVal(0)(Ret(2)),
          CaseVal(1)(Ret(1)),
          CaseVal(10)(Ret(2))),
        Ret(1)),
      v => if (v == 0) 2 else if (v == 1) 1 else if (v == 10) 2 else 1),

    Case("match_nested_partial_return_with_assignments",
      Program(
        MatchOn(x)(
          CaseVal(0)(Ret(Lit(-5) - x)),
          CaseVal(1)(Ret(Lit(1) * x)),
          CaseVal(2)(Ret(Lit(2) + x))),
        Ret(Lit(-1) * x)),
      v => if (v == 0) -5 - v else if (v == 1) v else if (v == 2) 2 + v else -v),

    Case("match_signum",
      Program(
        "s" := 0,
        MatchOn(x)(
          CaseVal(0)("s" := 1),
          CaseVal(2)("s" := -1),
          CaseVal(3)("s" := 0)),
        Ret("s".ref)),
      v => if (v == 0) 1 else if (v == 2) -1 else 0),

    Case("match_multiple_variables",
      Program(
        "y" := 3,
        MatchOn(tup(x, "y".ref))(
          CaseSeq(Seq(pv(1), pv(3)))(Ret(1)),
          CaseWild()(Ret(5)))),
      v => if (v == 1) 1 else 5),

    Case("match_with_guard",
      Program(
        MatchOn(x)(
          CaseVal(5).ifGuard(x > 3)(Ret(1)),
          CaseWild()(Ret(5)))),
      v => if (v == 5 && v > 3) 1 else 5),

    Case("match_with_guard_variable",
      Program(
        MatchOn(x)(
          CaseBind("y").ifGuard("y".ref > 5)(Ret(1)),
          CaseWild()(Ret(5)))),
      v => if (v > 5) 1 else 5),

    Case("match_with_guard_multiple_variable",
      Program(
        "y" := 3,
        MatchOn(tup(x, "y".ref))(
          CaseSeq(Seq(pv(1), pbind("z"))).ifGuard("z".ref > 3)(Ret(1)),
          CaseSeq(Seq(pbind("z"), pv(3))).ifGuard("z".ref > 3)(Ret(2)),
          CaseWild()(Ret(5)))),
      v => if (v == 1 && 3 > 3) 1 else if (v > 3 && 3 == 3) 2 else 5),

    Case("match_sequence_incomplete",
      Program(
        "y" := 2,
        "z" := 3,
        MatchOn(tup(x, "y".ref, "z".ref))(
          CaseSeq(Seq(pv(0), pv(1), pv(2)))(Ret(0)),
          CaseSeq(Seq(pv(1), pv(2)))(Ret(1)),
          CaseVal(2)(Ret(2))),
        Ret(x)),
      v => v),

    Case("multiple_match",
      Program(
        MatchOn(x)(
          CaseVal(0)(Ret(1)),
          CaseVal(1)(Ret(2))),
        MatchOn(x)(
          CaseVal(0)(Ret(3)),
          CaseVal(1)(Ret(4))),
        Ret(x)),
      v => if (v == 0) 1 else if (v == 1) 2 else v),

    Case("match_with_assignment",
      Program(
        MatchOn(x)(
          CaseBind("y").ifGuard(x > 1)(
            "y" := "y".ref * 2,
            Ret("y".ref)),
          CaseWild()(Ret(x)))),
      v => if (v > 1) v * 2 else v),

    Case("match_with_assignment_hard",
      Program(
        MatchOn(x)(
          CaseBind("y").ifGuard(x > 1)("y" := "y".ref * 2),
          CaseWild()(Ret(x))),
        Ret("y".ref + 2)),
      v => if (v > 1) v * 2 + 2 else v),

    Case("match_complex_subject",
      Program(
        MatchOn(x + 2)(
          CaseVal(3)(Ret(1)),
          CaseWild()(Ret(x)))),
      v => if (v + 2 == 3) 1 else v),

    Case("match_guarded_match_as",
      Program(
        MatchOn(x)(
          CaseVal(1)(Ret(0)),
          CaseWild().ifGuard(x > 1)(Ret(2))),
        Ret(3)),
      v => if (v == 1) 0 else if (v > 1) 2 else 3),

    Case("match_guard_no_assignation",
      Program(
        MatchOn(x)(
          CaseWild().ifGuard(x > 1)(Ret(0)),
          CaseWild()(Ret(2)))),
      v => if (v > 1) 0 else 2),

    Case("match_sequence_unmatchable_case",
      Program(
        "y" := 1,
        "z" := 2,
        MatchOn(tup(x, "y".ref, "z".ref))(
          CaseSeq(Seq(pv(1), pv(2)))(Ret(1)),
          CaseSeq(Seq(pv(3), pv(4)))(Ret(-1)),
          CaseSeq(Seq(pv(1), pv(2), pv(3)))(Ret(2))),
        Ret(x)),
      v => v),

    Case("match_sequence_unmatchable_case_smaller",
      Program(
        "y" := 2,
        "z" := Lit(null),
        MatchOn(tup(x, "y".ref, "z".ref))(
          CaseSeq(Seq(pv(1), pv(2)))(Ret(1)),
          CaseWild()(Ret(x)))),
      v => v),

    Case("match_sequence_unmatchable_case_smaller_return",
      Program(
        "y" := 1,
        "z" := 2,
        MatchOn(tup(x, "y".ref, "z".ref))(
          CaseSeq(Seq(pv(1), pv(2)))("x" := 4, Ret(1))),
        Ret(x)),
      v => v),

    Case("match_sequence_unmatchable_case_larger",
      Program(
        "y" := 2,
        MatchOn(tup(x, "y".ref))(
          CaseSeq(Seq(pv(1), pv(2), pv(3)))(Ret(1)),
          CaseWild()(Ret(x * 2)))),
      v => v * 2)
  )

  val all: Seq[Case] = base ++ matches
}
