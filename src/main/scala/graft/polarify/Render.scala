package graft.polarify

/** Resolved, fully inlined [[Expr]] tree → human-readable when-chain
  * text — the debugging surface matching the reference's
  * `transform_func_to_new_source` (ref: polarify/__init__.py:17-37,
  * demoed in README.md:134-162), which unparses the transpiled source so
  * users can SEE the conditional chain their imperative code became.
  *
  * Output shape mirrors the Spark API the program compiles to:
  * `when((x > 0), 1).when((x < 0), -1).otherwise(0)`.
  */
object Render {

  def toText(e: Expr): String = e match {
    case WhenChain(cases, orelse) =>
      cases.map { case (t, v) => s"when(${toText(t)}, ${toText(v)})" }
        .mkString(".") + s".otherwise(${toText(orelse)})"
    case IfExp(t, b, o) => toText(WhenChain(Seq((t, b)), o))
    case Lit(s: String) => "'" + s + "'"
    case Lit(v)         => String.valueOf(v)
    case Ref(n)         => n
    case BinOp(op, l, r) => s"(${toText(l)} ${op.python} ${toText(r)})"
    case UnaryOp(UnaryOperator.Not, o) => s"(not ${toText(o)})"
    // negative literals print compactly: CPython's ast (and hence the
    // parser front-end) represents -1 as USub(Constant(1))
    case UnaryOp(UnaryOperator.USub, Lit(v: Long))   => s"-$v"
    case UnaryOp(UnaryOperator.USub, Lit(v: Int))    => s"-$v"
    case UnaryOp(UnaryOperator.USub, Lit(v: Double)) => s"-$v"
    case UnaryOp(op, o) => s"(${op.python}${toText(o)})"
    case Compare(l, ops, cs) =>
      ops.zip(cs).foldLeft(toText(l)) { case (acc, (op, c)) =>
        s"$acc ${op.python} ${toText(c)}"
      } match { case s => s"($s)" }
    case CallFn(name, _, args, _, kwargs) =>
      val rendered = args.map(toText) ++
        kwargs.map { case (k, v) => s"$k=${toText(v)}" }
      s"$name(${rendered.mkString(", ")})"
    case BoolOp(op, values) => values.map(toText).mkString(s" $op ")
    case TupleExpr(es)      => es.map(toText).mkString("(", ", ", ")")
    case ListExpr(es)       => es.map(toText).mkString("[", ", ", "]")
  }
}
