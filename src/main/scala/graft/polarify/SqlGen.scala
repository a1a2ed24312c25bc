package graft.polarify

/** Resolved, fully inlined [[Expr]] tree → ANSI/DuckDB SQL text.
  *
  * Used to auto-generate the DuckDB oracle (`SparkEntry.oracleSql`) from
  * the very same compiled tree that produces the Spark [[Column]] — the
  * oracle can never drift from the implementation by hand-editing.
  *
  * `WhenChain` renders as first-match-wins `CASE WHEN`, which is
  * semantically identical to both `pl.when/then/otherwise` and Catalyst
  * `CaseWhen` (null test = no match).
  */
object SqlGen {
  import BinOperator._
  import UnaryOperator._
  import CmpOperator._

  def toSql(expr: Expr, params: Map[String, String] = Map.empty): String = {
    def go(e: Expr): String = e match {
      case Lit(null)       => "NULL"
      case Lit(s: String)  => "'" + s.replace("'", "''") + "'"
      case Lit(b: Boolean) => if (b) "TRUE" else "FALSE"
      case Lit(v)          => v.toString
      case Ref(n)          => params.getOrElse(n, n)
      case BinOp(op, l, r) =>
        val (ls, rs) = (go(l), go(r))
        op match {
          case Add      => s"($ls + $rs)"
          case Sub      => s"($ls - $rs)"
          case Mult     => s"($ls * $rs)"
          case Div      => s"($ls / $rs)"
          case Mod      => s"($ls % $rs)"
          case Pow      => s"power($ls, $rs)"
          case BitAnd   => s"($ls AND $rs)"   // boolean usage, see ColumnGen
          case BitOr    => s"($ls OR $rs)"
          case BitXor   => s"xor($ls, $rs)"
          case FloorDiv => s"CAST(floor($ls / $rs) AS BIGINT)"
        }
      case UnaryOp(op, o) =>
        val os = go(o)
        op match {
          // operand always parenthesized: a bare negative literal would
          // render `--x`, which SQL lexes as a line comment (found by
          // ProgramFuzzSpec)
          case USub   => s"(-($os))"
          case Not    => s"(NOT $os)"
          case Invert => s"(~($os))"
        }
      case Compare(l, Seq(op), Seq(r)) =>
        val o = op match {
          case Eq    => "="
          case NotEq => "<>"
          case Lt    => "<"
          case LtE   => "<="
          case Gt    => ">"
          case GtE   => ">="
        }
        s"(${go(l)} $o ${go(r)})"
      case Compare(_, _, _) =>
        throw new IllegalArgumentException("Polars can't handle chained comparisons")
      case CallFn(name, _, args, sqlGen, kwargs) =>
        sqlGen match {
          case Some(g) =>
            g(args.map(go), kwargs.map { case (k, v) => k -> go(v) }.toMap)
          case None => throw new IllegalArgumentException(
            s"CallFn '$name' has no SQL rendering — omit this query from oracleSql")
        }
      case WhenChain(cases, orelse) =>
        val whens = cases.map { case (t, v) => s"WHEN ${go(t)} THEN ${go(v)}" }
        s"CASE ${whens.mkString(" ")} ELSE ${go(orelse)} END"
      case IfExp(t, b, o) =>
        s"CASE WHEN ${go(t)} THEN ${go(b)} ELSE ${go(o)} END"
      case other =>
        throw new IllegalArgumentException(
          s"Unsupported expression type: ${other.getClass.getSimpleName}")
    }
    go(expr)
  }
}
