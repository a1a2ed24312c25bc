package graft.polarify

/** Concise builders for the mini-AST — the ergonomic face of the DSL.
  *
  * Python source introspection has no Scala analogue, so where reference
  * users write decorated imperative functions (ref README.md:99-113), our
  * users write the same shape with light syntax:
  *
  * {{{
  * Program(
  *   "s" := 0,
  *   When("x".ref > 0)("s" := 1).elseWhen("x".ref < 0)("s" := -1),
  *   Ret("s".ref))
  * }}}
  */
package object dsl {

  implicit def intLit(i: Int): Expr     = Lit(i)
  implicit def longLit(l: Long): Expr   = Lit(l)
  implicit def dblLit(d: Double): Expr  = Lit(d)
  implicit def strLit(s: String): Expr  = Lit(s)
  implicit def boolLit(b: Boolean): Expr = Lit(b)

  implicit final class StringDsl(private val name: String) extends AnyVal {
    /** Named reference (column or bound variable). */
    def ref: Ref = Ref(name)
    /** Assignment statement `name := expr`. */
    def :=(value: Expr): Assign = Assign(name, value)
  }

  implicit final class ExprOps(private val e: Expr) extends AnyVal {
    def +(o: Expr): Expr = BinOp(BinOperator.Add, e, o)
    def -(o: Expr): Expr = BinOp(BinOperator.Sub, e, o)
    def *(o: Expr): Expr = BinOp(BinOperator.Mult, e, o)
    def /(o: Expr): Expr = BinOp(BinOperator.Div, e, o)
    def %(o: Expr): Expr = BinOp(BinOperator.Mod, e, o)
    def **(o: Expr): Expr = BinOp(BinOperator.Pow, e, o)
    def &(o: Expr): Expr = BinOp(BinOperator.BitAnd, e, o)
    def |(o: Expr): Expr = BinOp(BinOperator.BitOr, e, o)
    def ^(o: Expr): Expr = BinOp(BinOperator.BitXor, e, o)
    def ===(o: Expr): Expr = Compare(e, CmpOperator.Eq, o)
    def !==(o: Expr): Expr = Compare(e, CmpOperator.NotEq, o)
    def <(o: Expr): Expr = Compare(e, CmpOperator.Lt, o)
    def <=(o: Expr): Expr = Compare(e, CmpOperator.LtE, o)
    def >(o: Expr): Expr = Compare(e, CmpOperator.Gt, o)
    def >=(o: Expr): Expr = Compare(e, CmpOperator.GtE, o)
    def unary_- : Expr = UnaryOp(UnaryOperator.USub, e)
    def unary_! : Expr = UnaryOp(UnaryOperator.Not, e)
    def unary_~ : Expr = UnaryOp(UnaryOperator.Invert, e)
  }

  /** `v if c else o` ternary, python argument order. */
  def ternary(body: Expr, test: Expr, orelse: Expr): IfExp = IfExp(test, body, orelse)

  /** `return expr`. */
  def Ret(e: Expr): Return = Return(e)

  /** if/elif/else builder: `When(t)(stmts...).elseWhen(t2)(...).otherwise(...)`. */
  final case class When(test: Expr) {
    def apply(body: Stmt*): IfBuilder = IfBuilder(Seq((test, body.toSeq)), Nil)
  }

  final case class IfBuilder(branches: Seq[(Expr, Seq[Stmt])], orelse: Seq[Stmt]) {
    def elseWhen(test: Expr): ElseWhenStep = ElseWhenStep(this, test)
    def otherwise(stmts: Stmt*): IfBuilder = copy(orelse = stmts.toSeq)
  }
  final case class ElseWhenStep(b: IfBuilder, test: Expr) {
    def apply(body: Stmt*): IfBuilder =
      b.copy(branches = b.branches :+ (test, body.toSeq))
  }

  /** elif chains are nested Ifs in the orelse, exactly like Python's ast. */
  implicit def buildIf(b: IfBuilder): If = {
    val (lastTest, lastBody) = b.branches.last
    val innermost = If(lastTest, lastBody, b.orelse)
    b.branches.init.foldRight(innermost) { case ((t, body), acc) =>
      If(t, body, Seq(acc))
    }
  }

  /** match builder: `MatchOn(subj)(CaseVal(0)(...), CaseWild(...))`. */
  def MatchOn(subject: Expr)(cases: MatchCase*): Match = Match(subject, cases.toSeq)

  final case class CaseVal(v: Expr, guard: Option[Expr] = None) {
    def apply(body: Stmt*): MatchCase = MatchCase(MatchValue(v), guard, body.toSeq)
    def ifGuard(g: Expr): CaseVal = copy(guard = Some(g))
  }
  final case class CaseBind(name: String, guard: Option[Expr] = None) {
    def apply(body: Stmt*): MatchCase = MatchCase(MatchAs(Some(name)), guard, body.toSeq)
    def ifGuard(g: Expr): CaseBind = copy(guard = Some(g))
  }
  final case class CaseWild(guard: Option[Expr] = None) {
    def apply(body: Stmt*): MatchCase = MatchCase(MatchAs(None), guard, body.toSeq)
    def ifGuard(g: Expr): CaseWild = copy(guard = Some(g))
  }
  final case class CaseSeq(patterns: Seq[Pattern], guard: Option[Expr] = None) {
    def apply(body: Stmt*): MatchCase = MatchCase(MatchSequence(patterns), guard, body.toSeq)
    def ifGuard(g: Expr): CaseSeq = copy(guard = Some(g))
  }
  final case class CaseOr(patterns: Seq[Pattern], guard: Option[Expr] = None) {
    def apply(body: Stmt*): MatchCase = MatchCase(MatchOr(patterns), guard, body.toSeq)
    def ifGuard(g: Expr): CaseOr = copy(guard = Some(g))
  }

  /** pattern literals for CaseSeq/CaseOr bodies */
  def pv(e: Expr): Pattern = MatchValue(e)
  def pbind(name: String): Pattern = MatchAs(Some(name))
  val pwild: Pattern = MatchAs(None)

  /** tuple expression (structural only — destructuring / match subjects) */
  def tup(es: Expr*): TupleExpr = TupleExpr(es.toSeq)
}
