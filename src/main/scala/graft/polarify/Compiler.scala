package graft.polarify

import scala.collection.mutable

/** The control-flow → single-conditional-expression compiler.
  *
  * A 1:1 semantic port of the reference's symbolic-execution state machine
  * (ref: polarify/main.py:129-388): statements are folded into a symbolic
  * environment (`Map[String, Expr]`, SSA-by-substitution), conditionals
  * fork the state tree, returns resolve leaves, and the resolved tree is
  * emitted as one flat first-match-wins when-chain.
  *
  * Faithfully reproduced corner semantics (see SURVEY.md §7):
  *   - eager inlining at assignment AND use sites (main.py:83-93, 142);
  *   - statements after a conditional distribute into every unresolved
  *     leaf with forked (shallow-copied) environments (main.py:270-273,
  *     286-289, 296-299, 344-347, copy() at 281/284);
  *   - dead code after the first top-level return is dropped
  *     (main.py:363);
  *   - match: catch-all hoisted to orelse (main.py:320-324), unmatchable
  *     cases pruned (main.py:311-317), guard-first `&` order
  *     (main.py:210-215), Or-guard on the first alternative only
  *     (main.py:227-236), MatchAs bindings mutate the environment before
  *     sibling cases and the orelse are parsed (main.py:328-342);
  *   - empty pruned case list collapses to orelse (main.py:375-379);
  *   - the reference's error messages are part of the API contract and
  *     reproduced as IllegalArgumentException messages
  *     (tests/functions.py:321-329, tests/functions_310.py:316-322).
  */
object Compiler {

  private def err(msg: String): Nothing = throw new IllegalArgumentException(msg)

  // -------------------------------------------------------------------------
  // InlineTransformer (ref: main.py:79-126)
  // -------------------------------------------------------------------------

  /** Substitute bound names by their defining expressions, recursively,
    * validating the closed world of supported expression forms. Stored
    * environment values are re-visited against the *current* environment
    * at use time, exactly like `visit_Name` → `self.visit(assignments[id])`
    * (main.py:89-93) — including the quirk that a name captured free in a
    * stored expression picks up later rebindings.
    */
  def inlineExpr(expr: Expr, env: mutable.Map[String, Expr]): Expr = expr match {
    case Ref(n) =>
      env.get(n) match {
        case Some(v) => inlineExpr(v, env)
        case None    => expr
      }
    case Lit(_) => expr
    case BinOp(op, l, r) => BinOp(op, inlineExpr(l, env), inlineExpr(r, env))
    case UnaryOp(op, o)  => UnaryOp(op, inlineExpr(o, env))
    case c @ CallFn(_, _, args, _, kwargs) =>
      // both positional and keyword arguments inline (main.py:104-107)
      c.copy(
        args = args.map(inlineExpr(_, env)),
        kwargs = kwargs.map { case (k, v) => k -> inlineExpr(v, env) })
    case IfExp(t, b, o) =>
      // visit_IfExp (main.py:109-113): ternaries become single-case chains
      // at inline time.
      WhenChain(Seq((inlineExpr(t, env), inlineExpr(b, env))), inlineExpr(o, env))
    case Compare(l, ops, cs) =>
      if (cs.length > 1) err("Polars can't handle chained comparisons")
      Compare(inlineExpr(l, env), ops, cs.map(inlineExpr(_, env)))
    case WhenChain(cases, orelse) =>
      WhenChain(
        cases.map { case (t, v) => (inlineExpr(t, env), inlineExpr(v, env)) },
        inlineExpr(orelse, env))
    case BoolOp(_, _)  => err("Unsupported expression type: ast.BoolOp")
    case TupleExpr(_)  => err("Unsupported expression type: ast.Tuple")
    case ListExpr(_)   => err("Unsupported expression type: ast.List")
  }

  // -------------------------------------------------------------------------
  // State tree (ref: main.py:129-187)
  // -------------------------------------------------------------------------

  sealed trait StateKind
  /** Pending assignments of a not-yet-returned flow (main.py:130-157). */
  final class UnresolvedState(val assignments: mutable.Map[String, Expr]) extends StateKind
  /** A finished flow: the (fully inlined) returned expression. */
  final case class ReturnState(expr: Expr) extends StateKind
  /** A fork: ordered (test, state) cases + an orelse state. */
  final case class ConditionalState(body: Seq[Case], orelse: PState) extends StateKind
  final case class Case(test: Expr, state: PState)

  /** Mutable state node, mirroring the reference's `State` dataclass whose
    * `node` field is swapped in place by the handlers.
    */
  final class PState(var node: StateKind) {

    // ref: State.handle_assign (main.py:264-273) + UnresolvedState.handle_assign
    // (main.py:138-157)
    def handleAssign(stmt: Stmt): Unit = {
      val (targets, value) = stmt match {
        case Assign(ts, v)    => (ts, v)
        case AnnAssign(t, v)  => (Seq(t), v) // annotation dropped (main.py:264-266)
        case other            => throw new IllegalStateException(s"not an assign: $other")
      }
      node match {
        case u: UnresolvedState => assignInto(targets, value, u.assignments)
        case ConditionalState(body, orelse) =>
          body.foreach(_.state.handleAssign(Assign(targets, value)))
          orelse.handleAssign(Assign(targets, value))
        case _: ReturnState => () // flow already finished; statement is dead
      }
    }

    private def assignInto(
        targets: Seq[Target], value: Expr, env: mutable.Map[String, Expr]): Unit =
      targets.foreach {
        case NameTarget(n) =>
          env(n) = inlineExpr(value, env)
        case SeqTarget(elts) =>
          val vs = value match {
            case TupleExpr(es) => es
            case ListExpr(es)  => es
            case other =>
              err(s"Assignment target is ast.Tuple, but value is ${other.getClass.getSimpleName}")
          }
          require(elts.length == vs.length,
            s"destructuring arity mismatch: ${elts.length} targets, ${vs.length} values")
          elts.zip(vs).foreach { case (t, v) => assignInto(Seq(t), v, env) }
        case StarTarget(_) =>
          err("Unsupported expression type inside assignment target: ast.Starred")
      }

    // ref: State.handle_if (main.py:275-289)
    def handleIf(stmt: If): Unit = node match {
      case u: UnresolvedState =>
        node = ConditionalState(
          body = Seq(Case(
            inlineExpr(stmt.test, u.assignments),
            parseBody(stmt.body, u.assignments.clone()))),
          orelse = parseBody(stmt.orelse, u.assignments.clone()))
      case ConditionalState(body, orelse) =>
        body.foreach(_.state.handleIf(stmt))
        orelse.handleIf(stmt)
      case _: ReturnState => ()
    }

    // ref: State.handle_return (main.py:291-299)
    def handleReturn(value: Expr): Unit = node match {
      case u: UnresolvedState =>
        node = ReturnState(inlineExpr(value, u.assignments))
      case ConditionalState(body, orelse) =>
        body.foreach(_.state.handleReturn(value))
        orelse.handleReturn(value)
      case _: ReturnState => ()
    }

    // ref: State.translate_match (main.py:189-262). Returns None for a
    // bare binding pattern with no guard (the binding is the only effect).
    def translateMatch(subj: Expr, pattern: Pattern, guard: Option[Expr]): Option[Expr] =
      pattern match {
        case MatchValue(v) =>
          val eq = Compare(subj, CmpOperator.Eq, v)
          guard match {
            case Some(g) => Some(BinOp(BinOperator.BitAnd, g, eq)) // guard FIRST (main.py:210-215)
            case None    => Some(eq)
          }
        case MatchAs(nameOpt) =>
          nameOpt.foreach { n =>
            // binds subject to name — mutates the env in place so sibling
            // cases and the orelse see it (main.py:218-226, 328-335)
            handleAssign(Assign(n, subj))
          }
          guard
        case MatchOr(patterns) =>
          // guard ANDed onto the FIRST alternative only (main.py:227-236)
          val left = translateMatch(subj, patterns.head, guard)
          val right =
            if (patterns.length > 2)
              translateMatch(subj, MatchOr(patterns.tail), None)
            else
              translateMatch(subj, patterns(1), None)
          Some(BinOp(BinOperator.BitOr,
            left.getOrElse(err("match case has no test")),
            right.getOrElse(err("match case has no test"))))
        case MatchSequence(patterns) =>
          if (patterns.last.isInstanceOf[MatchStar])
            err("starred patterns are not supported.")
          subj match {
            case TupleExpr(elts) =>
              val left = translateMatch(elts.head, patterns.head, guard)
              val right =
                if (patterns.length > 2)
                  translateMatch(TupleExpr(elts.tail), MatchSequence(patterns.tail), None)
                else
                  translateMatch(elts(1), patterns(1), None)
              (left, right) match {
                case (None, r) => r
                case (l, None) => l
                case (Some(l), Some(r)) => Some(BinOp(BinOperator.BitAnd, l, r))
              }
            case _ => err("Matching lists is not supported.")
          }
        case MatchStar(_) =>
          err("starred patterns are not supported.")
        case other =>
          err(s"Incompatible match and subject types: ast.${patternName(other)} and " +
            s"${subj.getClass.getSimpleName}.")
      }

    private def patternName(p: Pattern): String = p match {
      case MatchMappingPattern => "MatchMapping"
      case _                   => p.getClass.getSimpleName
    }

    // ref: State.handle_match (main.py:301-347)
    def handleMatch(stmt: Match): Unit = {
      // catch-all = bare `case _:` with no guard (main.py:302-309)
      def isCatchAll(c: MatchCase): Boolean = c.pattern match {
        case MatchAs(None) => c.guard.isEmpty
        case _             => false
      }
      // python statically ignores arity-incompatible tuple cases
      // (main.py:311-317)
      def ignoreCase(c: MatchCase): Boolean = (c.pattern, stmt.subject) match {
        case (MatchSequence(ps), TupleExpr(es)) => ps.length != es.length
        case (MatchValue(_), TupleExpr(_))      => true
        case _                                  => false
      }

      node match {
        case u: UnresolvedState =>
          val orelseBody: Seq[Stmt] =
            stmt.cases.find(isCatchAll).map(_.body).getOrElse(Nil)
          // Sequencing matters: translate each case's pattern (which may
          // bind names into u.assignments) BEFORE parsing its body with a
          // fork of the then-current env; the orelse is parsed last with
          // the fully mutated env (main.py:325-343 evaluation order).
          val cases = stmt.cases
            .filterNot(c => isCatchAll(c) || ignoreCase(c))
            .map { c =>
              val test = translateMatch(stmt.subject, c.pattern, c.guard)
                .getOrElse(err("match case has no test"))
              Case(
                inlineExpr(test, u.assignments),
                parseBody(c.body, u.assignments.clone()))
            }
          node = ConditionalState(cases, parseBody(orelseBody, u.assignments.clone()))
        case ConditionalState(body, orelse) =>
          body.foreach(_.state.handleMatch(stmt))
          orelse.handleMatch(stmt)
        case _: ReturnState => ()
      }
    }
  }

  // -------------------------------------------------------------------------
  // parse_body (ref: main.py:350-369)
  // -------------------------------------------------------------------------

  def parseBody(
      fullBody: Seq[Stmt],
      assignments: mutable.Map[String, Expr] = mutable.Map.empty): PState = {
    val state = new PState(new UnresolvedState(assignments))
    var i = 0
    var done = false
    while (i < fullBody.length && !done) {
      fullBody(i) match {
        case s: Assign    => state.handleAssign(s)
        case s: AnnAssign => state.handleAssign(s)
        case s: If        => state.handleIf(s)
        case Return(valueOpt) =>
          val v = valueOpt.getOrElse(err("return needs a value"))
          state.handleReturn(v)
          done = true // dead code after the first top-level return (main.py:363)
        case s: Match => state.handleMatch(s)
        case UnsupportedStmt(n) => err(s"Unsupported statement type: ast.$n")
      }
      i += 1
    }
    state
  }

  // -------------------------------------------------------------------------
  // transform_tree_into_expr (ref: main.py:372-388)
  // -------------------------------------------------------------------------

  def resolve(state: PState): Expr = state.node match {
    case ReturnState(e) => e
    case ConditionalState(body, orelse) =>
      if (body.isEmpty) resolve(orelse) // all cases pruned (main.py:375-379)
      else {
        val cases = body.map(c => (c.test, resolve(c.state)))
        resolve(orelse) match {
          // flat chain, not nested otherwise: each later `when` hangs off
          // the previous then node (ref build_polars_when_then_otherwise,
          // main.py:49-75) — also yields ONE flat Catalyst CaseWhen
          case WhenChain(oCases, oElse) => WhenChain(cases ++ oCases, oElse)
          case other                    => WhenChain(cases, other)
        }
      }
    case _: UnresolvedState => err("Not all branches return")
  }

  /** Full pipeline: statements → resolved, fully inlined expression tree. */
  def compileToExpr(stmts: Seq[Stmt]): Expr = resolve(parseBody(stmts))
}
