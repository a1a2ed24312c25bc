package graft.polarify.parser

import graft.polarify._
import org.apache.spark.sql.Column

/** Recursive-descent parser for the exact Python subset the reference
  * transpiles — the missing front-end piece of operator #18/#19 parity:
  * reference users hand `@polarify` an ordinary Python function
  * (ref: polarify/__init__.py:40-53 via `inspect.getsource` + `ast.parse`);
  * our users can now hand `Program.fromPython` the same source text.
  *
  * Supported statements: assignment (multi-target, tuple/list
  * destructuring), annotated assignment, if/elif/else, return, match
  * (value / or / capture / wildcard / sequence patterns, guards).
  * Supported expressions: constants, names, binary/unary ops,
  * single comparisons, ternaries, calls with positional + keyword args
  * (resolved against a caller-supplied registry — Scala has no caller
  * globals to `exec` against).
  *
  * Everything outside the subset fails at parse/compile time with the
  * reference's error message (ref README.md:203-212): chained
  * comparisons, and/or BoolOps, walrus, star patterns/targets, mapping
  * patterns, list matching, for/while/global, return-without-value,
  * missing returns.
  */
object PyParser {

  /** a callable visible to parsed source — the analogue of a function in
    * the decorated function's globals (ref: main.py:104-107 keeps the
    * call; CPython resolves it at exec time)
    */
  final case class PyFn(
      fn: (Seq[Column], Map[String, Column]) => Column,
      sql: Option[(Seq[String], Map[String, String]) => String] = None)

  final case class ParsedFunction(name: String, params: Seq[String], program: Program)

  private def err(msg: String): Nothing = throw new IllegalArgumentException(msg)

  def parse(source: String, functions: Map[String, PyFn] = Map.empty): ParsedFunction =
    new P(Lexer.lex(source), functions).parseModule()

  // parser-internal: one element of an assignment-target list
  private final case class TItem(e: Expr, starred: Boolean)
  private final case class TList(items: Seq[TItem], isTuple: Boolean)

  private final class P(toks: Vector[Tok], functions: Map[String, PyFn]) {
    private var pos = 0

    private def peek: Tok = toks(pos)
    private def peek2: Tok = toks(math.min(pos + 1, toks.length - 1))
    private def next(): Tok = { val t = toks(pos); pos += 1; t }
    private def at(op: String): Boolean = peek == Tok.Op(op)
    private def atName(n: String): Boolean = peek == Tok.Name(n)
    private def eat(op: String): Unit =
      if (at(op)) pos += 1 else err(s"expected '$op', found $peek")
    private def eatName(n: String): Unit =
      if (atName(n)) pos += 1 else err(s"expected '$n', found $peek")
    private def eatNewline(): Unit = peek match {
      case Tok.Newline => pos += 1
      case Tok.Eof     => ()
      case other       => err(s"expected end of line, found $other")
    }
    private def skipNewlines(): Unit =
      while (peek == Tok.Newline) pos += 1

    // ---------------------------------------------------------------
    // module := decorator* "def" NAME "(" params ")" [-> type] ":" block
    // ---------------------------------------------------------------
    def parseModule(): ParsedFunction = {
      skipNewlines()
      while (at("@")) { // decorators skipped, like the reference strips them
        while (peek != Tok.Newline && peek != Tok.Eof) pos += 1
        skipNewlines()
      }
      eatName("def")
      val fname = name()
      eat("(")
      val params = scala.collection.mutable.ArrayBuffer.empty[String]
      while (!at(")")) {
        params += name()
        if (at(":")) { eat(":"); typeExpr() } // parameter annotation, dropped
        if (at(",")) eat(",")
      }
      eat(")")
      if (at("->")) { eat("->"); typeExpr() } // return annotation, dropped
      eat(":")
      val body = block()
      skipNewlines()
      if (peek != Tok.Eof) err(s"unexpected trailing input: $peek")
      ParsedFunction(fname, params.toSeq, Program(body))
    }

    private def name(): String = next() match {
      case Tok.Name(s) => s
      case other       => err(s"expected a name, found $other")
    }

    /** annotations are dropped (ref: main.py:264-266) — accept a dotted name */
    private def typeExpr(): Unit = {
      name()
      while (at(".")) { eat("."); name() }
    }

    // ---------------------------------------------------------------
    // statements
    // ---------------------------------------------------------------
    private def block(): Seq[Stmt] = {
      if (peek != Tok.Newline) { // inline suite: `if x > 0: return 1`
        val stmts = scala.collection.mutable.ArrayBuffer[Stmt](simpleStmt())
        while (at(";")) { eat(";"); stmts += simpleStmt() }
        eatNewline()
        return stmts.toSeq
      }
      eatNewline()
      if (peek != Tok.Indent) err("expected an indented block")
      next()
      val stmts = scala.collection.mutable.ArrayBuffer.empty[Stmt]
      while (peek != Tok.Dedent && peek != Tok.Eof) stmts += statement()
      if (peek == Tok.Dedent) next()
      stmts.toSeq
    }

    private val unsupportedKeywords = Map(
      "for" -> "For", "while" -> "While", "global" -> "Global",
      "break" -> "Break", "continue" -> "Continue", "pass" -> "Pass",
      "import" -> "Import", "from" -> "ImportFrom", "with" -> "With",
      "try" -> "Try", "raise" -> "Raise", "del" -> "Delete",
      "assert" -> "Assert", "def" -> "FunctionDef", "class" -> "ClassDef",
      "nonlocal" -> "Nonlocal")

    private def statement(): Stmt = peek match {
      case Tok.Name("if")    => ifStmt()
      case Tok.Name("match") => matchStmt()
      case Tok.Name(kw) if unsupportedKeywords.contains(kw) =>
        // same rejection as the reference's statement dispatch
        // (main.py:367-368) — fail fast, no need to consume the body
        err(s"Unsupported statement type: ast.${unsupportedKeywords(kw)}")
      case _ =>
        val s = simpleStmt()
        eatNewline()
        s
    }

    private def simpleStmt(): Stmt = peek match {
      case Tok.Name("return") =>
        next()
        if (peek == Tok.Newline || peek == Tok.Eof || at(";")) Return(None)
        else Return(Some(tlistExpr(tlist())))
      case Tok.Name(kw) if unsupportedKeywords.contains(kw) =>
        err(s"Unsupported statement type: ast.${unsupportedKeywords(kw)}")
      case _ => assignOrExprStmt()
    }

    /** `a = 1`, `a = b = 1`, `a, b = 1, x`, `b, *a = ...`, `s: int = 15`;
      * bare expressions are rejected like ast.Expr statements
      */
    private def assignOrExprStmt(): Stmt = {
      val first = tlist()
      if (at(":")) { // annotated assignment
        eat(":"); typeExpr(); eat("=")
        val value = tlistExpr(tlist())
        first match {
          case TList(Seq(TItem(Ref(n), false)), false) => AnnAssign(n, value)
          case _ => err("only simple names can carry annotations")
        }
      } else if (at("=")) {
        val chain = scala.collection.mutable.ArrayBuffer[TList](first)
        while (at("=")) { eat("="); chain += tlist() }
        Assign(chain.init.map(tlistTarget).toSeq, tlistExpr(chain.last))
      } else {
        err("Unsupported statement type: ast.Expr")
      }
    }

    private def tlistExpr(t: TList): Expr = {
      t.items.foreach(i =>
        if (i.starred) err("Unsupported expression type: ast.Starred"))
      if (t.isTuple) TupleExpr(t.items.map(_.e)) else t.items.head.e
    }

    private def tlistTarget(t: TList): Target =
      if (t.isTuple) SeqTarget(t.items.map(itemTarget))
      else itemTarget(t.items.head)

    private def itemTarget(i: TItem): Target =
      if (i.starred) StarTarget(toTarget(i.e)) else toTarget(i.e)

    private def toTarget(e: Expr): Target = e match {
      case Ref(n)        => NameTarget(n)
      case TupleExpr(es) => SeqTarget(es.map(toTarget))
      case ListExpr(es)  => SeqTarget(es.map(toTarget))
      case other => err(s"unsupported assignment target: ${other.getClass.getSimpleName}")
    }

    private def ifStmt(): If = ifLike("if")

    /** `if` and `elif` parse identically apart from the keyword; an
      * elif chain becomes nested Ifs in orelse, like Python's ast.
      */
    private def ifLike(kw: String): If = {
      eatName(kw)
      val test = expr()
      eat(":")
      val body = block()
      val orelse: Seq[Stmt] =
        if (atName("elif")) Seq(ifLike("elif"))
        else if (atName("else")) { next(); eat(":"); block() }
        else Nil
      If(test, body, orelse)
    }

    private def matchStmt(): Match = {
      eatName("match")
      val subject = tlistExpr(tlist())
      eat(":")
      eatNewline()
      if (peek != Tok.Indent) err("expected an indented block")
      next()
      val cases = scala.collection.mutable.ArrayBuffer.empty[MatchCase]
      while (atName("case")) {
        next()
        val pat = casePattern()
        val guard = if (atName("if")) { next(); Some(expr()) } else None
        eat(":")
        cases += MatchCase(pat, guard, block())
      }
      if (peek != Tok.Dedent) err(s"unexpected token in match block: $peek")
      next()
      Match(subject, cases.toSeq)
    }

    // ---------------------------------------------------------------
    // patterns (ref: main.py:189-262 translate_match input space)
    // ---------------------------------------------------------------
    private def casePattern(): Pattern = {
      val first = orPattern()
      if (at(",")) { // bare sequence: `case 1, 2:`
        val elems = scala.collection.mutable.ArrayBuffer[Pattern](first)
        while (at(",")) { eat(","); elems += orPattern() }
        MatchSequence(elems.toSeq)
      } else first
    }

    private def orPattern(): Pattern = {
      val first = closedPattern()
      if (at("|")) {
        val alts = scala.collection.mutable.ArrayBuffer[Pattern](first)
        while (at("|")) { eat("|"); alts += closedPattern() }
        MatchOr(alts.toSeq)
      } else first
    }

    private def closedPattern(): Pattern = peek match {
      case Tok.Op("(") =>
        next()
        val elems = scala.collection.mutable.ArrayBuffer[Pattern](orPattern())
        while (at(",")) { eat(","); elems += orPattern() }
        eat(")")
        if (elems.length == 1) elems.head else MatchSequence(elems.toSeq)
      case Tok.Op("[") => // list patterns → MatchSequence; the compiler
        next()           // rejects them against scalar subjects like the ref
        val elems = scala.collection.mutable.ArrayBuffer.empty[Pattern]
        while (!at("]")) { elems += orPattern(); if (at(",")) eat(",") }
        eat("]")
        MatchSequence(elems.toSeq)
      case Tok.Op("{") =>
        var depth = 0
        var continue = true
        while (continue) next() match {
          case Tok.Op("{") => depth += 1
          case Tok.Op("}") => depth -= 1; continue = depth > 0
          case Tok.Eof     => err("unterminated mapping pattern")
          case _           => ()
        }
        MatchMappingPattern
      case Tok.Op("*") =>
        next()
        MatchStar(Some(name()))
      case Tok.Op("-") =>
        next()
        next() match {
          case Tok.IntLit(v)   => MatchValue(Lit(-v))
          case Tok.FloatLit(v) => MatchValue(Lit(-v))
          case other => err(s"expected a number after '-' in pattern, found $other")
        }
      case Tok.IntLit(v)     => next(); MatchValue(Lit(v))
      case Tok.FloatLit(v)   => next(); MatchValue(Lit(v))
      case Tok.StrLit(s)     => next(); MatchValue(Lit(s))
      case Tok.Name("_")     => next(); MatchAs(None)
      case Tok.Name("True")  => next(); MatchValue(Lit(true))
      case Tok.Name("False") => next(); MatchValue(Lit(false))
      case Tok.Name("None")  => next(); MatchValue(Lit(null))
      case Tok.Name(n)       => next(); MatchAs(Some(n))
      case other             => err(s"unsupported pattern: $other")
    }

    // ---------------------------------------------------------------
    // expressions (Python precedence, subset)
    // ---------------------------------------------------------------

    /** comma-separated possibly-starred exprs: assignment target lists,
      * return values, match subjects
      */
    private def tlist(): TList = {
      def item(): TItem =
        if (at("*")) { eat("*"); TItem(expr(), starred = true) }
        else TItem(expr(), starred = false)
      val first = item()
      if (at(",")) {
        val elems = scala.collection.mutable.ArrayBuffer[TItem](first)
        var continue = true
        while (continue && at(",")) {
          eat(",")
          peek match {
            case Tok.Newline | Tok.Eof | Tok.Op("=") | Tok.Op(":") | Tok.Op(";") =>
              continue = false // trailing comma
            case _ => elems += item()
          }
        }
        TList(elems.toSeq, isTuple = true)
      } else TList(Seq(first), isTuple = false)
    }

    /** conditional expression: `a if c else b` */
    private def expr(): Expr = {
      val body = disjunction()
      if (atName("if")) {
        next()
        val test = disjunction()
        eatName("else")
        val orelse = expr()
        IfExp(test, body, orelse)
      } else body
    }

    private def disjunction(): Expr = {
      val first = conjunction()
      if (atName("or")) {
        val vs = scala.collection.mutable.ArrayBuffer[Expr](first)
        while (atName("or")) { next(); vs += conjunction() }
        BoolOp("or", vs.toSeq) // representable → rejected by the compiler
      } else first
    }

    private def conjunction(): Expr = {
      val first = inversion()
      if (atName("and")) {
        val vs = scala.collection.mutable.ArrayBuffer[Expr](first)
        while (atName("and")) { next(); vs += inversion() }
        BoolOp("and", vs.toSeq)
      } else first
    }

    private def inversion(): Expr =
      if (atName("not")) { next(); UnaryOp(UnaryOperator.Not, inversion()) }
      else comparison()

    private val cmpOps = Map(
      "==" -> CmpOperator.Eq, "!=" -> CmpOperator.NotEq,
      "<" -> CmpOperator.Lt, "<=" -> CmpOperator.LtE,
      ">" -> CmpOperator.Gt, ">=" -> CmpOperator.GtE)

    private def comparison(): Expr = {
      val left = bitOr()
      val ops = scala.collection.mutable.ArrayBuffer.empty[CmpOperator]
      val comparators = scala.collection.mutable.ArrayBuffer.empty[Expr]
      var continue = true
      while (continue) peek match {
        case Tok.Op(o) if cmpOps.contains(o) =>
          next(); ops += cmpOps(o); comparators += bitOr()
        case _ => continue = false
      }
      if (ops.isEmpty) left
      else Compare(left, ops.toSeq, comparators.toSeq) // chained → compiler rejects
    }

    private def binChain(sub: () => Expr, table: Map[String, BinOperator]): Expr = {
      var left = sub()
      var continue = true
      while (continue) peek match {
        case Tok.Op(o) if table.contains(o) =>
          next(); left = BinOp(table(o), left, sub())
        case Tok.Op("<<") => err("Unsupported expression type: ast.LShift")
        case Tok.Op(">>") => err("Unsupported expression type: ast.RShift")
        case _ => continue = false
      }
      left
    }

    private def bitOr(): Expr  = binChain(() => bitXor(), Map("|" -> BinOperator.BitOr))
    private def bitXor(): Expr = binChain(() => bitAnd(), Map("^" -> BinOperator.BitXor))
    private def bitAnd(): Expr = binChain(() => sum(),    Map("&" -> BinOperator.BitAnd))
    private def sum(): Expr = binChain(() => term(),
      Map("+" -> BinOperator.Add, "-" -> BinOperator.Sub))
    private def term(): Expr = binChain(() => factor(),
      Map("*" -> BinOperator.Mult, "/" -> BinOperator.Div,
        "//" -> BinOperator.FloorDiv, "%" -> BinOperator.Mod))

    private def factor(): Expr = peek match {
      case Tok.Op("-") => next(); UnaryOp(UnaryOperator.USub, factor())
      case Tok.Op("+") => next(); factor() // UAdd is identity
      case Tok.Op("~") => next(); UnaryOp(UnaryOperator.Invert, factor())
      case _           => power()
    }

    private def power(): Expr = {
      val base = primary()
      if (at("**")) { eat("**"); BinOp(BinOperator.Pow, base, factor()) }
      else base
    }

    private def primary(): Expr = {
      var e = atom()
      var continue = true
      while (continue) peek match {
        case Tok.Op("(") =>
          val callee = e match {
            case Ref(n) => n
            case other =>
              err(s"only direct calls to named functions are supported, " +
                s"got ${other.getClass.getSimpleName}")
          }
          val spec = functions.getOrElse(callee,
            err(s"Unknown function: $callee (register it in the functions map)"))
          next()
          val args = scala.collection.mutable.ArrayBuffer.empty[Expr]
          val kwargs = scala.collection.mutable.ArrayBuffer.empty[(String, Expr)]
          while (!at(")")) {
            (peek, peek2) match {
              case (Tok.Name(k), Tok.Op("=")) =>
                next(); next(); kwargs += (k -> expr())
              case _ =>
                if (kwargs.nonEmpty) err("positional argument follows keyword argument")
                args += expr()
            }
            if (at(",")) eat(",")
          }
          eat(")")
          e = CallFn(callee, spec.fn, args.toSeq, spec.sql, kwargs.toSeq)
        case Tok.Op(".") =>
          err("Unsupported expression type: ast.Attribute")
        case Tok.Op("[") =>
          err("Unsupported expression type: ast.Subscript")
        case Tok.Op(":=") =>
          err("Unsupported expression type: ast.NamedExpr")
        case _ => continue = false
      }
      e
    }

    private def atom(): Expr = next() match {
      case Tok.IntLit(v)     => Lit(v)
      case Tok.FloatLit(v)   => Lit(v)
      case Tok.StrLit(s)     => Lit(s)
      case Tok.Name("True")  => Lit(true)
      case Tok.Name("False") => Lit(false)
      case Tok.Name("None")  => Lit(null)
      case Tok.Name(n)       => Ref(n)
      case Tok.Op("(") =>
        val first = expr()
        if (at(",")) {
          val elems = scala.collection.mutable.ArrayBuffer[Expr](first)
          while (at(",")) {
            eat(",")
            if (!at(")")) elems += expr()
          }
          eat(")")
          TupleExpr(elems.toSeq)
        } else { eat(")"); first }
      case Tok.Op("[") =>
        val elems = scala.collection.mutable.ArrayBuffer.empty[Expr]
        while (!at("]")) { elems += expr(); if (at(",")) eat(",") }
        eat("]")
        ListExpr(elems.toSeq)
      case Tok.Op("{") =>
        // distinguish the two brace literals the way CPython's ast does:
        // {1: 2} is a Dict, {1, 2} is a Set — both outside the closed
        // world, but the error must name the right node. Empty braces
        // and a leading dict-unpacking `{**a}` (no top-level colon) are
        // Dicts in CPython's grammar.
        var depth = 0
        var isDict = peek == Tok.Op("}") || peek == Tok.Op("**")
        var scanning = true
        while (scanning) peek match {
          case Tok.Op("{") | Tok.Op("(") | Tok.Op("[") => depth += 1; next()
          case Tok.Op("}") | Tok.Op(")") | Tok.Op("]") =>
            if (depth == 0) scanning = false else { depth -= 1; next() }
          case Tok.Op(":") if depth == 0 => isDict = true; scanning = false
          case Tok.Newline | Tok.Eof => scanning = false
          case _ => next()
        }
        err(s"Unsupported expression type: ast.${if (isDict) "Dict" else "Set"}")
      case other => err(s"unexpected token in expression: $other")
    }
  }
}
