package graft.polarify.parser

/** Tokens for the supported Python subset (see [[PyParser]]). */
sealed trait Tok
object Tok {
  final case class Name(s: String) extends Tok
  final case class IntLit(v: Long) extends Tok
  final case class FloatLit(v: Double) extends Tok
  final case class StrLit(s: String) extends Tok
  /** operator / punctuation, by source text */
  final case class Op(s: String) extends Tok
  case object Newline extends Tok
  case object Indent extends Tok
  case object Dedent extends Tok
  case object Eof extends Tok
}

/** Indentation-aware lexer for the Python subset the reference
  * transpiles (ref: polarify/main.py consumes stdlib `ast`, so its lexer
  * is CPython's; ours re-implements just enough — logical lines,
  * INDENT/DEDENT, implicit joining inside brackets, comments, string and
  * numeric literals).
  */
object Lexer {

  private def err(msg: String): Nothing = throw new IllegalArgumentException(msg)

  // longest first so e.g. `**` wins over `*`
  private val operators = Seq(
    "**", "//", "==", "!=", "<=", ">=", ":=", "->", "<<", ">>",
    "(", ")", "[", "]", "{", "}", ",", ":", "=", "<", ">",
    "+", "-", "*", "/", "%", "&", "|", "^", "~", ".", "@", ";")

  def lex(src: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    val indents = scala.collection.mutable.Stack[Int](0)
    var bracketDepth = 0

    for (rawLine <- src.split("\n", -1)) {
      val line = rawLine.replace("\r", "")
      var i = 0
      // indentation (only significant outside brackets)
      var indent = 0
      while (i < line.length && (line(i) == ' ' || line(i) == '\t')) {
        indent += (if (line(i) == '\t') 8 - (indent % 8) else 1)
        i += 1
      }
      val blank = i >= line.length || line(i) == '#'
      if (!blank && bracketDepth == 0) {
        if (indent > indents.top) { indents.push(indent); out += Tok.Indent }
        else {
          while (indent < indents.top) { indents.pop(); out += Tok.Dedent }
          if (indent != indents.top) err("inconsistent dedent")
        }
      }
      // tokens on the line
      var emitted = false
      while (i < line.length) {
        val c = line(i)
        if (c == ' ' || c == '\t') i += 1
        else if (c == '#') i = line.length
        else if (c == '\'' || c == '"') {
          val quote = c
          val sb = new StringBuilder
          i += 1
          var closed = false
          while (i < line.length && !closed) {
            line(i) match {
              case '\\' if i + 1 < line.length =>
                sb += (line(i + 1) match {
                  case 'n' => '\n'; case 't' => '\t'; case other => other
                })
                i += 2
              case `quote` => closed = true; i += 1
              case other   => sb += other; i += 1
            }
          }
          if (!closed) err("unterminated string literal")
          out += Tok.StrLit(sb.toString); emitted = true
        } else if (c.isDigit || (c == '.' && i + 1 < line.length && line(i + 1).isDigit)) {
          val start = i
          while (i < line.length && (line(i).isDigit || line(i) == '_')) i += 1
          var isFloat = false
          if (i < line.length && line(i) == '.') {
            isFloat = true; i += 1
            while (i < line.length && (line(i).isDigit || line(i) == '_')) i += 1
          }
          if (i < line.length && (line(i) == 'e' || line(i) == 'E')) {
            isFloat = true; i += 1
            if (i < line.length && (line(i) == '+' || line(i) == '-')) i += 1
            while (i < line.length && line(i).isDigit) i += 1
          }
          val text = line.substring(start, i).replace("_", "")
          out += (if (isFloat) Tok.FloatLit(text.toDouble) else Tok.IntLit(text.toLong))
          emitted = true
        } else if (c.isLetter || c == '_') {
          val start = i
          while (i < line.length && (line(i).isLetterOrDigit || line(i) == '_')) i += 1
          out += Tok.Name(line.substring(start, i)); emitted = true
        } else {
          operators.find(op => line.startsWith(op, i)) match {
            case Some(op) =>
              if (op == "(" || op == "[" || op == "{") bracketDepth += 1
              if (op == ")" || op == "]" || op == "}") bracketDepth -= 1
              out += Tok.Op(op); i += op.length; emitted = true
            case None => err(s"unexpected character '$c'")
          }
        }
      }
      if (emitted && bracketDepth == 0) out += Tok.Newline
    }
    while (indents.top > 0) { indents.pop(); out += Tok.Dedent }
    out += Tok.Eof
    out.result()
  }
}
