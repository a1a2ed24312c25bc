package graft.polarify

import graft.SparkTestSession
import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Generative differential test of the compiler core: random programs
  * (assignments, nested if/elif/else with PARTIAL returns, ternaries,
  * comparisons, integer arithmetic) are compiled BOTH ways — to a Spark
  * Column and to oracle SQL — executed over x ∈ [-20, 20], and checked
  * against an independent tree-walking interpreter defined here.
  *
  * The fixed corpus (CorpusSpec) pins the reference's 48 functions; this
  * spec explores the space BETWEEN those fixtures — especially the
  * partial-return continuation logic (`if` without `else` followed by
  * more statements), which is where branch-distribution compilers break.
  */
class ProgramFuzzSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val xs: Seq[Long] = (-20L to 20L)

  // ---------------- independent interpreter ----------------

  private def evalE(e: Expr, env: Map[String, Long]): Any = e match {
    case Lit(v: Int)     => v.toLong
    case Lit(v: Long)    => v
    case Lit(v: Boolean) => v
    case Ref(n)          => env(n)
    case BinOp(op, l, r) =>
      val (a, b) = (evalE(l, env).asInstanceOf[Long], evalE(r, env).asInstanceOf[Long])
      op match {
        case BinOperator.Add  => a + b
        case BinOperator.Sub  => a - b
        case BinOperator.Mult => a * b
        case other            => sys.error(s"fuzz doesn't generate $other")
      }
    case UnaryOp(UnaryOperator.USub, o) => -evalE(o, env).asInstanceOf[Long]
    case UnaryOp(UnaryOperator.Not, o)  => !evalE(o, env).asInstanceOf[Boolean]
    case Compare(l, Seq(op), Seq(r)) =>
      val (a, b) = (evalE(l, env).asInstanceOf[Long], evalE(r, env).asInstanceOf[Long])
      op match {
        case CmpOperator.Eq    => a == b
        case CmpOperator.NotEq => a != b
        case CmpOperator.Lt    => a < b
        case CmpOperator.LtE   => a <= b
        case CmpOperator.Gt    => a > b
        case CmpOperator.GtE   => a >= b
      }
    case IfExp(t, b, o) =>
      if (evalE(t, env).asInstanceOf[Boolean]) evalE(b, env) else evalE(o, env)
    case other => sys.error(s"fuzz doesn't generate $other")
  }

  /** Right(returned) or Left(env after falling through). */
  private def run(stmts: Seq[Stmt], env: Map[String, Long]): Either[Map[String, Long], Long] =
    stmts.foldLeft[Either[Map[String, Long], Long]](Left(env)) {
      case (r @ Right(_), _) => r
      case (Left(e), s) => s match {
        case Assign(Seq(NameTarget(n)), v) =>
          Left(e + (n -> evalE(v, e).asInstanceOf[Long]))
        case If(t, body, orelse) =>
          if (evalE(t, e).asInstanceOf[Boolean]) run(body, e) else run(orelse, e)
        case Return(Some(v)) => Right(evalE(v, e).asInstanceOf[Long])
        case other => sys.error(s"fuzz doesn't generate $other")
      }
    }

  // ---------------- generators ----------------

  private def litGen: Gen[Expr] = Gen.chooseNum(-3, 3).map(i => Lit(i))

  private def refGen(locals: Seq[String]): Gen[Expr] =
    Gen.oneOf("x" +: locals).map(Ref(_))

  private def arithGen(locals: Seq[String], depth: Int): Gen[Expr] =
    if (depth <= 0) Gen.oneOf(litGen, refGen(locals))
    else Gen.frequency(
      3 -> litGen,
      3 -> refGen(locals),
      2 -> (for {
        op <- Gen.oneOf(BinOperator.Add, BinOperator.Sub, BinOperator.Mult)
        l  <- arithGen(locals, depth - 1)
        r  <- arithGen(locals, depth - 1)
      } yield BinOp(op, l, r)),
      1 -> arithGen(locals, depth - 1).map(UnaryOp(UnaryOperator.USub, _)),
      1 -> (for {
        t <- testGen(locals, depth - 1)
        b <- arithGen(locals, depth - 1)
        o <- arithGen(locals, depth - 1)
      } yield IfExp(t, b, o)))

  private def testGen(locals: Seq[String], depth: Int): Gen[Expr] =
    for {
      op <- Gen.oneOf(CmpOperator.Eq, CmpOperator.NotEq, CmpOperator.Lt,
        CmpOperator.LtE, CmpOperator.Gt, CmpOperator.GtE)
      l  <- arithGen(locals, depth)
      r  <- arithGen(locals, depth)
    } yield Compare(l, Seq(op), Seq(r))

  /** A block that ALWAYS returns on every path: optional assigns, an
    * optional if (partial or total), recursively, with a terminal return.
    */
  private def blockGen(locals: Seq[String], depth: Int, nextLocal: Int): Gen[Seq[Stmt]] = {
    val terminal = arithGen(locals, 1).map(e => Seq(Return(e)))
    if (depth <= 0) terminal
    else Gen.frequency(
      2 -> terminal,
      3 -> (for { // assign a new local, continue
        v    <- arithGen(locals, 2)
        rest <- blockGen(locals :+ s"v$nextLocal", depth - 1, nextLocal + 1)
      } yield Assign(s"v$nextLocal", v) +: rest),
      2 -> (for { // total if/else: both branches return
        t <- testGen(locals, 1)
        b <- blockGen(locals, depth - 1, nextLocal)
        o <- blockGen(locals, depth - 1, nextLocal)
      } yield Seq(If(t, b, o))),
      2 -> (for { // PARTIAL if (then-branch returns), fall through to rest
        t    <- testGen(locals, 1)
        b    <- blockGen(locals, depth - 1, nextLocal)
        rest <- blockGen(locals, depth - 1, nextLocal)
      } yield If(t, b) +: rest),
      1 -> (for { // if/else that only reassigns, then continue
        t    <- testGen(locals, 1)
        v    <- arithGen(locals, 2)
        w    <- arithGen(locals, 2)
        rest <- blockGen(locals :+ s"v$nextLocal", depth - 1, nextLocal + 1)
      } yield If(t, Seq(Assign(s"v$nextLocal", v)),
        Seq(Assign(s"v$nextLocal", w))) +: rest))
  }

  private val programGen: Gen[Program] =
    blockGen(Nil, 4, 0).map(Program(_))

  // ---------------- python-source rendering (for the parser path) ----------------

  private def pyExpr(e: Expr): String = e match {
    case Lit(v: Int)  => v.toString
    case Lit(v: Long) => v.toString
    case Ref(n)       => n
    case BinOp(op, l, r) => s"(${pyExpr(l)} ${op.python} ${pyExpr(r)})"
    case UnaryOp(op, o)  => s"(${op.python}(${pyExpr(o)}))"
    case Compare(l, Seq(op), Seq(r)) =>
      s"(${pyExpr(l)} ${op.python} ${pyExpr(r)})"
    case IfExp(t, b, o) =>
      s"(${pyExpr(b)} if ${pyExpr(t)} else ${pyExpr(o)})"
    case other => sys.error(s"fuzz doesn't generate $other")
  }

  private def pyStmts(stmts: Seq[Stmt], ind: String): String =
    stmts.map {
      case Assign(Seq(NameTarget(n)), v) => s"$ind$n = ${pyExpr(v)}"
      case Return(Some(v))               => s"${ind}return ${pyExpr(v)}"
      case If(t, body, Nil) =>
        s"${ind}if ${pyExpr(t)}:\n${pyStmts(body, ind + "    ")}"
      case If(t, body, orelse) =>
        s"${ind}if ${pyExpr(t)}:\n${pyStmts(body, ind + "    ")}\n" +
          s"${ind}else:\n${pyStmts(orelse, ind + "    ")}"
      case other => sys.error(s"fuzz doesn't generate $other")
    }.mkString("\n")

  test("random programs roundtrip through the Python-source front end") {
    import spark.implicits._
    val df = xs.toDF("x").cache()
    var seed = Seed(4242L)
    (1 to 40).foreach { i =>
      val p = programGen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val src = s"def f(x):\n${pyStmts(p.stmts, "    ")}"
      val parsed = Program.fromPython(src)

      val expected = xs.map(x => run(p.stmts, Map("x" -> x)).toOption.get)
      val got = df
        .select(col("x"), parsed.column(Map("x" -> col("x"))).cast("long").as("r"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      xs.zip(expected).foreach { case (x, want) =>
        assert(got(x) == want,
          s"[program $i] parsed source diverged at x=$x: got ${got(x)}, want $want\n$src")
      }
    }
  }

  test("random programs: compiled Column and generated SQL match the interpreter") {
    import spark.implicits._
    val df = xs.toDF("x").cache()

    // fixed-seed scalacheck sampling: deterministic run, no shrinking
    // (shrinking would drop assignments whose references stay live)
    var seed = Seed(20260812L)
    (1 to 60).foreach { i =>
      val p = programGen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next

      val expected = xs.map(x => run(p.stmts, Map("x" -> x)).toOption.get)

      val viaColumn = df
        .select(col("x"), p.column(Map("x" -> col("x"))).cast("long").as("r"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val viaSql = df
        .selectExpr("x", s"CAST((${p.sql(Map("x" -> "x"))}) AS BIGINT) AS r")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

      xs.zip(expected).foreach { case (x, want) =>
        assert(viaColumn(x) == want,
          s"[program $i] Column path diverged at x=$x: got ${viaColumn(x)}, want $want\n${p.explain}")
        assert(viaSql(x) == want,
          s"[program $i] SQL path diverged at x=$x: got ${viaSql(x)}, want $want\n${p.explain}")
      }
    }
  }
}
