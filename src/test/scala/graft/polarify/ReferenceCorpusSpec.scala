package graft.polarify

import org.scalatest.funsuite.AnyFunSuite

/** The reference's full-corpus front-end sweep: every one of the 48
  * conformance functions, as VERBATIM source text, through
  * `Program.fromPython`, asserted program-equal (explain-equal) to the
  * hand-built DSL twin in [[Corpus]] — the analogue of
  * ref tests/test_parse_body.py:44-66, which applies the decorator to
  * every function in tests/functions.py:264-291 and
  * tests/functions_310.py:291-314.
  *
  * The targeted PyParserSpec tests pin individual constructs; this
  * sweep closes the "untested corner" gap — a divergence anywhere in
  * the 48 literal sources (comments, nesting, parenthesization,
  * pattern spellings) fails here even if no targeted test covers it.
  */
class ReferenceCorpusSpec extends AnyFunSuite {

  // call_expr's callee, resolved the way the decorated function's
  // globals would resolve it (ref tests/functions.py:57-58)
  private val corpusFns = Map(
    "call_target_identity" -> parser.PyParser.PyFn(
      (args, _) => args.head,
      Some((args, _) => args.head)))

  private val twins: Map[String, Program] =
    Corpus.all.map(c => c.name -> c.program).toMap

  test("the corpus fixture covers all 48 reference functions") {
    assert(ReferenceSources.sources.size === 48)
    assert(ReferenceSources.sources.map(_._1).distinct.size === 48)
  }

  for ((name, src) <- ReferenceSources.sources) {
    test(s"verbatim reference source parses program-equal to DSL twin: $name") {
      val twin = twins.getOrElse(name,
        fail(s"no DSL twin named '$name' in Corpus"))
      val parsed = Program.fromPython(src, corpusFns)
      assert(parsed.explain === twin.explain,
        s"\nsource:\n$src")
    }
  }

  test("every corpus source emits runnable renamed _polarified source") {
    // the transform_func_to_new_source analogue over the whole corpus
    // (ref: __init__.py:17-37). All 48 emissions were round-tripped
    // offline under CPython — ast.unparse(ast.parse(emitted)) ==
    // emitted for every one (2026-08-13, round 5); this sweep pins the
    // structural contract so a regression breaks loudly here.
    for ((name, src) <- ReferenceSources.sources) {
      val out = Program.transformSourceToNewSource(src, corpusFns)
      val lines = out.linesIterator.toSeq
      assert(lines.head.startsWith(s"def ${name}_polarified(") &&
        lines.head.endsWith("):"), s"$name header:\n$out")
      assert(lines(1) === "    import polars as pl", s"$name import:\n$out")
      assert(lines(2).startsWith("    return "), s"$name body:\n$out")
      assert(lines.size === 3, s"$name must be a 3-line function:\n$out")
      assert(lines.forall(l => l == l.replaceAll("\\s+$", "")),
        s"$name has trailing whitespace (never unparse-canonical):\n$out")
    }
  }
}
