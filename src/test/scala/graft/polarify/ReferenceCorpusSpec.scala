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
}
