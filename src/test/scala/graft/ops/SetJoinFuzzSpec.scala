package graft.ops

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Generative proof-of-losslessness for the prefix-filter joins: on
  * random token universes — including UNIFORM document frequency
  * (every prefix equally hot, the distribution where a broken prefix
  * length silently drops pairs), duplicate sets, and singleton sets —
  * the distributed prefix-filtered joins must emit EXACTLY the
  * all-pairs reference sets. The fixture gate proves recall = 1 on one
  * corpus; this proves the theorem's implementation on many.
  */
class SetJoinFuzzSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  /** random corpora: 18-token universe, 24 docs of 1..8 tokens, with
    * deliberate exact-duplicate sets mixed in
    */
  private def corpora: Seq[Seq[(Long, Set[String])]] = {
    val rng = new scala.util.Random(90210)
    (0 until 5).map { _ =>
      val uni = (0 until 18).map(i => f"t$i%02d")
      val docs = (0 until 24).map { i =>
        val sz = 1 + rng.nextInt(8)
        i.toLong -> (0 until sz).map(_ => uni(rng.nextInt(uni.length))).toSet
      }
      // exact duplicates of doc 0 and doc 1 (Jaccard 1, containment 1)
      docs ++ Seq(100L -> docs(0)._2, 101L -> docs(1)._2)
    }
  }

  test("prefix-filtered set-similarity join equals all-pairs on random corpora") {
    import spark.implicits._
    for ((docs, ci) <- corpora.zipWithIndex) {
      val toks = docs.flatMap { case (id, s) => s.map(id -> _) }
        .toDF("doc_id", "feature")
      val got = Dedup.setjoinFrame(toks).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSeq
      val m = docs.toMap
      val ids = docs.map(_._1)
      val want = (for {
        a <- ids; b <- ids if a < b
        inter = (m(a) & m(b)).size.toLong
        u = m(a).size + m(b).size - inter
        if inter * 2 >= u
      } yield (a, b, inter, u, 1000L * inter / u)).sortBy(t => (t._1, t._2))
      assert(got == want, s"corpus#$ci")
    }
  }

  test("probe-prefix containment join equals all-pairs on random corpora") {
    import spark.implicits._
    for ((docs, ci) <- corpora.zipWithIndex) {
      val toks = docs.flatMap { case (id, s) => s.map(id -> _) }
        .toDF("doc_id", "feature")
      val got = Dedup.containmentFrame(toks).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSeq
      val m = docs.toMap
      val ids = docs.map(_._1)
      val want = (for {
        a <- ids; b <- ids if a != b
        inter = (m(a) & m(b)).size.toLong
        if inter * 4 >= 3L * m(a).size
      } yield (a, b, inter, m(a).size.toLong,
          1000L * inter / m(a).size)).sortBy(t => (t._1, t._2))
      assert(got == want, s"corpus#$ci")
    }
  }
}
