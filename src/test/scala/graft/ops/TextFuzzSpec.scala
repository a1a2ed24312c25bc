package graft.ops

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Generative differential tests for the string-fingerprint pipelines
  * (winnowing, content-defined chunking) on ADVERSARIAL inputs the
  * documents fixture never produces: empty strings, strings shorter
  * than one 8-gram, and tiny-alphabet strings whose repeated grams
  * force hash TIES — the case the rightmost-min rule exists for.
  * References are the classic in-memory algorithms (same formulas as
  * Round7LateSemanticsSpec pins on fixture data).
  */
class TextFuzzSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def pHash(s: String): Long =
    java.lang.Long.parseLong(md5Hex(s).substring(0, 15), 16)

  private def grams(nm: String): Array[Long] = {
    val g = math.max(nm.length - 7, 1)
    (1 to g).map(i =>
      pHash(nm.substring(i - 1, math.min(i + 7, nm.length)))).toArray
  }

  private def winnowRef(hs: Array[Long], w: Int): Set[Int] = {
    val n = hs.length
    val wins = if (n < w) Seq((0, n - 1)) else (0 to n - w).map(j => (j, j + w - 1))
    wins.map { case (j, e) =>
      var best = j
      for (p <- j + 1 to e) if (hs(p) <= hs(best)) best = p
      best
    }.toSet
  }

  private def cdcRef(nm: String): Seq[String] = {
    val hs = grams(nm)
    val cuts = 1 +: (2 to hs.length).filter(p => hs(p - 1) % 32 == 0)
    val ends = cuts.drop(1) :+ (nm.length + 1)
    cuts.zip(ends).map { case (c, e) => nm.substring(c - 1, e - 1) }
  }

  /** deterministic adversarial corpus: tiny alphabet (gram repeats →
    * hash ties), lengths 0..40, plus hand-picked boundary lengths
    */
  private lazy val corpus: Seq[(Long, String)] = {
    val rng = new scala.util.Random(4177)
    val alpha = "ab "
    val rand = (0 until 150).map { i =>
      val len = rng.nextInt(41)
      (i.toLong, (0 until len).map(_ => alpha(rng.nextInt(alpha.length))).mkString)
    }
    val edges = Seq("", "a", "abcdefg", "abcdefgh", "abcdefghi",
      "aaaaaaaaaaaaaaaaaaaaaaaa", "        ", "ab" * 20)
      .zipWithIndex.map { case (s, i) => ((1000 + i).toLong, s) }
    rand ++ edges
  }

  test("winnowing matches the classic algorithm on adversarial strings") {
    import spark.implicits._
    val df = corpus.toDF("doc_id", "norm")
    val got = TextAnalysis.winnowFrame(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    corpus.foreach { case (id, nm) =>
      val hs = grams(nm)
      val sel = winnowRef(hs, 4)
      val fpSum = sel.toSeq.map(p => hs(p) % 1000000007L)
        .foldLeft(0L)((a, x) => (a + x) % 1000000007L)
      val windows = math.max(hs.length - 3, 1).toLong
      assert(got(id) == ((hs.length.toLong, sel.size.toLong,
        1000L * sel.size / windows, fpSum)),
        s"doc $id norm=${nm.take(20).replace(' ', '_')}(len ${nm.length})")
    }
  }

  test("CDC chunking matches the reference chunk and dup counts on adversarial strings") {
    import spark.implicits._
    val df = corpus.toDF("doc_id", "norm")
    val got = Chunking.cdcFrame(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    val chunkSets = corpus.filter(_._2.nonEmpty)
      .map { case (id, nm) => id -> cdcRef(nm).map(md5Hex).toSet }.toMap
    val docsWith = chunkSets.toSeq.flatMap { case (id, cs) => cs.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.size).toMap
    val truth = corpus.filter(_._2.nonEmpty).map { case (id, nm) =>
      (id, cdcRef(nm).size.toLong,
        chunkSets(id).count(c => docsWith(c) >= 2).toLong)
    }.sorted
    assert(got == truth)
  }
}
