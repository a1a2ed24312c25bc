package graft.ops

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Fuzz the frame-parameterized TV core against an all-pairs in-memory
  * reference on random corpora: shared + private vocabularies (the
  * subtraction correction carries the private mass), heavy skew, and
  * fully-disjoint source pairs (definitionally absent from the output).
  */
class DriftFuzzSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("TV distances match the all-pairs in-memory reference") {
    for (seed <- 1 to 10) {
      val rng = new scala.util.Random(seed)
      val nSrc = 2 + rng.nextInt(4)
      val shared = (0 until 6).map(i => s"w$i")
      val rows = (0 until nSrc).flatMap { s =>
        val priv = (0 until rng.nextInt(4)).map(i => s"p${s}_$i")
        val nTok = 1 + rng.nextInt(60)
        (0 until nTok).map { _ =>
          val pool = if (priv.nonEmpty && rng.nextInt(3) == 0) priv else shared
          (s"s$s", pool(rng.nextInt(pool.size)))
        }
      }
      val bySource = rows.groupBy(_._1).map { case (s, ts) =>
        val n = ts.size.toLong
        s -> ts.groupBy(_._2).map { case (t, xs) =>
          t -> xs.size.toLong * 1000000L / n
        }
      }
      val expected = (for {
        sa <- bySource.keys.toSeq; sb <- bySource.keys.toSeq if sa < sb
        pa = bySource(sa); pb = bySource(sb)
        common = pa.keySet & pb.keySet
        if common.nonEmpty // zero-overlap pairs are absent by contract
        l1 = common.toSeq.map(t => math.abs(pa(t) - pb(t))).sum +
          (pa.values.sum - common.toSeq.map(pa).sum) +
          (pb.values.sum - common.toSeq.map(pb).sum)
      } yield (sa, sb, common.size.toLong, l1, l1 / 2))
        .sortBy(t => (t._1, t._2))
      val got = DriftAudit.sourceTvOf(rows.toDF("source", "term"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSeq
      assert(got === expected, s"seed=$seed")
      // TV stays in [0, 10^6] even when most mass is private
      assert(got.forall(t => t._5 >= 0L && t._5 <= 1000000L), s"seed=$seed")
    }
  }
}
