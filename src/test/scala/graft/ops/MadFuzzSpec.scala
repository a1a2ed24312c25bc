package graft.ops

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Fuzz the frame-parameterized MAD screen against an in-memory
  * reference on seeded random daily series: odd/even lengths, heavy
  * ties (lower-median selection under the (value, day) total order),
  * zero-MAD constant series, and single-day groups.
  */
class MadFuzzSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def lowerMedian(xs: Seq[(Long, String)]): Long = {
    val sorted = xs.sortBy(identity)
    sorted((xs.size + 1) / 2 - 1)._1
  }

  test("MAD screen matches the in-memory reference on random series") {
    for (seed <- 1 to 15) {
      val rng = new scala.util.Random(seed)
      val rows = (0 until (2 + rng.nextInt(4))).flatMap { t =>
        val days = 1 + rng.nextInt(14)
        (0 until days).map { d =>
          // heavy ties: counts drawn from a tiny range, with rare spikes
          val cnt = if (rng.nextInt(10) == 0) 50L + rng.nextInt(100)
            else 1L + rng.nextInt(4)
          (s"t$t", f"2024-01-${d + 1}%02d", cnt)
        }
      }
      val expected = rows.groupBy(_._1).map { case (t, rs) =>
        val med = lowerMedian(rs.map(r => (r._3, r._2)))
        val devs = rs.map(r => (math.abs(r._3 - med), r._2))
        val mad = lowerMedian(devs)
        (t, rs.size.toLong, med, mad,
          devs.count(_._1 > 3 * mad).toLong, devs.map(_._1).max)
      }.toSeq.sortBy(_._1)
      val got = Stats.madScreenOf(rows.toDF("event_type", "day", "cnt"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
      assert(got === expected, s"seed=$seed")
      // a constant series must have mad = 0 and zero anomalies unless
      // a spike exists — implied by the reference equality, but the
      // breakdown property is worth stating: median never moves to the
      // spike when spikes are < half the days
      got.foreach { case (_, nDays, med, _, _, _) =>
        assert(med < 50L || nDays <= 2, "median captured by spikes")
      }
    }
  }
}
