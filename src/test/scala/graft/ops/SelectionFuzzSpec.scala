package graft.ops

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Fuzz the cumulative-selection cores: histogram order statistics
  * (lower median / ⌈9n/10⌉ p90) and the distributed prefix-sum ABC
  * classification, against in-memory references on random inputs —
  * rank-boundary and partition-boundary edge cases (n = 1, heavy
  * ties, skewed heads, values spanning multiple range partitions).
  */
class SelectionFuzzSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("histogram percentiles match in-memory order statistics") {
    for (seed <- 1 to 12) {
      val rng = new scala.util.Random(seed)
      val rows = (0 until (1 + rng.nextInt(4))).flatMap { g =>
        val n = 1 + rng.nextInt(40)
        (0 until n).map { _ =>
          // heavy ties + occasional negatives (latency can be negative)
          (s"p$g", (rng.nextInt(12) - 3).toLong)
        }
      }
      val expected = rows.groupBy(_._1).map { case (p, rs) =>
        val sorted = rs.map(_._2).sorted
        val n = sorted.length.toLong
        def atRank(k: Long) = sorted((k - 1).toInt)
        (p, n, sorted.head, atRank((n + 1) / 2), atRank((9 * n + 9) / 10),
          sorted.last)
      }.toSeq.sortBy(_._1)
      val got = TemporalStats.latencyPercentilesOf(
        rows.toDF("prio", "days")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
      assert(got === expected, s"seed=$seed")
    }
  }

  test("two-pass selection matches in-memory ranks on both paths, " +
      "including degenerate skew") {
    val targets = Seq(500L, 900L, 990L)
    for (seed <- 41 to 52) {
      val rng = new scala.util.Random(seed)
      // degenerate distribution: ≥99% of the mass collapses onto one
      // hot value (single coarse bucket), the rest scatters — the
      // pathological-skew shape the recursion guard exists for
      val hot = rng.nextLong(1000000L)
      val nHot = 300 + rng.nextInt(300)
      val nTail = 1 + rng.nextInt(3)
      val vals = Seq.fill(nHot)(hot) ++
        Seq.fill(nTail)(rng.nextLong(1000000L))
      val sorted = vals.sorted
      val n = sorted.length.toLong
      val expected = targets.map { q =>
        val k = (q * n + 999) / 1000
        (q, k, sorted((k - 1).toInt))
      }
      // recurseAbove=10 forces the per-value-histogram recursion on
      // the hot bucket; Long.MaxValue forces the heap path — both must
      // agree with the in-memory rank
      for (recurseAbove <- Seq(10L, Long.MaxValue)) {
        val got = Stats.exactPercentileOf(
          vals.toDF("v"), targets, recurseAbove).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
        assert(got === expected, s"seed=$seed recurseAbove=$recurseAbove")
      }
    }
  }

  test("width recursion keeps every driver histogram ≤ PctBucket rows on a 2^40-spread domain") {
    val targets = Seq(500L, 900L, 990L)
    for (seed <- 131 to 136) {
      val rng = new scala.util.Random(seed)
      val spread = 1L << 40
      // values scattered over ±2^40 — under the old `v div 4096`
      // bucketing the coarse histogram would be up to 2^29 rows; the
      // width recursion must keep every single collect ≤ 4096 rows
      val vals = Seq(-spread, spread) ++
        Seq.fill(300 + rng.nextInt(200))(rng.nextLong() % spread)
      val sorted = vals.sorted
      val n = sorted.length.toLong
      val expected = targets.map { q =>
        val k = (q * n + 999) / 1000
        (q, k, sorted((k - 1).toInt))
      }
      // recurseAbove=1 forces recursion to divisor-1 depth every level;
      // MaxValue stops at the first-level heap — both must agree AND
      // stay constant-bounded on the driver
      for (recurseAbove <- Seq(1L, Long.MaxValue)) {
        val got = Stats.exactPercentileOf(
          vals.toDF("v"), targets, recurseAbove).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
        assert(got === expected, s"seed=$seed recurseAbove=$recurseAbove")
        val maxRows = Stats.histCollectProbe.get
        assert(maxRows <= 4096L,
          s"seed=$seed recurseAbove=$recurseAbove: a driver histogram " +
            s"collected $maxRows rows (> PctBucket)")
      }
    }
  }

  test("full-64-bit span (v - lo would overflow) resolves via the range split") {
    val targets = Seq(500L, 990L)
    val vals = Seq(Long.MinValue, Long.MinValue + 1, -1L, 0L, 1L,
      Long.MaxValue - 1, Long.MaxValue) ++
      (1 to 40).map(i => i * 1000003L - 20 * 1000003L)
    val sorted = vals.sorted
    val n = sorted.length.toLong
    val expected = targets.map { q =>
      val k = (q * n + 999) / 1000
      (q, k, sorted((k - 1).toInt))
    }
    for (recurseAbove <- Seq(1L, Long.MaxValue)) {
      val got = Stats.exactPercentileOf(
        vals.toDF("v"), targets, recurseAbove).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got === expected, s"recurseAbove=$recurseAbove")
      assert(Stats.histCollectProbe.get <= 4096L)
    }
  }

  test("grouped selection bounds per-group histogram width on wide domains") {
    val rng = new scala.util.Random(141)
    val spread = 1L << 40
    val groups = 3
    val rows = (0 until groups).flatMap { g =>
      (0 until (50 + rng.nextInt(100))).map(_ =>
        (s"w$g", rng.nextLong() % spread))
    } ++ Seq(("wide", Long.MinValue), ("wide", -7L), ("wide", 0L),
      ("wide", 5L), ("wide", Long.MaxValue)) // full-span group -> split path
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (t, rs) =>
      val sorted = rs.map(_._2).sorted
      val n = sorted.length.toLong
      Seq(500L, 950L).map { q =>
        val k = (q * n + 999) / 1000
        (t, q, k, sorted((k - 1).toInt))
      }
    }.sortBy(r => (r._1, r._2))
    val got = Stats.groupPercentileOf(rows.toDF("event_type", "v"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === expected)
    // joint grouped histogram: ≤ GrpPctBucket(1024) + 1 rows PER GROUP
    assert(Stats.histCollectProbe.get <= (groups + 1) * 1025L,
      s"grouped histogram collected ${Stats.histCollectProbe.get} rows")
  }

  test("grouped two-pass selection survives degenerate per-group skew") {
    for (seed <- 61 to 66) {
      val rng = new scala.util.Random(seed)
      val rows = (0 until (1 + rng.nextInt(3))).flatMap { g =>
        val hot = rng.nextLong(100000L)
        val nHot = 100 + rng.nextInt(200)
        val nTail = rng.nextInt(4)
        (Seq.fill(nHot)(hot) ++ Seq.fill(nTail)(rng.nextLong(100000L)))
          .map(v => (s"t$g", v))
      }
      val expected = rows.groupBy(_._1).toSeq.flatMap { case (t, rs) =>
        val sorted = rs.map(_._2).sorted
        val n = sorted.length.toLong
        Seq(500L, 950L).map { q =>
          val k = (q * n + 999) / 1000
          (t, q, k, sorted((k - 1).toInt))
        }
      }.sortBy(r => (r._1, r._2))
      val got = Stats.groupPercentileOf(rows.toDF("event_type", "v"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSeq
      assert(got === expected, s"seed=$seed")
    }
  }

  test("distributed prefix-sum ABC matches the in-memory cumulative walk") {
    for (seed <- 21 to 30) {
      val rng = new scala.util.Random(seed)
      val n = 3 + rng.nextInt(60)
      // zipf-ish head so class A is a genuine minority of keys
      val keyed = (0L until n).map(p =>
        (p, 1L + (rng.nextInt(1000).toLong * 1000) / (1 + p * p)))
      val total = keyed.map(_._2).sum
      var cum = 0L
      val classed = keyed.sortBy { case (p, x) => (-x, p) }.map { case (_, x) =>
        cum += x
        val cls = if (cum * 5 <= 4 * total) "A"
          else if (cum * 20 <= 19 * total) "B" else "C"
        (cls, x)
      }
      val expected = classed.groupBy(_._1).map { case (c, xs) =>
        val rev = xs.map(_._2).sum
        (c, xs.size.toLong, rev, rev * 1000000L / total)
      }.toSeq.sortBy(_._1)
      val got = Concentration.abcClassOf(keyed.toDF("p", "x")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSeq
      assert(got === expected, s"seed=$seed")
      // classes tile the keys and the revenue exactly
      assert(got.map(_._2).sum === n, s"seed=$seed")
      assert(got.map(_._3).sum === total, s"seed=$seed")
    }
  }

  test("order-statistic deciles match the in-memory strictly-below rank rule") {
    // ax_decile_lift's core: decile = (10 · |strictly smaller|) div n —
    // heavy ties (few distinct scores), n = 1, and all-equal inputs are
    // the boundary cases the histogram formulation must share with a
    // plain sorted-rank reference
    for (seed <- 71 to 82) {
      val rng = new scala.util.Random(seed)
      val n = 1 + rng.nextInt(60)
      val distinct = 1 + rng.nextInt(6) // heavy ties by construction
      val rows = (0 until n).map(i =>
        (i.toLong, rng.nextInt(distinct).toLong))
      val below = rows.map(_._2).groupBy(identity).view
        .mapValues(_.size.toLong).toMap
      val expected = rows.map { case (id, s) =>
        val b = below.filter(_._1 < s).values.sum
        (id, (10L * b) / n)
      }.sortBy(_._1)
      val got = Cohorts.decileAssign(rows.toDF("id", "score"))
        .select("id", "decile").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      assert(got === expected, s"seed=$seed")
      // deciles are monotone in score: a strictly larger score can
      // never land in a strictly smaller decile
      val byScore = rows.zip(expected).map { case ((_, s), (_, d)) => (s, d) }
      for (Seq((s1, d1), (s2, d2)) <- byScore.sortBy(_._1).sliding(2)
          if s1 < s2)
        assert(d1 <= d2, s"seed=$seed: monotonicity violated")
    }
  }

  test("within-partition run counts match an in-memory sorted-sequence counter") {
    import org.apache.spark.sql.functions.col
    // ax_rle_advisor's core: run starts per payload column under a
    // candidate within-partition order — heavy ties, 1-row partitions,
    // all-equal columns are the boundary cases
    for (seed <- 91 to 100) {
      val rng = new scala.util.Random(seed)
      val rows = (0 until (1 + rng.nextInt(80))).map { i =>
        (rng.nextInt(3).toLong, i.toLong, rng.nextInt(4).toLong,
          s"t${rng.nextInt(3)}", rng.nextInt(5).toLong)
      } // (d, event_id, user_id, event_type, cents)
      def refRuns(key: ((Long, Long, Long, String, Long)) => (String, Long))
          : (Long, Long, Long) = {
        val sortedByPart = rows.groupBy(_._1).values.map(_.sortBy(key))
        def runs(f: ((Long, Long, Long, String, Long)) => Any): Long =
          sortedByPart.map { part =>
            1L + part.sliding(2).count {
              case Seq(a, b) => f(a) != f(b)
              case _         => false
            }
          }.sum
        (runs(_._4), runs(_._3), runs(_._5))
      }
      val ev = rows.toDF("d", "event_id", "user_id", "event_type", "cents")
      def got(name: String, ord: Seq[org.apache.spark.sql.Column]) = {
        val r = EventsOps.runCountsOf(ev, name, ord).head()
        (r.getLong(1), r.getLong(2), r.getLong(3))
      }
      assert(got("arrival", Seq(col("event_id"))) ===
        refRuns(r => ("", r._2)), s"seed=$seed arrival")
      assert(got("type", Seq(col("event_type"), col("event_id"))) ===
        refRuns(r => (r._4, r._2)), s"seed=$seed type")
      assert(got("user", Seq(col("user_id"), col("event_id"))) ===
        refRuns(r => (f"${r._3}%019d", r._2)), s"seed=$seed user")
    }
  }
}
