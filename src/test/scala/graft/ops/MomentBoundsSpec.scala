package graft.ops

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The 2^63 moment-algebra class, probed past the boundary.
  *
  * Round 7's tri-SF sweep caught ax_cuped's n·Σxy crossing 2^63 only
  * because sf0.1 finally exceeded it; the same latent class — products
  * of two data-proportional sums — exists in every moment-combination
  * operator. Round 8 moved all of those combinations to DECIMAL(38,0)
  * unconditionally. This spec is the proof:
  *
  *  1. BOUNDARY fixtures drive the frame-parameterized cores
  *     (giniOf, corrSumsOf, discountElasticityOf) with inputs whose
  *     wide terms exceed 2^63 — int64 would wrap or ANSI-throw — and
  *     pin the results against BigInt in-memory references.
  *  2. AGREEMENT fixtures pin that on small (int64-safe) inputs the
  *     decimal path equals the former int64 arithmetic digit for
  *     digit.
  *  3. BOUND pins: the inner BIGINT sums that stayed int64 (for
  *     map-side-combine cheapness) are asserted < 2^63 at a stated
  *     100-TB-scale profile, in BigInt arithmetic, so the headroom is
  *     executable documentation rather than a comment.
  */
class MomentBoundsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val Two63 = BigInt(1) << 63

  // ---- 1. boundary fixtures ------------------------------------------

  test("giniOf is exact past 2^63: den = n*sum(x) straddles the boundary") {
    val rng = new scala.util.Random(8001)
    val n = 1000
    // x ~ 4e15 so sum(x) ≈ 4e18 (still a legal BIGINT sum) but
    // den = n·Σx ≈ 4e21 and Σi·x ≈ 2e21 both exceed 2^63
    val xs = (0 until n).map(i =>
      (i.toLong, 3500000000000000L + rng.nextLong(1000000000000000L)))
    val sorted = xs.sortBy { case (c, x) => (x, c) }
    val sx = sorted.map(x => BigInt(x._2)).sum
    val six = sorted.zipWithIndex
      .map { case ((_, x), i0) => BigInt(i0 + 1) * BigInt(x) }.sum
    val num = 2 * six - BigInt(n + 1) * sx
    val den = BigInt(n) * sx
    assert(den > Two63 && 2 * six > Two63, "fixture must straddle 2^63")
    assert(sx < Two63, "inner BIGINT sum must stay legal")
    val row = Concentration.giniOf(
      Concentration.rankedOf(xs.toDF("c", "x"))).collect().head
    assert(row.getLong(0) === n.toLong)
    assert(row.getLong(1) === sx.toLong)
    assert(row.getString(2) === num.toString)
    assert(row.getString(3) === den.toString)
    assert(row.getLong(4) === (1000 * num / den).toLong)
  }

  test("corrSumsOf is exact past 2^63: n*syy straddles the boundary") {
    val rng = new scala.util.Random(8002)
    val n = 4000
    // y ~ 1.4e6: syy ≈ 8e15 (legal sum) but n·syy ≈ 3.2e19 > 2^63
    val rows = (0 until n).map { _ =>
      ("G", 1L + rng.nextInt(50).toLong,
        1000000L + rng.nextLong(800000L))
    }
    val nB = BigInt(n)
    val sx = rows.map(r => BigInt(r._2)).sum
    val sy = rows.map(r => BigInt(r._3)).sum
    val sxy = rows.map(r => BigInt(r._2) * BigInt(r._3)).sum
    val sxx = rows.map(r => BigInt(r._2) * BigInt(r._2)).sum
    val syy = rows.map(r => BigInt(r._3) * BigInt(r._3)).sum
    assert(nB * syy > Two63 && sy * sy > Two63, "fixture must straddle 2^63")
    assert(syy < Two63 && sxy < Two63, "inner BIGINT sums must stay legal")
    val row = Stats.corrSumsOf(rows.toDF("l_returnflag", "x", "y"))
      .collect().head
    assert((row.getString(0), row.getLong(1), row.getLong(2),
      row.getLong(3)) === (("G", n.toLong, sx.toLong, sy.toLong)))
    assert(row.getString(4) === (nB * sxy - sx * sy).toString)
    assert(row.getString(5) === (nB * sxx - sx * sx).toString)
    assert(row.getString(6) === (nB * syy - sy * sy).toString)
  }

  test("discountElasticityOf is exact past 2^63: n*sxx straddles it") {
    val rng = new scala.util.Random(8003)
    val n = 3000
    // x ~ 2e6: sxx ≈ 1.2e16 (legal sum), n·sxx ≈ 3.6e19 > 2^63;
    // sx² ≈ 3.6e19 > 2^63 as well — both wide terms cross
    val rows = (0 until n).map { _ =>
      ("B1", 1000000L + rng.nextLong(2000000L),
        1L + rng.nextLong(1000000L))
    }
    val nB = BigInt(n)
    val sx = rows.map(r => BigInt(r._2)).sum
    val sy = rows.map(r => BigInt(r._3)).sum
    val sxy = rows.map(r => BigInt(r._2) * BigInt(r._3)).sum
    val sxx = rows.map(r => BigInt(r._2) * BigInt(r._2)).sum
    val num = nB * sxy - sx * sy
    val den = nB * sxx - sx * sx
    assert(nB * sxx > Two63 && sx * sx > Two63, "fixture must straddle 2^63")
    assert(den > 0)
    val row = Stats.discountElasticityOf(rows.toDF("p_brand", "x", "y"))
      .collect().head
    assert((row.getString(0), row.getLong(1)) === (("B1", n.toLong)))
    assert(row.getString(2) === num.toString)
    assert(row.getString(3) === den.toString)
    assert(row.getLong(4) ===
      math.floor(1000000.0 * num.toDouble / den.toDouble).toLong)
    assert(row.getString(5) ===
      (if (num > 0) "up" else if (num < 0) "down" else "flat"))
  }

  // ---- 2. int64/decimal agreement on small fixtures -------------------

  test("decimal moment combinations equal int64 arithmetic below 2^63") {
    val rng = new scala.util.Random(8004)
    val rows = (0 until 500).map { _ =>
      ("S", 1L + rng.nextInt(50).toLong, 1L + rng.nextInt(1100).toLong)
    }
    val n = rows.size.toLong
    val sx = rows.map(_._2).sum
    val sy = rows.map(_._3).sum
    val sxy = rows.map(r => r._2 * r._3).sum
    val sxx = rows.map(r => r._2 * r._2).sum
    val syy = rows.map(r => r._3 * r._3).sum
    val row = Stats.corrSumsOf(rows.toDF("l_returnflag", "x", "y"))
      .collect().head
    // pure-int64 arithmetic on the same moments must read back exactly
    assert(row.getString(4).toLong === n * sxy - sx * sy)
    assert(row.getString(5).toLong === n * sxx - sx * sx)
    assert(row.getString(6).toLong === n * syy - sy * sy)
  }

  // ---- 3. pinned bounds for the inner BIGINT sums ---------------------

  // The documented 100-TB-scale profile: sf100000 ≈ 100 TB of TPC-H —
  // 6e11 lineitem rows, 1.5e11 orders, 1.5e10 customers, 25 brands.
  private val LineitemRows = BigInt("600000000000")
  private val Orders = BigInt("150000000000")
  private val Customers = BigInt("15000000000")

  test("corr_sums inner sums hold int64 at the 100 TB profile") {
    // x = quantity ≤ 50, y = price in hundred-dollar units ≤ ~1.1e3
    val yMax = BigInt(1100)
    assert(LineitemRows * yMax * yMax < Two63)   // Σy² — the widest
    assert(LineitemRows * 50 * yMax < Two63)     // Σxy
  }

  test("elasticity inner sums hold int64 at the 100 TB profile") {
    // per-brand n ≤ rows/25; x = discount permille ≤ 100, y = qty ≤ 50
    val perBrand = LineitemRows / 25
    assert(perBrand * 100 * 100 < Two63)         // Σx²
    assert(perBrand * 100 * 50 < Two63)          // Σxy
  }

  test("cuped per-term product and group sums hold int64 at the profile") {
    // x,y = per-customer whole-dollar spend; TPC-H ≤ ~10 orders/cust
    // × ~6e5 dollars → ≤ 6e6; the PRODUCT sums Σxy/Σx² accumulate in
    // decimal, but each TERM x·y is still a BIGINT multiply
    val perCust = BigInt(6000000)
    assert(perCust * perCust < Two63)            // one term x·y
    assert(Customers * perCust < Two63)          // group sums sxg/syg
  }

  test("assortativity inner sums hold int64 under the stated degree cap") {
    // strong co-purchase graph: degree bounded by parts-per-order ×
    // multiplicity-≥2 co-occurrence; 3e3 is an order of magnitude over
    // anything observed — the documented precondition of the BIGINT
    // inner sums (the wide combinations are already decimal)
    val dirEdges = BigInt("1000000000") * 2
    val maxDeg = BigInt(3000)
    assert(dirEdges * maxDeg * maxDeg < Two63)   // Σdx·dy
    assert(dirEdges * maxDeg < Two63)            // Σdx
  }

  test("joinSizeEstOf is exact past 2^63: a hot bucket tips the sum") {
    // The profile that motivated the decimal switch: the uniform-bucket
    // sum Σ c1·c2 ≈ n1·n2/B sits within 5× of 2^63 at 100 TB and ONE
    // hot bucket crosses it. Here bucket 0 alone carries c1·c2 =
    // 1.6e19 > 2^63 — both the per-term product and the sum would
    // ANSI-throw in BIGINT.
    val stats = Seq(
      (0L, 4000000000L, 2000000000L, 4000000000L, 4000000000L), // hot
      (1L, 1000000L, 900000L, 2000000L, 1900000L),
      (2L, 37L, 37L, 41L, 40L))
    val o = stats.map(s => (s._1, s._2, s._3)).toDF("b", "c1", "d1")
    val c = stats.map(s => (s._1, s._4, s._5)).toDF("b", "c2", "d2")
    val trueRows = 8000000000L
    val truth = Seq(trueRows).toDF("true_rows")
    val est = stats.map(s => BigInt(s._2) * BigInt(s._4)).sum
    val estNdv = stats
      .map(s => BigInt(s._2) * BigInt(s._4) / (s._3 max s._5)).sum
    assert(est > Two63, "fixture must cross 2^63")
    assert(stats.forall(s =>
      BigInt(s._2) * BigInt(s._4) / (s._3 max s._5) < Two63),
      "per-bucket div results must honor the pinned BIGINT precondition")
    val row = Stats.joinSizeEstOf(o, c, truth).collect().head
    assert(row.getString(0) === est.toString)
    assert(row.getString(1) === estNdv.toString)
    assert(row.getLong(2) === trueRows)
    assert(row.getLong(3) ===
      ((1000 * (est - trueRows)) / trueRows).toLong)
    assert(row.getString(4) === (estNdv - trueRows).toString)
  }

  test("joinSizeEstOf agrees with int64 arithmetic below 2^63") {
    val stats = Seq((0L, 12L, 5L, 30L, 7L), (1L, 8L, 8L, 4L, 4L),
      (2L, 100L, 1L, 3L, 3L))
    val o = stats.map(s => (s._1, s._2, s._3)).toDF("b", "c1", "d1")
    val c = stats.map(s => (s._1, s._4, s._5)).toDF("b", "c2", "d2")
    val truth = Seq(700L).toDF("true_rows")
    val est = stats.map(s => s._2 * s._4).sum
    val estNdv = stats.map(s => s._2 * s._4 / (s._3 max s._5)).sum
    val row = Stats.joinSizeEstOf(o, c, truth).collect().head
    assert(row.getString(0).toLong === est)
    assert(row.getString(1).toLong === estNdv)
    assert(row.getLong(3) === (1000 * (est - 700L)) / 700L)
    // estNdv can undershoot truth — the signed string path
    assert(row.getString(4).toLong === estNdv - 700L)
  }

  test("join-size div precondition holds int64 at the 100 TB profile") {
    // the decimal switch leaves ONE int64 precondition: each bucket's
    // NDV-corrected term c1·c2/max(d1,d2). With d2 = per-bucket
    // customer NDV (= c2, keys unique), the term ≤ c1 ≤ |orders| —
    // bounded by the larger side's bucket count, never the product
    assert(Orders < Two63)
    // and the raw product Σ c1·c2 that now runs decimal WOULD sit
    // inside one hot bucket of 2^63 at the profile — the motivation
    assert(Orders * Customers / 1024 * 5 > Two63)
  }
}
