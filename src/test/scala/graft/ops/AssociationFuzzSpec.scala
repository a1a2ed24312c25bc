package graft.ops

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Fuzz the frame-parameterized association cores (modularity sums,
  * degree assortativity) against in-memory references on seeded random
  * graphs — the GraphFuzzSpec discipline: real data exercises one
  * topology; random graphs exercise the algebra (isolated labels,
  * zero-intra-edge classes, degree-1 chains, dense cliques).
  */
class AssociationFuzzSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def randomGraph(seed: Int): (Seq[(Long, Long)], Map[Long, String]) = {
    val rng = new scala.util.Random(seed)
    val n = 6 + rng.nextInt(20)
    val density = 0.05 + rng.nextDouble() * 0.45
    val edges = (for {
      a <- 0L until n; b <- (a + 1) until n
      if rng.nextDouble() < density
    } yield (a, b)).toSeq
    val k = 2 + rng.nextInt(4)
    val labels = (0L until n).map(v => v -> s"c${rng.nextInt(k)}").toMap
    (edges, labels)
  }

  test("modularity sums match the in-memory reference on random graphs") {
    for (seed <- 1 to 12) {
      val (edges, labels) = randomGraph(seed)
      if (edges.nonEmpty) {
        val m = edges.size.toLong
        val deg = edges.flatMap { case (a, b) => Seq(a, b) }
          .groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
        val dC = deg.toSeq.groupBy { case (v, _) => labels(v) }
          .map { case (c, vs) => c -> vs.map(_._2).sum }
        val eC = edges.filter { case (a, b) => labels(a) == labels(b) }
          .groupBy { case (a, _) => labels(a) }
          .map { case (c, es) => c -> es.size.toLong }
        val expected = dC.map { case (c, d) =>
          (c, eC.getOrElse(c, 0L), d, m, 4L * m * eC.getOrElse(c, 0L) - d * d)
        }.toSeq.sortBy(_._1)
        val got = Association.modularityOf(
          edges.toDF("a", "b"),
          labels.toSeq.toDF("v", "brand")).collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4))).toSeq
        assert(got === expected, s"seed=$seed")
        // Σ_c q_num = 4m·|intra| − Σ d_c², and Σ d_c = 2m always
        assert(got.map(_._3).sum === 2 * m, s"seed=$seed degree sum")
      }
    }
  }

  test("assortativity sums match the in-memory reference on random graphs") {
    for (seed <- 21 to 32) {
      val (edges, _) = randomGraph(seed)
      if (edges.nonEmpty) {
        val deg = edges.flatMap { case (a, b) => Seq(a, b) }
          .groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
        val dir = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
        val nDir = dir.size.toLong
        val sx = dir.map { case (a, _) => deg(a) }.sum
        val sxy = dir.map { case (a, b) => deg(a) * deg(b) }.sum
        val sxx = dir.map { case (a, _) => deg(a) * deg(a) }.sum
        val row = Association.assortativityOf(edges.toDF("a", "b"))
          .collect().head
        assert((row.getLong(0), row.getLong(1), row.getLong(2),
          row.getLong(3)) === ((nDir, sx, sxy, sxx)), s"seed=$seed")
        // r_num/r_den are DECIMAL(38,0)-rendered strings
        val (rNum, rDen) = (row.getString(4).toLong, row.getString(5).toLong)
        assert(rNum === nDir * sxy - sx * sx, s"seed=$seed")
        assert(rDen === nDir * sxx - sx * sx, s"seed=$seed")
        assert(rDen >= 0 && math.abs(rNum) <= rDen, s"seed=$seed bounds")
      }
    }
  }
}
