package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable

/** Generative differential tests of the iterative graph loops: random
  * undirected graphs (Erdős–Rényi-ish, fixed scalacheck seeds so runs
  * are reproducible) are processed by the DISTRIBUTED loops
  * (Graph.peelFixpoint, Graph.bfsLevels) and by independent in-memory
  * reference implementations defined here. The fixture-backed gate
  * queries pin one graph each; this explores the space between —
  * disconnected graphs, isolated edges, graphs whose core is empty,
  * seed sets inside and outside the surviving core.
  */
class GraphFuzzSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private case class G(n: Int, edges: Set[(Long, Long)])

  private val genGraph: Gen[G] = for {
    n <- Gen.choose(6, 28)
    density <- Gen.choose(1, 4)
    pairs = for { a <- 0 until n; b <- a + 1 until n } yield (a.toLong, b.toLong)
    picks <- Gen.sequence[Seq[Boolean], Boolean](
      pairs.map(_ => Gen.frequency(density -> true, 6 -> false)))
  } yield G(n, pairs.zip(picks).collect { case (p, true) => p }.toSet)

  private def graphs(count: Int, seed: Long): Seq[G] =
    (0 until count).flatMap(i =>
      genGraph.apply(Gen.Parameters.default, Seed(seed + i)))

  // ---------------- independent references ----------------

  private def peelRef(edges: Set[(Long, Long)], k: Int): Set[(Long, Long)] = {
    var es = edges
    var changed = true
    while (changed) {
      val deg = mutable.Map.empty[Long, Int].withDefaultValue(0)
      es.foreach { case (a, b) => deg(a) += 1; deg(b) += 1 }
      val keep = deg.collect { case (v, d) if d >= k => v }.toSet
      val next = es.filter { case (a, b) => keep(a) && keep(b) }
      changed = next.size != es.size
      es = next
    }
    es
  }

  private def bfsRef(edges: Set[(Long, Long)], seeds: Set[Long],
      maxHop: Int): Map[Long, Long] = {
    val adj = mutable.Map.empty[Long, mutable.Set[Long]]
    edges.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, mutable.Set.empty) += b
      adj.getOrElseUpdate(b, mutable.Set.empty) += a
    }
    val hop = mutable.Map.empty[Long, Long]
    seeds.foreach(s => hop(s) = 0L)
    var frontier = seeds
    for (h <- 1 to maxHop) {
      val next = frontier.flatMap(v => adj.getOrElse(v, Set.empty))
        .filterNot(hop.contains)
      next.foreach(v => hop(v) = h.toLong)
      frontier = next
    }
    hop.toMap
  }

  // ---------------- differential runs ----------------

  test("distributed k-core peel equals the in-memory peel on random graphs") {
    import spark.implicits._
    for ((g, i) <- graphs(6, 9021L).zipWithIndex; k <- Seq(2, 3)) {
      val df = g.edges.toSeq.sortBy(identity).toDF("a", "b")
      // read by NAME: the left_semi USING-join reorders columns
      val got = Graph.peelFixpoint(df, k)
        .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
      val want = peelRef(g.edges, k)
      assert(got == want,
        s"graph#$i n=${g.n} |E|=${g.edges.size} k=$k")
    }
  }

  private def adjOf(edges: Set[(Long, Long)]): Map[Long, Set[Long]] = {
    val adj = mutable.Map.empty[Long, mutable.Set[Long]]
    edges.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, mutable.Set.empty) += b
      adj.getOrElseUpdate(b, mutable.Set.empty) += a
    }
    adj.view.mapValues(_.toSet).toMap
  }

  test("distributed neighbor-Jaccard equals the in-memory sets on random graphs") {
    import spark.implicits._
    for ((g, i) <- graphs(6, 5513L).zipWithIndex if g.edges.nonEmpty) {
      val df = g.edges.toSeq.sortBy(identity).toDF("a", "b")
      val got = Graph.jaccardAll(df).collect()
        .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) ->
          (r.getAs[Long]("common"), r.getAs[Long]("union_sz"),
            r.getAs[Long]("jaccard_pm"))).toMap
      val adj = adjOf(g.edges)
      g.edges.foreach { case (a, b) =>
        val common = (adj(a) & adj(b)).size.toLong
        val union = (adj(a) | adj(b)).size.toLong
        val want = (common, union, 1000L * common / union)
        assert(got((a, b)) == want, s"graph#$i edge ($a,$b)")
      }
      assert(got.size == g.edges.size, s"graph#$i row count")
    }
  }

  test("distributed common-neighbor candidates equal the in-memory wedges") {
    import spark.implicits._
    for ((g, i) <- graphs(6, 77310L).zipWithIndex if g.edges.nonEmpty) {
      val df = g.edges.toSeq.sortBy(identity).toDF("a", "b")
      val got = Graph.commonNbrsAll(df).collect()
        .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) ->
          r.getAs[Long]("common")).toMap
      val adj = adjOf(g.edges)
      val want = mutable.Map.empty[(Long, Long), Long].withDefaultValue(0L)
      // wedge enumeration through every center (all degrees are far
      // under the 64 cap at these sizes, so the cap never binds)
      adj.foreach { case (_, nbrs) =>
        val ns = nbrs.toSeq.sorted
        for (x <- ns; y <- ns if x < y && !g.edges((x, y)))
          want((x, y)) += 1L
      }
      assert(got == want.toMap, s"graph#$i n=${g.n} |E|=${g.edges.size}")
    }
  }

  test("distributed BFS levels equal the in-memory BFS on random graphs") {
    import spark.implicits._
    for ((g, i) <- graphs(6, 40712L).zipWithIndex) {
      val und = g.edges.toSeq.sortBy(identity).toDF("a", "b")
      val edges = und.unionAll(und.select(col("b").as("a"), col("a").as("b")))
        .select(col("a").as("src"), col("b").as("dst"))
      val seedIds = (0L until g.n.toLong).filter(_ % 5 == 0).toSet
      val seeds = seedIds.toSeq.sorted.toDF("v")
      val got = Graph.bfsLevels(edges, seeds, 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val want = bfsRef(g.edges, seedIds, 3)
      assert(got == want, s"graph#$i n=${g.n} |E|=${g.edges.size}")
    }
  }

  test("distributed min-plus SSSP equals the in-memory rounds on random graphs") {
    import spark.implicits._
    val inf = 1000000000000000L
    for ((g, i) <- graphs(6, 61144L).zipWithIndex if g.edges.nonEmpty) {
      // DIRECTED a→b edges with deterministic weights: exercises
      // dst-only nodes (unreachable forever) and asymmetric reach
      val wEdges = g.edges.toSeq.sortBy(identity)
        .map { case (a, b) => (a, b, (a + b) % 7 + 1) }
      val df = wEdges.toDF("src", "dst", "w")
      val seedIds = (0L until g.n.toLong).filter(_ % 3 == 0).toSet
      val got = Graph.ssspLoop(df, v => pmod(v, lit(3)) === 0, 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      // synchronous min-plus reference, 3 rounds
      val nodes = wEdges.flatMap(e => Seq(e._1, e._2)).distinct
      var d = nodes.map(v => v -> (if (seedIds(v)) 0L else inf)).toMap
      for (_ <- 1 to 3) {
        val relaxed = wEdges.groupBy(_._2).map { case (v, es) =>
          v -> es.map(e => d(e._1) + e._3).min }
        d = d.map { case (v, dv) =>
          v -> math.min(dv, relaxed.getOrElse(v, inf)) }
      }
      assert(got == d, s"graph#$i n=${g.n} |E|=${g.edges.size}")
    }
  }
}
