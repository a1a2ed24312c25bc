package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bounded top-k Aggregator must (a) agree exactly with the
  * sort-and-take definition, (b) be independent of partitioning (its
  * merge is commutative/associative over a total order), and (c) keep
  * duplicate scores deterministic via the id tiebreak.
  */
class TopKSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def expected(rows: Seq[(Long, Long, Long)], k: Int)
      : Map[Long, Seq[(Long, Long)]] =
    rows.groupBy(_._1).map { case (g, xs) =>
      g -> xs.map(t => (t._2, t._3)).sortBy(s => (-s._1, s._2)).take(k)
    }

  private def run(rows: Seq[(Long, Long, Long)], k: Int, parts: Int)
      : Map[Long, Seq[(Long, Long)]] = {
    import spark.implicits._
    val topk = udaf(new TopK.TopKByScore(k))
    rows.toDF("g", "score", "id")
      .repartition(parts)
      .groupBy("g").agg(topk(col("score"), col("id")).as("nn"))
      .select(col("g"), col("nn"))
      .as[(Long, Seq[(Long, Long)])]
      .collect().toMap
  }

  test("agrees with sort-and-take, any partitioning") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 400L).map { i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(40).toLong, i)
    }
    val want = expected(rows, 3)
    for (parts <- Seq(1, 3, 17)) {
      assert(run(rows, 3, parts) == want, s"parts=$parts")
    }
  }

  test("duplicate scores break ties by id ascending") {
    val rows = Seq((0L, 5L, 30L), (0L, 5L, 10L), (0L, 5L, 20L), (0L, 1L, 1L))
    assert(run(rows, 2, 3) == Map(0L -> Seq((5L, 10L), (5L, 20L))))
  }

  test("groups smaller than k return all members") {
    val rows = Seq((0L, 5L, 1L), (1L, 2L, 2L))
    assert(run(rows, 3, 2) ==
      Map(0L -> Seq((5L, 1L)), 1L -> Seq((2L, 2L))))
  }
}
