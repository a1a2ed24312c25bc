package graft.ops

import graft.SparkTestSession
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Generative differential test of AsOf.joinBackward: random left/right
  * tables against an in-memory reference scan. The fixture-backed gate
  * query (ax_asof_view_purchase) pins one dataset; this explores the
  * boundary semantics the operator claims — INCLUSIVE match at equal
  * timestamps, null payload when no right row precedes, keys present on
  * one side only — across many random datasets. Right (key, ts) pairs
  * are unique by construction, matching the operator's documented
  * determinism contract (the production query dedups views first).
  */
class AsOfFuzzSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private case class Ds(left: Seq[(Long, Long)], right: Seq[(Long, Long, Long)])

  private val genDs: Gen[Ds] = for {
    nl <- Gen.choose(1, 30)
    nr <- Gen.choose(1, 30)
    left <- Gen.listOfN(nl,
      Gen.zip(Gen.choose(0L, 5L), Gen.choose(0L, 40L)))
    rightKeys <- Gen.listOfN(nr,
      Gen.zip(Gen.choose(0L, 5L), Gen.choose(0L, 40L)))
  } yield {
    val uniq = rightKeys.distinct
    Ds(left, uniq.map { case (k, t) => (k, t, k * 1000 + t) })
  }

  private def datasets(count: Int, seed: Long): Seq[Ds] =
    (0 until count).flatMap(i =>
      genDs.apply(Gen.Parameters.default, Seed(seed + i)))

  test("joinBackward equals the in-memory backward scan on random data") {
    import spark.implicits._
    for ((ds, i) <- datasets(8, 5150L).zipWithIndex) {
      val left = ds.left.zipWithIndex
        .map { case ((k, t), id) => (id.toLong, k, t) }
        .toDF("lid", "key", "ts")
      val right = ds.right.toDF("key", "ts", "payload")
      val got = AsOf.joinBackward(left, right, "key", "ts")
        .collect()
        .map(r => (r.getAs[Long]("lid"),
          Option(r.getAs[org.apache.spark.sql.Row]("asof"))
            .map(_.getAs[Long]("payload"))))
        .toMap
      val want = ds.left.zipWithIndex.map { case ((k, t), id) =>
        val candidates = ds.right.filter(r => r._1 == k && r._2 <= t)
        id.toLong -> (if (candidates.isEmpty) None
                      else Some(candidates.maxBy(_._2)._3))
      }.toMap
      assert(got == want, s"dataset#$i |L|=${ds.left.size} |R|=${ds.right.size}")
    }
  }
}
