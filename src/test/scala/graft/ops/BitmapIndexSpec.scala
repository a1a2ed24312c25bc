package graft.ops

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The packed-bitmap set algebra checked against plain Scala Set
  * operations on real sf0.001 data — the same independence the DuckDB
  * oracle provides (raw membership joins), but in-process.
  */
class BitmapIndexSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def q(name: String) = Extensions.queries(name)(spark, dir)

  /** type → distinct user set */
  private lazy val members: Map[String, Set[Long]] =
    spark.read.parquet(s"$dir/events.parquet")
      .select("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).toSet }

  test("ax_bitmap_intersect popcounts equal raw set intersections") {
    val types = members.keys.toSeq.sorted
    val expected = (for {
      a <- types; b <- types if a < b
      both = (members(a) intersect members(b)).size.toLong if both > 0
    } yield {
      val (na, nb) = (members(a).size.toLong, members(b).size.toLong)
      (a, b, na, nb, both, both * 1000L / (na + nb - both))
    }).sortBy(t => (t._1, t._2))
    // read by name: the join-key reordering moves type_b/type_a around
    val byName = q("ax_bitmap_intersect").collect().map { r =>
      val i = r.fieldIndex _
      (r.getString(i("type_a")), r.getString(i("type_b")),
        r.getLong(i("n_a")), r.getLong(i("n_b")),
        r.getLong(i("n_both")), r.getLong(i("jaccard_permille")))
    }.toSeq.sortBy(t => (t._1, t._2))
    assert(byName === expected)
  }

  test("ax_bitmap_density matches raw membership statistics") {
    val expected = members.toSeq.map { case (t, us) =>
      val words = us.map(u => Math.floorDiv(u, 64L))
      val (nU, nW) = (us.size.toLong, words.size.toLong)
      val span = words.max - words.min + 1L
      (t, nU, nW, span, nU * 1000L / (nW * 64L), nW * 1000L / span)
    }.sortBy(_._1)
    val got = q("ax_bitmap_density").collect().map { r =>
      val i = r.fieldIndex _
      (r.getString(i("event_type")), r.getLong(i("n_users")),
        r.getLong(i("n_words")), r.getLong(i("span_words")),
        r.getLong(i("fill_permille")), r.getLong(i("occupancy_permille")))
    }.toSeq.sortBy(_._1)
    assert(got === expected)
  }
}
