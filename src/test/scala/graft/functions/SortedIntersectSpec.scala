package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins SortedIntersectCount to `size(array_intersect(a,b))` on sorted
  * inputs — the contract the adjacency/token-set substrates guarantee —
  * across random arrays with duplicate runs, empties, null elements,
  * and null arrays, on both the codegen'd projection path and the
  * interpreted eval path.
  */
class SortedIntersectSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def randCases(): Seq[(Option[Seq[Option[Long]]], Option[Seq[Option[Long]]])] = {
    val rng = new scala.util.Random(1142)
    def arr(): Option[Seq[Option[Long]]] = {
      if (rng.nextInt(20) == 0) return None
      val n = rng.nextInt(30)
      val vals = Seq.fill(n)(rng.nextInt(25).toLong)
        // duplicate runs: repeat some values
        .flatMap(v => Seq.fill(1 + rng.nextInt(3))(v))
        .map(v => Option(v))
      val withNulls =
        if (rng.nextInt(4) == 0) Seq.fill(1 + rng.nextInt(2))(Option.empty[Long]) ++ vals
        else vals
      // sort_array order: nulls first, then ascending
      Some(withNulls.sortBy(_.getOrElse(Long.MinValue)))
    }
    (1 to 300).map(_ => (arr(), arr()))
  }

  test("two-pointer count equals size(array_intersect) on sorted inputs (codegen)") {
    val df = randCases().toDF("a", "b")
      .select(
        GraftFunctions.sortedIntersectCount(col("a"), col("b")).as("fast"),
        when(col("a").isNull || col("b").isNull, lit(null))
          .otherwise(size(array_intersect(col("a"), col("b"))).cast("long"))
          .as("ref"))
      .collect()
    df.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getLong(0) === r.getLong(1))
    }
  }

  test("string-array variant equals size(array_intersect) on sorted token sets") {
    val rng = new scala.util.Random(2142)
    val vocab = Vector("a", "ab", "abc", "b", "ba", "c", "zz", "κόσμος", "日本")
    val cases = (1 to 200).map { _ =>
      def arr() = Seq.fill(rng.nextInt(12))(vocab(rng.nextInt(vocab.length)))
        .sorted // JVM String order == UTF8String binary order for these
      (arr(), arr())
    }
    val df = cases.toDF("a", "b")
      .select(
        GraftFunctions.sortedIntersectCount(col("a"), col("b")).as("fast"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
      .collect()
    df.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("interpreted eval agrees with codegen on the edge shapes") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType}
    def lit2(xs: Seq[Any]): Literal =
      Literal.create(ArrayData.toArrayData(xs.toArray),
        ArrayType(LongType, containsNull = true))
    val cases = Seq(
      (Seq.empty[Any], Seq.empty[Any], 0L),
      (Seq[Any](1L, 2L, 3L), Seq.empty[Any], 0L),
      (Seq[Any](1L, 1L, 2L), Seq[Any](1L, 2L, 2L, 5L), 2L),
      (Seq[Any](null, 1L), Seq[Any](null, null, 2L), 1L),
      (Seq[Any](null, 3L), Seq[Any](3L), 1L),
      (Seq[Any](Long.MinValue, Long.MaxValue), Seq[Any](Long.MinValue, Long.MaxValue), 2L))
    cases.foreach { case (a, b, want) =>
      val got = org.apache.spark.sql.graft
        .SortedIntersectCount(lit2(a), lit2(b)).eval(null)
      assert(got === want, s"a=$a b=$b")
    }
  }
}
