package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The fused one-pass expressions must be BIT-IDENTICAL to the unfused
  * formulations they replace — cosine_floor vs three dot_long calls +
  * the floor/sqrt column arithmetic, l2sq_long vs the q·q − 2·q·c + c·c
  * expansion — on random vectors, on real embedding data, and at the
  * null/zero-norm edges. Any divergence would silently break the
  * DuckDB-oracle hash gate, which replays the UNfused SQL text.
  */
class FusedArrayMathSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def unfusedCos(scale: Double) = {
    val dot = GraftFunctions.dotLong(col("a"), col("b"))
    val na = GraftFunctions.dotLong(col("a"), col("a"))
    val nb = GraftFunctions.dotLong(col("b"), col("b"))
    when(na > 0 && nb > 0,
      floor(lit(scale) * dot.cast("double") /
        sqrt(na.cast("double") * nb.cast("double"))).cast("long"))
  }

  private def unfusedL2 = {
    val qq = GraftFunctions.dotLong(col("a"), col("a"))
    val qc = GraftFunctions.dotLong(col("a"), col("b"))
    val cc = GraftFunctions.dotLong(col("b"), col("b"))
    qq - lit(2L) * qc + cc
  }

  test("cosine_floor == unfused three-dot formulation on random vectors") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(500)((
      Seq.fill(64)(rnd.nextInt(20001).toLong - 10000),
      Seq.fill(64)(rnd.nextInt(20001).toLong - 10000)))
    for (scale <- Seq(1000.0, 1000000.0)) {
      val df = rows.toDF("a", "b")
        .withColumn("fused", GraftFunctions.cosineFloor(col("a"), col("b"), scale))
        .withColumn("unfused", unfusedCos(scale))
      assert(df.filter(not(col("fused") <=> col("unfused"))).count() === 0,
        s"divergence at scale $scale")
    }
  }

  test("cosine_floor nulls exactly where the unfused path filtered") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (array(1L, 2L), array(3L, 4L)),
        |  (array(0L, 0L), array(3L, 4L)),
        |  (array(1L, 2L), array(0L, 0L)),
        |  (CAST(NULL AS array<bigint>), array(3L, 4L)),
        |  (array(1L, CAST(NULL AS bigint)), array(3L, 4L))
        |AS t(a, b)""".stripMargin)
      .withColumn("fused", GraftFunctions.cosineFloor(col("a"), col("b"), 1000.0))
      .withColumn("unfused", unfusedCos(1000.0))
    assert(df.filter(not(col("fused") <=> col("unfused"))).count() === 0)
    assert(df.filter(col("fused").isNull).count() === 4)
  }

  test("l2sq_long == expanded dot formulation exactly (integer arithmetic)") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(500)((
      Seq.fill(64)(rnd.nextInt(20001).toLong - 10000),
      Seq.fill(64)(rnd.nextInt(20001).toLong - 10000)))
    val df = rows.toDF("a", "b")
      .withColumn("fused", GraftFunctions.l2sqLong(col("a"), col("b")))
      .withColumn("unfused", unfusedL2)
    assert(df.filter(not(col("fused") <=> col("unfused"))).count() === 0)
    assert(df.filter(col("fused") < 0).count() === 0)
  }

  test("fused expressions agree with the unfused path on real embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"),
        expr("transform(embedding, v -> CAST(round(CAST(v AS DOUBLE)*10000) AS BIGINT))").as("q"))
    val q0 = e.filter(col("vec_id") === 0).select(col("q").as("b"))
    val df = e.filter(col("vec_id") =!= 0).select(col("q").as("a"))
      .crossJoin(broadcast(q0))
      .withColumn("fc", GraftFunctions.cosineFloor(col("a"), col("b"), 1000000.0))
      .withColumn("uc", unfusedCos(1000000.0))
      .withColumn("fl", GraftFunctions.l2sqLong(col("a"), col("b")))
      .withColumn("ul", unfusedL2)
    assert(df.filter(not(col("fc") <=> col("uc"))).count() === 0)
    assert(df.filter(not(col("fl") <=> col("ul"))).count() === 0)
  }
}
