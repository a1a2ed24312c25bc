package graft.ops

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** In-memory reference for the per-dimension embedding variance audit
  * on real sf0.001 data.
  */
class SimAuditSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("sim_dim_variance matches the in-memory per-dimension sums") {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(v => math.round(v.toDouble * 10000)))
    val n = vecs.length.toLong
    val expected = (0 until 64).map { d =>
      val xs = vecs.map(_(d))
      val sx = xs.sum
      val sxx = xs.map(x => x * x).sum
      (d.toLong, n, sx, sxx, n * sxx - sx * sx)
    }
    val got = Extensions.queries("sim_dim_variance")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got === expected)
    // variance numerators are non-negative by Cauchy–Schwarz, and a
    // real embedding corpus has no dead dimension
    assert(got.forall(_._5 > 0L))
  }
}
