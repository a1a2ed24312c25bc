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

  test("sim_prune_recall matches the in-memory pruned-search reference") {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(v => math.round(v.toDouble * 10000)).toArray)
      .toMap
    val n = vecs.size.toLong
    val sel = (0 until 64).map { d =>
      val xs = vecs.values.map(_(d)).toSeq
      val (sx, sxx) = (xs.sum, xs.map(x => x * x).sum)
      (d, n * sxx - sx * sx)
    }.sortBy { case (d, v) => (-v, d) }.take(32).map(_._1).toSet
    def top10(qid: Long, dims: Int => Boolean): Set[Long] =
      vecs.toSeq.filter(_._1 != qid).map { case (id, v) =>
        val dot = (0 until 64).filter(dims)
          .map(d => v(d) * vecs(qid)(d)).sum
        (id, dot)
      }.sortBy { case (id, dot) => (-dot, id) }.take(10).map(_._1).toSet
    val expected = (0L until 10L).map { qid =>
      val overlap = (top10(qid, _ => true) &
        top10(qid, sel.contains)).size.toLong
      (qid, 10L, overlap, overlap * 1000L / 10L)
    }
    val got = Extensions.queries("sim_prune_recall")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === expected)
    // the fixture's embeddings are near-isotropic, so halving the
    // dimensions costs real recall (~30% here) — the measured number
    // IS the operator's point; only the bounds are invariant
    assert(got.forall(t => t._3 >= 0L && t._3 <= 10L))
    assert(got.exists(_._3 > 0L))
  }

  test("sim_ivf_delta: delta accounting and an in-memory drift replay") {
    val rows = Extensions.queries("sim_ivf_delta")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(rows.map(_._1) === Seq("delta_assign", "retrain"))
    val Seq(da, rt) = rows
    // the delta split is exactly the vec_id % 10 == 7 residue class
    val all = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(v =>
        math.round(v.toDouble * 10000)).toArray))
    val nDelta = all.count(_._1 % 10 == 7).toLong
    assert(da._2 === nDelta && rt._2 === nDelta)
    assert(rt._3 === 0L, "retrain has no residual placement drift")
    assert(da._3 >= 0L && da._3 <= nDelta)
    // recall bookkeeping: hits of a 20-list against a 20-truth
    for (r <- rows) {
      assert(r._5 >= 0L && r._5 <= 20L)
      assert(r._6 === r._5 * 1000L / 20L)
      assert(r._4 >= r._5, "scanned candidates bound the hits")
    }
    // in-memory replay of n_moved: frozen vs retrained argmin-L2 cells
    def bucket(q: Array[Long]): Long =
      (0 until 3).map { p =>
        val dot = q.indices.map(i => q(i) * Hyperplanes.signs(p)(i)).sum
        if (dot >= 0) 1L << p else 0L
      }.sum
    def centroids(vs: Seq[(Long, Array[Long])]): Map[Long, Array[Long]] =
      vs.groupBy(v => bucket(v._2)).map { case (c, g) =>
        c -> Array.tabulate(64)(i =>
          math.floor(g.map(_._2(i).toDouble).sum / g.size).toLong)
      }
    def argmin(q: Array[Long], cents: Map[Long, Array[Long]]): Long =
      cents.toSeq.map { case (c, ct) =>
        val d = q.indices.map(i => (q(i) - ct(i)) * (q(i) - ct(i))).sum
        (d, c)
      }.minBy(identity)._2
    val base = all.filter(_._1 % 10 != 7).toSeq
    val delta = all.filter(_._1 % 10 == 7).toSeq
    val cb = centroids(base)
    val cf = centroids(all.toSeq)
    val moved = delta.count(v => argmin(v._2, cb) != argmin(v._2, cf))
    assert(da._3 === moved.toLong)
  }

  test("sim_bucket_drift cohort shares conserve; TV within ppm bounds") {
    val rows = Extensions.queries("sim_bucket_drift")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    // every vector lands in exactly one (cohort, bucket) cell
    assert(rows.map(_._2).sum + rows.map(_._3).sum === n)
    // ppm shares per cohort sum to 10^6 minus truncation loss
    val (s0, s1) = (rows.map(_._4).sum, rows.map(_._5).sum)
    assert(s0 > 999000L && s0 <= 1000000L && s1 > 999000L && s1 <= 1000000L)
    // l1 is the per-bucket |p0 − p1|; TV = Σ/2 must be a valid ppm
    val tv = rows.map(_._6).sum / 2
    assert(tv >= 0L && tv <= 1000000L)
    rows.foreach { case (_, _, _, p0, p1, l1) =>
      assert(l1 === math.abs(p0 - p1))
    }
  }

  test("jacobiEigen reconstructs a known symmetric matrix") {
    // eigenpairs of [[2,1],[1,2]] are (3, [1,1]/√2) and (1, [1,-1]/√2)
    val (ev2, vec2) = Similarity.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(ev2.sorted.zip(Array(1.0, 3.0)).forall {
      case (a, b) => math.abs(a - b) < 1e-12 })
    // and a random 16×16: V must be orthonormal and V·Λ·Vᵀ must
    // reproduce A to near machine precision
    val rnd = new scala.util.Random(7)
    val half = Array.fill(16, 16)(rnd.nextDouble() - 0.5)
    val a = Array.tabulate(16, 16)((i, j) => half(i)(j) + half(j)(i))
    val (ev, rows) = Similarity.jacobiEigen(a)
    for (i <- 0 until 16; j <- 0 until 16) {
      val dot = (0 until 16).map(d => rows(i)(d) * rows(j)(d)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9,
        s"eigenvector rows not orthonormal at ($i,$j): $dot")
      val recon = (0 until 16).map(k => rows(k)(i) * ev(k) * rows(k)(j)).sum
      assert(math.abs(recon - a(i)(j)) < 1e-8,
        s"V·Λ·Vᵀ != A at ($i,$j): $recon vs ${a(i)(j)}")
    }
    assert(vec2.length == 2)
  }

  test("sim_pca_recall: PCA-32 beats the variance cutoff on this corpus") {
    // deterministic data + deterministic eigen → a stable regression
    // pin, not a hope: measured 500‰ vs 290‰ mean recall at sf0.001
    val rows = Extensions.queries("sim_pca_recall")(spark, dir).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getLong(3) == r.getLong(1) * 100, "recall_pca_pm formula")
      assert(r.getLong(5) == (r.getLong(1) - r.getLong(2)) * 100, "delta")
    }
    val meanPca = rows.map(_.getLong(3)).sum / rows.length
    val meanVar = rows.map(_.getLong(4)).sum / rows.length
    assert(meanPca > meanVar,
      s"anisotropic projection should beat axis dropping: $meanPca vs $meanVar")
  }
}
