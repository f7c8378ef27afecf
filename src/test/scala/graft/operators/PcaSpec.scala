package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpecBase {
  import spark.implicits._

  private def dotD(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("fit produces orthonormal axes, decreasing eigenvalues, small eigen residuals") {
    val m = Pca.fit(embeddings, "embedding", dim = 64, k = 2)
    val Array(v1, v2) = m.components
    assert(math.abs(math.sqrt(dotD(v1, v1)) - 1.0) < 1e-9)
    assert(math.abs(math.sqrt(dotD(v2, v2)) - 1.0) < 1e-9)
    assert(math.abs(dotD(v1, v2)) < 1e-4, "axes must be orthogonal")
    assert(m.eigenvalues(0) >= m.eigenvalues(1) && m.eigenvalues(1) >= 0)

    // recompute the covariance locally (the fixture is test-sized) and
    // check C v = lambda v within power-iteration tolerance
    val rows = embeddings.select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = rows.length
    val mean = (0 until 64).map(i => rows.map(_(i)).sum / n).toArray
    val cov = Array.tabulate(64, 64) { (i, j) =>
      rows.map(r => r(i) * r(j)).sum / n - mean(i) * mean(j)
    }
    // fit means match the local recompute
    mean.zip(m.mean).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    for ((v, lambda) <- m.components.zip(m.eigenvalues)) {
      val cv = cov.map(row => dotD(row, v))
      val resid = math.sqrt(cv.zip(v).map { case (a, b) => val d = a - lambda * b; d * d }.sum)
      assert(resid < 1e-3 * math.max(lambda, 1e-12), s"eigen residual $resid at lambda $lambda")
    }
    // the top axis captures at least as much variance as any coordinate axis
    val maxDiag = (0 until 64).map(i => cov(i)(i)).max
    assert(m.eigenvalues(0) >= maxDiag - 1e-9)
  }

  test("single-pass moment fit matches the explode-based moment pass") {
    // The round-7 accumulator (one pass, no explode) against the original
    // posexplode/groupBy computation: same moments up to double reduction
    // order, so means/eigenvalues/axes agree far below any physical
    // tolerance. Axes are compared up to sign (eigenvectors are
    // sign-ambiguous; both solvers start deterministically, but keep the
    // check robust).
    val a = Pca.fit(embeddings, "embedding", dim = 64, k = 2)
    val b = Pca.fitViaExplode(embeddings, "embedding", dim = 64, k = 2)
    a.mean.zip(b.mean).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9) }
    a.eigenvalues.zip(b.eigenvalues).foreach { case (x, y) =>
      assert(math.abs(x - y) < 1e-6 * math.max(math.abs(y), 1e-12)) }
    a.components.zip(b.components).foreach { case (va, vb) =>
      val sign = if (dotD(va, vb) < 0) -1.0 else 1.0
      va.zip(vb).foreach { case (x, y) => assert(math.abs(x - sign * y) < 1e-6) }
    }
  }

  test("fit recovers a planted dominant direction") {
    // synthetic corpus: strong variance along a fixed direction + small
    // per-coordinate noise, all deterministic
    val dim = 16
    val dir = Array.tabulate(dim)(i => if (i % 2 == 0) 1.0 else -0.5)
    val dn = math.sqrt(dotD(dir, dir))
    val unit = dir.map(_ / dn)
    val data = (0 until 400).map { r =>
      val t = (r % 81) - 40.0 // spread -40..40 along the planted axis
      Array.tabulate(dim) { i =>
        (t * unit(i) + 0.01 * (((r * 31 + i * 17) % 13) - 6)).toFloat
      }.toSeq
    }
    val df = data.toDF("embedding")
    val m = Pca.fit(df, "embedding", dim, k = 1)
    val align = math.abs(dotD(m.components(0), unit))
    assert(align > 0.999, s"component misaligned: |cos| = $align")
  }

  test("project centers the corpus and orders variance p1 >= p2") {
    val m = Pca.fit(embeddings, "embedding", dim = 64, k = 2)
    val out = Pca.project(embeddings, Seq(col("vec_id")), "embedding", m)
    val stats = out.agg(avg("p1"), avg("p2"), var_samp("p1"), var_samp("p2"))
      .as[(Double, Double, Double, Double)].head()
    // centering: projection means vanish up to the components' float
    // quantization (the same floats feed the data dot and the offset)
    assert(math.abs(stats._1) < 1e-4 && math.abs(stats._2) < 1e-4)
    assert(stats._3 >= stats._4,
      s"variance along p1 (${stats._3}) must dominate p2 (${stats._4})")
    // captured variance matches the eigenvalue up to sampling/quantization
    // (eigenvalue is the population variance along the axis; var_samp
    // needs the (n-1)/n correction)
    val n = embeddings.count().toDouble
    assert(math.abs(stats._3 * ((n - 1) / n) - m.eigenvalues(0)) < 0.05 * m.eigenvalues(0))
  }
}
