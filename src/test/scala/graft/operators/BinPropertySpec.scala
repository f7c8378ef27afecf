package graft.calibrate

import graft.operators.BinAxis
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Property-style tests (seeded random sampling) for the pure bin / peak /
  * fit math — the same formulas the Column expressions encode. */
class BinPropertySpec extends AnyFunSuite {

  test("uniform bin index: in-range values land in [0, nBins) and respect edges") {
    val rnd = new Random(7)
    for (_ <- 0 until 500) {
      val n = 1 + rnd.nextInt(64)
      val lo = -1000.0 + rnd.nextDouble() * 2000.0
      val w = 0.5 + rnd.nextDouble() * 100.0
      val hi = lo + w
      val v = lo + rnd.nextDouble() * w
      val ax = BinAxis("x", n, lo, hi)
      val idx = math.min(math.floor((v - lo) / ax.step).toLong, n - 1L)
      assert(idx >= 0 && idx < n)
      val start = lo + idx * ax.step
      assert(v >= start - 1e-9 && v <= start + ax.step + 1e-9)
    }
  }

  test("BucketIdx.search equals a linear scan over arbitrary edge sets") {
    val rnd = new Random(11)
    for (_ <- 0 until 500) {
      val edges = (0 until 2 + rnd.nextInt(12))
        .map(_ => -100.0 + rnd.nextDouble() * 200.0).distinct.sorted.toArray
      if (edges.length >= 2) {
        val v = -120.0 + rnd.nextDouble() * 240.0
        val got = org.apache.spark.sql.graft.BucketIdx.search(edges, v)
        val n = edges.length
        val exp: Long =
          if (v < edges(0) || v > edges(n - 1)) -1L
          else if (v == edges(n - 1)) (n - 2).toLong
          else (0 until n - 1).lastIndexWhere(i => v >= edges(i)).toLong
        assert(got == exp, s"edges=${edges.mkString(",")} v=$v")
      }
    }
  }

  test("findPeaks returns only neighbourhood maxima") {
    val rnd = new Random(13)
    for (_ <- 0 until 200) {
      val arr = Array.fill(5 + rnd.nextInt(50))(rnd.nextDouble() * 100.0)
      val centers = Array.tabulate(arr.length)(_.toDouble)
      EnergyCalibration.findPeaks(centers, arr, window = 2).foreach { case (c, h) =>
        val i = c.toInt
        assert(h == arr(i))
        val lo = math.max(0, i - 2); val hi = math.min(arr.length - 1, i + 2)
        assert((lo to hi).forall(j => arr(j) <= arr(i)))
      }
    }
  }

  test("LinAlg.polyfit interpolates any non-degenerate quadratic exactly") {
    val rnd = new Random(17)
    for (_ <- 0 until 200) {
      val (a, b, c) = (rnd.nextDouble() * 10 - 5, rnd.nextDouble() * 10 - 5, rnd.nextDouble() * 10 - 5)
      val xs = Array(-2.0, -1.0, 0.0, 1.0, 2.0)
      val ys = xs.map(x => a * x * x + b * x + c)
      val fit = LinAlg.polyfit(xs, ys, 2)
      assert(math.abs(fit(0) - a) < 1e-8 && math.abs(fit(1) - b) < 1e-8 && math.abs(fit(2) - c) < 1e-8)
    }
  }

  test("TPS warp reproduces random landmark sets exactly") {
    val rnd = new Random(19)
    for (_ <- 0 until 20) {
      val n = 4 + rnd.nextInt(8)
      val px = Array.fill(n)(rnd.nextDouble() * 50)
      val py = Array.fill(n)(rnd.nextDouble() * 50)
      // degenerate (nearly-coincident) landmarks make the system singular
      val ok = (for (i <- 0 until n; j <- i + 1 until n) yield
        math.hypot(px(i) - px(j), py(i) - py(j))).min > 1.0
      if (ok) {
        val v = Array.fill(n)(rnd.nextDouble() * 10)
        val tps = new MomentumCorrection.Tps(px, py, v)
        for (i <- 0 until n)
          assert(math.abs(tps.eval(px(i), py(i)) - v(i)) < 1e-6)
      }
    }
  }
}
