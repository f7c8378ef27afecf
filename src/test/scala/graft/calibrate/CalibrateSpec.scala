package graft.calibrate

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bilinear2D

class CalibrateSpec extends SparkSpecBase {
  import spark.implicits._

  test("LinAlg.polyfit recovers exact polynomial coefficients") {
    val xs = Array(1.0, 2.0, 3.0, 4.0, 5.0)
    val ys = xs.map(x => 2.0 * x * x - 3.0 * x + 0.5)
    val c = LinAlg.polyfit(xs, ys, 2)
    assert(math.abs(c(0) - 2.0) < 1e-9 && math.abs(c(1) + 3.0) < 1e-9 && math.abs(c(2) - 0.5) < 1e-9)
  }

  test("EnergyCalibration.polyFit recovers a synthetic bias series") {
    // ground truth: E(t) = a1 t + a2 t^2 (order 2); biases shift the peak
    val a = Array(3e-9, -2e-4) // highest order first
    def poly(t: Double): Double = a(0) * t * t + a(1) * t
    val pos = Array(41000.0, 42000.0, 43000.0, 44000.0, 45000.0)
    // vals chosen so vals(0)-vals(i) = poly(pos(0)) - poly(pos(i))
    val vals = pos.map(p => poly(p) - poly(pos(0)))
    val fit = EnergyCalibration.polyFit(pos, vals, refEnergy = 10.0, order = 2)
    assert(math.abs(fit.coeffs(0) - a(0)) < 1e-12)
    assert(math.abs(fit.coeffs(1) - a(1)) < 1e-7)
    // anchor: poly(pos0) - refEnergy + E0 + vals0 = 0
    assert(math.abs(poly(pos(0)) - 10.0 + fit.e0 + vals(0)) < 1e-6)
  }

  test("EnergyCalibration.modelFit recovers flight-tube parameters") {
    val (dTrue, t0True, e0True) = (0.9, 1e-8, -2.0)
    val binwidth = 4.125e-12
    def model(t: Double): Double = {
      val r = dTrue / (t * binwidth - t0True)
      2.84281e-12 * r * r + e0True
    }
    val pos = Array(40000.0, 42000.0, 44000.0, 46000.0, 48000.0)
    val ref = model(pos(0))
    val vals = pos.map(p => model(p) - model(pos(0))) // bias differences
    val (d, t0, e0) = EnergyCalibration.modelFit(pos, vals, binwidth, 1, ref,
      d0 = 0.8, t00 = 0.8e-8)
    assert(math.abs(d - dTrue) < 1e-3, s"d=$d")
    assert(math.abs(t0 - t0True) < 1e-10, s"t0=$t0")
    assert(math.abs(e0 - e0True) < 1e-2, s"e0=$e0")
  }

  test("findPeaks locates local maxima with prominence filtering") {
    val centers = Array.tabulate(11)(_.toDouble)
    val counts = Array(0.0, 1.0, 5.0, 1.0, 0.0, 0.5, 9.0, 0.5, 0.0, 2.0, 0.0)
    val peaks = EnergyCalibration.findPeaks(centers, counts, window = 2)
    assert(peaks.map(_._1).toSeq == Seq(2.0, 6.0, 9.0))
    val strong = EnergyCalibration.findPeaks(centers, counts, window = 2, minProminence = 3.0)
    assert(strong.map(_._1).toSeq == Seq(2.0, 6.0))
  }

  test("calibrateFromBiasSeries recovers peak drift from a synthetic series") {
    // three bias steps, each a sharp synthetic peak at a drifting TOF
    val rows = for {
      (bias, center) <- Seq((0.0, 100.0), (1.0, 120.0), (2.0, 140.0))
      i <- 0 until 500
      v = center + (i % 11) - 5 // dense cluster around the drifting center
    } yield (bias, v)
    val df = rows.toDF("bias", "tof")
    val axis = graft.operators.BinAxis("tof", 100, 0.0, 200.0)
    val cal = EnergyCalibration.calibrateFromBiasSeries(
      df, "tof", "bias", axis, (50.0, 190.0), refEnergy = 5.0, order = 2)
    // fitted poly must reproduce the bias differences at the peak positions
    def ev(t: Double) = cal.coeffs(0) * t * t + cal.coeffs(1) * t
    assert(math.abs((ev(101.0) - ev(121.0)) - (0.0 - 1.0)) < 0.2)
    assert(math.abs((ev(101.0) - ev(141.0)) - (0.0 - 2.0)) < 0.2)
  }

  test("TPS interpolates its landmarks exactly") {
    val px = Array(0.0, 10.0, 0.0, 10.0, 5.0)
    val py = Array(0.0, 0.0, 10.0, 10.0, 5.0)
    val v = Array(1.0, 2.0, 3.0, 4.0, 2.5)
    val tps = new MomentumCorrection.Tps(px, py, v)
    px.indices.foreach(i => assert(math.abs(tps.eval(px(i), py(i)) - v(i)) < 1e-8))
  }

  test("Bilinear2D matches a driver-side bilinear interpolation") {
    val rows = 8; val cols = 8
    val grid = Array.tabulate(rows * cols)(i => (i / cols) * 0.5 + (i % cols) * 1.25)
    def ref(x: Double, y: Double): Double = {
      val x0 = math.max(math.min(x.toInt, rows - 2), 0)
      val y0 = math.max(math.min(y.toInt, cols - 2), 0)
      val fx = x - x0; val fy = y - y0
      grid(x0 * cols + y0) * (1 - fx) * (1 - fy) + grid((x0 + 1) * cols + y0) * fx * (1 - fy) +
        grid(x0 * cols + y0 + 1) * (1 - fx) * fy + grid((x0 + 1) * cols + y0 + 1) * fx * fy
    }
    val pts = Seq((0.0, 0.0), (3.5, 2.25), (6.999, 6.999), (7.0, 7.0))
    val got = pts.toDF("x", "y")
      .select(Bilinear2D($"x", $"y", grid, rows, cols).as("v")).as[Double].collect()
    pts.zip(got).foreach { case ((x, y), g) => assert(math.abs(g - ref(x, y)) < 1e-12) }
  }

  test("applyDfield: identity field reproduces scaled coordinates") {
    val rows = 16; val cols = 16
    val rd = Array.tabulate(rows * cols)(i => (i / cols).toDouble)
    val cd = Array.tabulate(rows * cols)(i => (i % cols).toDouble)
    val dfield = MomentumCorrection.Dfield(rd, cd, rows, cols)
    val df = Seq((2.0, 3.0), (7.5, 8.25)).toDF("x", "y")
    val out = MomentumCorrection.applyDfield(df, dfield, "x", "y", "xc", "yc",
      ((0.0, 16.0), (0.0, 32.0)))
      .select("xc", "yc").as[(Double, Double)].collect()
    // identity lookup * step (1.0 for x-range 16/16, 2.0 for y-range 32/16)
    assert(out.toSeq == Seq((2.0, 6.0), (7.5, 16.5)))
  }

  test("splineWarp near-identity landmarks give near-identity field") {
    val t = for (i <- Seq(0.0, 8.0, 15.0); j <- Seq(0.0, 8.0, 15.0)) yield (i, j)
    val d = MomentumCorrection.splineWarp(
      t.map(_._1).toArray, t.map(_._2).toArray,
      t.map(_._1).toArray, t.map(_._2).toArray, 16, 16)
    for (i <- 0 until 16; j <- 0 until 16) {
      assert(math.abs(d.rdeform(i * 16 + j) - i) < 1e-6)
      assert(math.abs(d.cdeform(i * 16 + j) - j) < 1e-6)
    }
  }
}
