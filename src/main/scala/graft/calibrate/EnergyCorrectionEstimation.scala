package graft.calibrate

import org.apache.spark.sql.DataFrame

import graft.operators.{BinAxis, Binning}
import CalibrationStore.EnergyCorrectionParams

/** Energy-correction parameter ESTIMATION — the fit core behind the
  * reference's interactive `adjust_energy_correction` step (reference:
  * src/sed/core/processor.py:1028 / calibrator/energy.py:1024; there the
  * user drags sliders until the correction curve overlays the measured
  * Fermi-edge bend — here the same surface parameters are least-squares
  * fitted to the measured bend, no widget needed).
  *
  * Workflow (the distributed part is ONE histogram pass):
  *  1. bin (x, y, tof) into a coarse-x × coarse-y × fine-tof cube
  *     (distributed, output bounded by the bin product — tiny);
  *  2. per (x, y) cell, locate the Fermi-edge TOF as the count-weighted
  *     centroid around the argmax bin (driver-side, like the reference's
  *     per-slice edge visual);
  *  3. Gauss–Newton fit of (amplitude + shape parameters) of the chosen
  *     correction surface to the measured TOF shifts relative to the
  *     center cell — the scalar surface here is the exact twin of the
  *     Column surfaces in SedFunctions (energy.py:1730
  *     correction_function), so fitted parameters plug straight into
  *     `SedProcessor.applyEnergyCorrection` / CalibrationStore.
  */
object EnergyCorrectionEstimation {

  /** Scalar twin of SedFunctions.energyCorrection* (identical formulas &
    * constants — energy.py:1730). */
  def surfaceValue(kind: String, centerX: Double, centerY: Double, amplitude: Double,
                   params: Map[String, Double], x: Double, y: Double): Double = {
    val dx = x - centerX; val dy = y - centerY; val r2 = dx * dx + dy * dy
    kind match {
      case "spherical" =>
        val d = params("diameter")
        (1.0 - math.sqrt(1.0 - r2 / (d * d))) * (-100.0 * amplitude)
      case "lorentzian" =>
        val g = params("gamma")
        100000.0 * amplitude / (g * math.Pi) * (g * g / (r2 + g * g) - 1.0)
      case "gaussian" =>
        val s = params("sigma")
        20000.0 * amplitude / math.sqrt(2.0 * math.Pi * s * s) *
          (math.exp(r2 / (-2.0 * s * s)) - 1.0)
      case "lorentzian_asymmetric" =>
        val g = params("gamma")
        val a2 = params.getOrElse("amplitude2", amplitude)
        val g2 = params.getOrElse("gamma2", g)
        100000.0 * amplitude / (g * math.Pi) * (g * g / (dy * dy + g * g) - 1.0) +
          100000.0 * a2 / (g2 * math.Pi) * (g2 * g2 / (dx * dx + g2 * g2) - 1.0)
      case other => throw new IllegalArgumentException(s"unknown correction type: $other")
    }
  }

  /** Least-squares fit of amplitude + the free shape parameters to observed
    * TOF shifts at sample points (Gauss–Newton, numeric Jacobian, mild
    * Levenberg damping — same machinery as EnergyCalibration.modelFit). The
    * correction surface is 0 at the center by construction, so `shifts`
    * must be measured relative to the center's edge position. */
  def fitParams(xs: Array[Double], ys: Array[Double], shifts: Array[Double],
                kind: String, centerX: Double, centerY: Double,
                init: Map[String, Double], initAmplitude: Double = -0.5,
                iters: Int = 200, fitBaseline: Boolean = false): EnergyCorrectionParams = {
    require(xs.length == ys.length && xs.length == shifts.length && xs.length >= 2)
    val keys = init.keys.toArray.sorted
    // optional trailing parameter: a constant TOF baseline — absorbs the
    // reference cell not sitting exactly on the correction center (its own
    // surface value is not quite 0); discarded after the fit
    val nP = 1 + keys.length + (if (fitBaseline) 1 else 0)
    val p = new Array[Double](nP)
    p(0) = initAmplitude
    for (j <- keys.indices) p(j + 1) = init(keys(j))

    def model(pv: Array[Double], x: Double, y: Double): Double =
      surfaceValue(kind, centerX, centerY, pv(0),
        keys.zipWithIndex.map { case (k, j) => k -> pv(j + 1) }.toMap, x, y) +
        (if (fitBaseline) pv(nP - 1) else 0.0)

    val m = xs.length
    for (_ <- 0 until iters) {
      val r = new Array[Double](m)
      val jac = Array.ofDim[Double](m * nP)
      for (i <- 0 until m) {
        r(i) = model(p, xs(i), ys(i)) - shifts(i)
        for (j <- 0 until nP) {
          val h = math.max(1e-9, math.abs(p(j)) * 1e-6)
          val pj = p.clone(); pj(j) += h
          jac(i * nP + j) = (model(pj, xs(i), ys(i)) - model(p, xs(i), ys(i))) / h
        }
      }
      val jtj = new Array[Double](nP * nP); val jtr = new Array[Double](nP)
      for (i <- 0 until m; a <- 0 until nP) {
        jtr(a) += jac(i * nP + a) * r(i)
        for (b <- 0 until nP) jtj(a * nP + b) += jac(i * nP + a) * jac(i * nP + b)
      }
      for (a <- 0 until nP) jtj(a * nP + a) *= (1.0 + 1e-9) // Levenberg damping
      val step = LinAlg.solve(jtj, jtr, nP)
      for (j <- 0 until nP) p(j) -= step(j)
    }
    EnergyCorrectionParams(kind, centerX, centerY, p(0),
      keys.zipWithIndex.map { case (k, j) => k -> p(j + 1) }.toMap)
  }

  /** End-to-end estimation from an event dataframe: one distributed 3-D
    * histogram, per-(x,y)-cell edge centroid, surface fit. Cells whose
    * total count is below `minCellCount` are skipped (detector borders). */
  def estimateFromData(df: DataFrame, xAxis: BinAxis, yAxis: BinAxis, tofAxis: BinAxis,
                       kind: String, centerX: Double, centerY: Double,
                       init: Map[String, Double], initAmplitude: Double = -0.5,
                       centroidHalfWidth: Int = 3, minCellCount: Long = 16): EnergyCorrectionParams = {
    val cube = Binning.histogram(df, Seq(xAxis, yAxis, tofAxis)).collect()
    // (xBin, yBin) -> dense tof trace
    val cells = cube.groupBy(r => (r.getLong(0), r.getLong(1))).map { case (k, rows) =>
      val trace = new Array[Long](tofAxis.nBins)
      rows.foreach(r => trace(r.getLong(2).toInt) = r.getLong(3))
      k -> trace
    }
    def edgePos(trace: Array[Long]): Option[Double] = {
      val total = trace.sum
      if (total < minCellCount) return None
      val peak = trace.indices.maxBy(trace)
      val lo = math.max(0, peak - centroidHalfWidth)
      val hi = math.min(tofAxis.nBins - 1, peak + centroidHalfWidth)
      var w = 0.0; var ws = 0.0
      for (i <- lo to hi) { w += trace(i); ws += trace(i) * (tofAxis.lo + (i + 0.5) * tofAxis.step) }
      Some(ws / w)
    }
    val samples = cells.flatMap { case ((xb, yb), trace) =>
      edgePos(trace).map { pos =>
        (xAxis.lo + (xb + 0.5) * xAxis.step, yAxis.lo + (yb + 0.5) * yAxis.step, pos)
      }
    }.toArray
    require(samples.length >= 2, "not enough populated (x, y) cells for the fit")
    // shift relative to the cell nearest the correction center (surface = 0 there)
    val (cx, cy, centerPos) = samples.minBy { case (x, y, _) =>
      val dx = x - centerX; val dy = y - centerY; dx * dx + dy * dy
    }
    require(math.hypot(cx - centerX, cy - centerY) <= math.max(xAxis.step, yAxis.step) * 2,
      "no populated cell near the correction center")
    fitParams(samples.map(_._1), samples.map(_._2), samples.map(_._3 - centerPos),
      kind, centerX, centerY, init, initAmplitude, fitBaseline = true)
  }
}
