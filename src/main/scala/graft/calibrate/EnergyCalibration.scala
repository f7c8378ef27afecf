package graft.calibrate

/** Driver-side energy-calibration fits (small math over collected peak
  * positions; the fitted parameters then enter Column plans as literals).
  *
  * Reference: src/sed/calibrator/energy.py:2278 `poly_energy_calibration`
  * (differential drift-time matrix least squares) and energy.py:2156
  * `fit_energy_calibration` (nonlinear d/(t-t0)² model fit).
  */
object EnergyCalibration {

  /** Result of a calibration fit: polynomial coefficients (highest order
    * first, tof2evpoly layout) + energy offset E0. */
  case class PolyCalibration(coeffs: Array[Double], e0: Double, offset: Double)

  /** Polynomial energy calibration from a bias series: peak positions
    * `pos` (TOF) with bias voltages `vals`; solves the differential system
    * T·a = b with T_ij = pos(0)^p_j − pos(i)^p_j (p = order..1) and
    * b_i = vals(0) − vals(i) via least squares (normal equations), then
    * anchors E0 so the reference feature lands at `refEnergy`.
    * (energy.py:2278.) */
  def polyFit(pos: Array[Double], vals: Array[Double], refEnergy: Double,
              order: Int = 3): PolyCalibration = {
    require(pos.length == vals.length && pos.length >= 2, "need >= 2 EDC landmarks")
    val n = pos.length
    val rows = n - 1
    val tmat = Array.ofDim[Double](rows * order)
    val bvec = new Array[Double](rows)
    for (i <- 1 until n) {
      for ((p, j) <- (order to 1 by -1).zipWithIndex)
        tmat((i - 1) * order + j) = math.pow(pos(0), p) - math.pow(pos(i), p)
      bvec(i - 1) = vals(0) - vals(i)
    }
    // normal equations: (T'T) a = T' b
    val ata = new Array[Double](order * order)
    val atb = new Array[Double](order)
    for (r <- 0 until rows; i <- 0 until order) {
      atb(i) += tmat(r * order + i) * bvec(r)
      for (j <- 0 until order) ata(i * order + j) += tmat(r * order + i) * tmat(r * order + j)
    }
    val a = LinAlg.solve(ata, atb, order)
    // E0 = -(tof2evpoly(a, -refEnergy, pos(0)) + vals(0))   (energy.py:2375)
    val atPos0 = {
      var acc = 0.0
      for ((p, j) <- (order to 1 by -1).zipWithIndex) acc += a(j) * math.pow(pos(0), p)
      acc - refEnergy
    }
    PolyCalibration(a, -(atPos0 + vals(0)), pos.min)
  }

  /** Local-maximum peak detection over a (collected) 1-D histogram trace —
    * the driver-side step of the bias-series workflow (reference:
    * src/sed/calibrator/energy.py:2038 peakdetect1d, processor.py:1263
    * find_bias_peaks). A point is a peak if it is the maximum of its
    * ±`window` neighbourhood and exceeds `minProminence` over the
    * neighbourhood minimum. Returns (center, height) pairs ascending. */
  def findPeaks(centers: Array[Double], counts: Array[Double],
                window: Int = 3, minProminence: Double = 0.0): Array[(Double, Double)] = {
    val n = counts.length
    val out = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    for (i <- 0 until n) {
      val lo = math.max(0, i - window); val hi = math.min(n - 1, i + window)
      val neigh = (lo to hi).map(counts)
      val isMax = counts(i) == neigh.max &&
        (lo until i).forall(j => counts(j) < counts(i)) && // strict left: plateau keeps its leftmost point
        ((i + 1) to hi).forall(j => counts(j) <= counts(i))
      if (isMax && counts(i) - neigh.min >= minProminence)
        out += ((centers(i), counts(i)))
    }
    out.toArray
  }

  /** Bias-series calibration end-to-end on a Spark dataframe: histogram the
    * TOF column per bias step (one distributed pass), collect the tiny
    * per-step traces, find the strongest peak within `searchRange` for each
    * step, and polynomial-fit the peak drift (processor.py:1161
    * load_bias_series + 1263 find_bias_peaks + 1338 calibrate_energy_axis). */
  def calibrateFromBiasSeries(df: org.apache.spark.sql.DataFrame,
                              tofCol: String, biasCol: String,
                              axis: graft.operators.BinAxis,
                              searchRange: (Double, Double),
                              refEnergy: Double, order: Int = 3): PolyCalibration = {
    import org.apache.spark.sql.functions.{col, count, lit}
    val hist = df.filter(axis.inRange(col(tofCol)))
      .groupBy(col(biasCol).as("bias"), axis.idx(col(tofCol)).as("bin"))
      .agg(count(lit(1)).as("cnt"))
      .collect()
    val byBias = hist.groupBy(_.getAs[Any]("bias")).toSeq
      .map { case (b, rows) =>
        val counts = new Array[Double](axis.nBins)
        rows.foreach(r => counts(r.getAs[Long]("bin").toInt) = r.getAs[Long]("cnt").toDouble)
        (b.toString.toDouble, counts)
      }.sortBy(_._1)
    val centers = Array.tabulate(axis.nBins)(i => axis.lo + (i + 0.5) * axis.step)
    val pos = byBias.map { case (_, counts) =>
      val peaks = findPeaks(centers, counts)
        .filter(p => p._1 >= searchRange._1 && p._1 <= searchRange._2)
      require(peaks.nonEmpty, "no peak in search range")
      peaks.maxBy(_._2)._1
    }.toArray
    polyFit(pos, byBias.map(_._1).toArray, refEnergy, order)
  }

  /** Fit parameters of the physical flight-tube model
    * E = d / (t·binwidth·binning − t0)² · sign + E0 (energy.py:2156)
    * by Gauss–Newton with numeric Jacobian. Returns (d, t0, e0). */
  def modelFit(pos: Array[Double], vals: Array[Double], binwidth: Double,
               binning: Int, refEnergy: Double, energyScale: String = "kinetic",
               d0: Double = 1.0, t00: Double = 1e-6, iters: Int = 100): (Double, Double, Double) = {
    val sign = if (energyScale == "kinetic") 1.0 else -1.0
    // same formula/constant as SedFunctions.tof2ev: E = 2.84281e-12·sign·(d/(t·w·b − t0))² + E0
    def model(p: Array[Double], t: Double): Double = {
      val ratio = p(0) / (t * binwidth * binning - p(1))
      2.84281e-12 * sign * ratio * ratio + p(2)
    }
    val p = Array(d0, t00, vals.min)
    val m = pos.length
    for (_ <- 0 until iters) {
      val r = new Array[Double](m)
      val jac = Array.ofDim[Double](m * 3)
      for (i <- 0 until m) {
        r(i) = model(p, pos(i)) - (refEnergy + (vals(i) - vals(0)) * sign)
        for (j <- 0 until 3) {
          val h = math.max(1e-9, math.abs(p(j)) * 1e-6)
          val pj = p.clone(); pj(j) += h
          jac(i * 3 + j) = (model(pj, pos(i)) - model(p, pos(i))) / h
        }
      }
      val jtj = new Array[Double](9); val jtr = new Array[Double](3)
      for (i <- 0 until m; a <- 0 until 3) {
        jtr(a) += jac(i * 3 + a) * r(i)
        for (b <- 0 until 3) jtj(a * 3 + b) += jac(i * 3 + a) * jac(i * 3 + b)
      }
      for (a <- 0 until 3) jtj(a * 3 + a) += 1e-9 // Levenberg damping
      val step = LinAlg.solve(jtj, jtr, 3)
      for (j <- 0 until 3) p(j) -= step(j)
    }
    (p(0), p(1), p(2))
  }
}
