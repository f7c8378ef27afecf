package graft.calibrate

/** Momentum axis calibration fit — the most-used interactive step of the
  * reference's momentum workflow (reference:
  * src/sed/calibrator/momentum.py:1612 `MomentumCorrector.calibrate`,
  * driven by core/processor.py:877 `calibrate_momentum_axes`).
  *
  * Given the PIXEL positions of two symmetry points (a, b) in a binned
  * momentum-map image plus either the known k-space distance between them
  * (`equiscale`) or the absolute k-coordinates of both points (two-point
  * mode), it derives the pixel→momentum conversion factors and the k-space
  * center. This is a driver-side closed-form fit over two points — no data
  * pass at all — whose output constants feed the distributed per-event
  * `detectorToK` projection (momentum.py:2066
  * detector_coordinates_2_k_coordinates; SedFunctions.detectorToK).
  *
  * Axis-naming note: the reference indexes both points as
  * (row, col) = (x, y) and pairs `point[0]` with `kx`/`xratio` — we mirror
  * that convention exactly so fitted constants agree number-for-number.
  */
object MomentumCalibration {

  /** Fitted calibration constants, in the reference's `calibration` dict
    * layout (momentum.py:1720-1737): per-axis conversion factors, the
    * k-space center in pixel coordinates, the detector-range mapping of
    * the image used for the fit, and the per-pixel momentum axes. */
  case class KCalibration(
      kxScale: Double, kyScale: Double,
      xCenter: Double, yCenter: Double,
      rStart: Double, cStart: Double,
      rStep: Double, cStep: Double,
      kxAxis: Array[Double], kyAxis: Array[Double]) {
    /** imshow-style extent (kx_lo, kx_hi, ky_lo, ky_hi). */
    def extent: (Double, Double, Double, Double) =
      (kxAxis.head, kxAxis.last, kyAxis.head, kyAxis.last)
  }

  /** Equiscale fit: one conversion factor shared by both axes, from the
    * known k-distance between the two symmetry points
    * (momentum.py:1686-1695). `binRanges` are the detector ranges the
    * nRows×nCols image was binned over (bin_ranges in load_data). */
  def calibrate(nRows: Int, nCols: Int,
                pointA: (Double, Double), pointB: (Double, Double),
                kDistance: Double,
                binRanges: ((Double, Double), (Double, Double))): KCalibration = {
    val pixelDistance = math.hypot(pointA._1 - pointB._1, pointA._2 - pointB._2)
    require(pixelDistance > 0, "symmetry points coincide")
    val ratio = kDistance / pixelDistance
    build(nRows, nCols, pointB, ratio, ratio, (0.0, 0.0), binRanges)
  }

  /** Two-point fit: independent per-axis conversion factors from the
    * absolute k-coordinates of both symmetry points
    * (momentum.py:1697-1710). */
  def calibrateTwoPoint(nRows: Int, nCols: Int,
                        pointA: (Double, Double), pointB: (Double, Double),
                        kCoordA: (Double, Double),
                        binRanges: ((Double, Double), (Double, Double)),
                        kCoordB: (Double, Double) = (0.0, 0.0)): KCalibration = {
    require(pointA._1 != pointB._1 && pointA._2 != pointB._2,
      "two-point mode needs points separated along both axes")
    val xRatio = (kCoordA._1 - kCoordB._1) / (pointA._1 - pointB._1)
    val yRatio = (kCoordA._2 - kCoordB._2) / (pointA._2 - pointB._2)
    build(nRows, nCols, pointB, xRatio, yRatio, kCoordB, binRanges)
  }

  private def build(nRows: Int, nCols: Int, pointB: (Double, Double),
                    xRatio: Double, yRatio: Double, kCoordB: (Double, Double),
                    binRanges: ((Double, Double), (Double, Double))): KCalibration = {
    // per-pixel momentum axes: k_i = (i - b) * ratio + k_b (momentum.py:1712)
    val kxAxis = Array.tabulate(nRows)(i => (i - pointB._1) * xRatio + kCoordB._1)
    val kyAxis = Array.tabulate(nCols)(j => (j - pointB._2) * yRatio + kCoordB._2)
    KCalibration(
      kxScale = xRatio, kyScale = yRatio,
      // pixel position where k = 0 (momentum.py:1729-1730)
      xCenter = pointB._1 - kCoordB._1 / xRatio,
      yCenter = pointB._2 - kCoordB._2 / yRatio,
      rStart = binRanges._1._1, cStart = binRanges._2._1,
      rStep = (binRanges._1._2 - binRanges._1._1) / nRows,
      cStep = (binRanges._2._2 - binRanges._2._1) / nCols,
      kxAxis = kxAxis, kyAxis = kyAxis)
  }
}
