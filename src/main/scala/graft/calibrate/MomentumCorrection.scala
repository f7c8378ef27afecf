package graft.calibrate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.Bilinear2D

/** Momentum-space distortion correction: estimate a deformation field from
  * landmark pairs (driver-side thin-plate-spline solve over ≤ a few hundred
  * points — reference: src/sed/calibrator/momentum.py:627
  * `spline_warp_estimate`), then apply the inverse field to every event via
  * bilinear interpolation (momentum.py:2105 `apply_dfield`).
  *
  * The apply side is a native codegen expression over a plan-attached grid
  * (see [[org.apache.spark.sql.graft.Bilinear2D]]): map-only, shuffle-free,
  * scales to any event count; the grid itself is small (detector-resolution,
  * e.g. 512×512 doubles) and ships with the task binary once.
  */
object MomentumCorrection {

  /** A dense deformation field pair on a rows×cols grid (row-major):
    * rdeform(i,j) / cdeform(i,j) give the source (row, col) coordinate that
    * lands on grid point (i, j). */
  case class Dfield(rdeform: Array[Double], cdeform: Array[Double], rows: Int, cols: Int)

  /** Thin-plate-spline interpolant through (source → target) landmarks:
    * f(x,y) = a0 + a1·x + a2·y + Σ w_i U(‖(x,y)−p_i‖), U(r) = r² ln r².
    * Standard TPS linear system with exact interpolation (no smoothing). */
  class Tps(px: Array[Double], py: Array[Double], values: Array[Double]) {
    private val n = px.length
    require(n >= 3, "TPS needs >= 3 landmarks")

    private def u(r2: Double): Double = if (r2 <= 1e-300) 0.0 else r2 * math.log(r2)

    private val params: Array[Double] = {
      val m = n + 3
      val a = new Array[Double](m * m)
      val b = new Array[Double](m)
      for (i <- 0 until n) {
        for (j <- 0 until n) {
          val dx = px(i) - px(j); val dy = py(i) - py(j)
          a(i * m + j) = u(dx * dx + dy * dy)
        }
        a(i * m + n) = 1.0; a(i * m + n + 1) = px(i); a(i * m + n + 2) = py(i)
        a((n) * m + i) = 1.0; a((n + 1) * m + i) = px(i); a((n + 2) * m + i) = py(i)
        b(i) = values(i)
      }
      LinAlg.solve(a, b, m)
    }

    def eval(x: Double, y: Double): Double = {
      var s = params(n) + params(n + 1) * x + params(n + 2) * y
      var i = 0
      while (i < n) {
        val dx = x - px(i); val dy = y - py(i)
        s += params(i) * u(dx * dx + dy * dy)
        i += 1
      }
      s
    }
  }

  /** Estimate the inverse deformation field from landmark pairs: for each
    * target (corrected) landmark, the TPS maps target→source; evaluating it
    * on the regular target grid yields the row/column lookup fields that
    * `applyDfield` interpolates per event. */
  def splineWarp(srcRows: Array[Double], srcCols: Array[Double],
                 tgtRows: Array[Double], tgtCols: Array[Double],
                 rows: Int, cols: Int): Dfield = {
    val tpsR = new Tps(tgtRows, tgtCols, srcRows)
    val tpsC = new Tps(tgtRows, tgtCols, srcCols)
    val rd = new Array[Double](rows * cols)
    val cd = new Array[Double](rows * cols)
    var i = 0
    while (i < rows) {
      var j = 0
      while (j < cols) {
        rd(i * cols + j) = tpsR.eval(i.toDouble, j.toDouble)
        cd(i * cols + j) = tpsC.eval(i.toDouble, j.toDouble)
        j += 1
      }
      i += 1
    }
    Dfield(rd, cd, rows, cols)
  }

  /** Apply the inverse deformation field to event coordinates
    * (momentum.py:2105 apply_dfield): new_x/new_y are the bilinear lookups
    * of the two fields at fractional grid index (x, y), scaled by the
    * detector-range step per grid cell. */
  def applyDfield(df: DataFrame, dfield: Dfield,
                  xCol: String, yCol: String,
                  newXCol: String, newYCol: String,
                  detectorRanges: ((Double, Double), (Double, Double))): DataFrame = {
    val rStep = (detectorRanges._1._2 - detectorRanges._1._1) / dfield.rows
    val cStep = (detectorRanges._2._2 - detectorRanges._2._1) / dfield.cols
    df.withColumn(newXCol,
        Bilinear2D(col(xCol), col(yCol), dfield.rdeform, dfield.rows, dfield.cols) * rStep)
      .withColumn(newYCol,
        Bilinear2D(col(xCol), col(yCol), dfield.cdeform, dfield.rows, dfield.cols) * cStep)
  }
}
