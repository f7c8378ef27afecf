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

  /** Numerically invert a deformation field (reference momentum.py:2143
    * generate_inverse_dfield): the forward field maps grid point (i, j)
    * to source coordinate (rdeform(i,j), cdeform(i,j)); the inverse
    * answers "which grid point lands HERE" for every pixel of an
    * outRows×outCols output raster spanning the same coordinate plane.
    *
    * The reference scatters all rows×cols warped points into scipy
    * `griddata` (Delaunay triangulation + linear interpolation, ~4 s for
    * its benchmark). But these points are not an arbitrary cloud — they
    * are the warped image of a REGULAR grid, i.e. a structured quad
    * mesh. Exploiting that structure, each quad cell splits into two
    * triangles rasterized directly onto the output raster with
    * barycentric interpolation of the (i, j) destination values — the
    * SAME piecewise-linear interpolant griddata produces on the same
    * triangles, at O(output pixels) total cost with no triangulation
    * step. Cells touching a NaN corner are skipped and uncovered pixels
    * stay NaN (griddata's outside-the-hull behavior). Single driver
    * pass: a 512×512 field onto 2048×2048 is ~5M pixel operations.
    * (The reference's odd `linspace(start, shape, count)` mesh
    * arithmetic is not reproduced; the spec instead pins the stronger
    * property inverse∘forward ≈ identity.) */
  def generateInverseDfield(forward: Dfield, outRows: Int, outCols: Int): Dfield = {
    val rd = Array.fill(outRows * outCols)(Double.NaN)
    val cd = Array.fill(outRows * outCols)(Double.NaN)
    // output pixel p covers coordinate p * step (same plane as the
    // forward field's source coordinates, [0, rows) × [0, cols))
    val rStep = forward.rows.toDouble / outRows
    val cStep = forward.cols.toDouble / outCols
    val fr = forward.rdeform; val fc = forward.cdeform; val cols = forward.cols

    // rasterize one triangle: vertices (x=sourceRow, y=sourceCol) with
    // destination values (vr = grid row, vc = grid col) per vertex
    def tri(x0: Double, y0: Double, vr0: Double, vc0: Double,
            x1: Double, y1: Double, vr1: Double, vc1: Double,
            x2: Double, y2: Double, vr2: Double, vc2: Double): Unit = {
      if (x0.isNaN || x1.isNaN || x2.isNaN || y0.isNaN || y1.isNaN || y2.isNaN) return
      val det = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
      if (det == 0.0) return // degenerate cell
      val pLo = math.max(0, math.ceil(math.min(x0, math.min(x1, x2)) / rStep).toInt)
      val pHi = math.min(outRows - 1, math.floor(math.max(x0, math.max(x1, x2)) / rStep).toInt)
      val qLo = math.max(0, math.ceil(math.min(y0, math.min(y1, y2)) / cStep).toInt)
      val qHi = math.min(outCols - 1, math.floor(math.max(y0, math.max(y1, y2)) / cStep).toInt)
      var p = pLo
      while (p <= pHi) {
        val x = p * rStep
        var q = qLo
        while (q <= qHi) {
          val y = q * cStep
          // barycentric coordinates; small negative tolerance keeps
          // shared-edge pixels from falling between adjacent triangles
          val l1 = ((x - x0) * (y2 - y0) - (x2 - x0) * (y - y0)) / det
          val l2 = ((x1 - x0) * (y - y0) - (x - x0) * (y1 - y0)) / det
          val l0 = 1.0 - l1 - l2
          if (l0 >= -1e-12 && l1 >= -1e-12 && l2 >= -1e-12) {
            rd(p * outCols + q) = l0 * vr0 + l1 * vr1 + l2 * vr2
            cd(p * outCols + q) = l0 * vc0 + l1 * vc1 + l2 * vc2
          }
          q += 1
        }
        p += 1
      }
    }

    var i = 0
    while (i < forward.rows - 1) {
      var j = 0
      while (j < forward.cols - 1) {
        val a = i * cols + j
        val b = (i + 1) * cols + j
        // quad (i,j)-(i+1,j)-(i+1,j+1)-(i,j+1) as two triangles
        tri(fr(a), fc(a), i, j,
            fr(b), fc(b), i + 1, j,
            fr(b + 1), fc(b + 1), i + 1, j + 1)
        tri(fr(a), fc(a), i, j,
            fr(b + 1), fc(b + 1), i + 1, j + 1,
            fr(a + 1), fc(a + 1), i, j + 1)
        j += 1
      }
      i += 1
    }
    Dfield(rd, cd, outRows, outCols)
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
