package graft

import graft.calibrate.MomentumCorrection

/** Reproduces the reference's inverse-deformation-field benchmark
  * (benchmarks/benchmark_sed.py:90 test_splinewarp; target
  * benchmark_targets.yaml inv_dfield 4.11 s): regenerate the inverse of
  * a 512×512 forward deformation field onto the 2048×2048 detector
  * raster, `repeat(5, number=1)` reporting min + all, matching the
  * reference's timeit protocol. The forward field is a smooth synthetic
  * barrel-ish distortion of the kind spline_warp_estimate produces.
  * Driver-side math on both engines (the reference runs scipy griddata
  * with n_jobs=2): the structured-mesh rasterizer replaces the Delaunay
  * triangulation — same piecewise-linear interpolant, O(output pixels).
  *
  * Usage: sbt "runMain graft.InvDfieldBench [gridRows] [outRows] [runs]"
  */
object InvDfieldBench {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toInt else 512
    val out = if (args.length > 1) args(1).toInt else 2048
    val runs = if (args.length > 2) args(2).toInt else 5
    val cols = rows
    // smooth distortion: mild rotation + radial term, stays invertible
    val cx = rows / 2.0; val cy = cols / 2.0
    val fwd = MomentumCorrection.Dfield(
      Array.tabulate(rows * cols) { k =>
        val i = k / cols; val j = k % cols
        val dx = i - cx; val dy = j - cy
        val r2 = (dx * dx + dy * dy) / (cx * cx)
        i + 0.03 * dy + 6.0 * r2 * dx / rows
      },
      Array.tabulate(rows * cols) { k =>
        val i = k / cols; val j = k % cols
        val dx = i - cx; val dy = j - cy
        val r2 = (dx * dx + dy * dy) / (cx * cx)
        j - 0.03 * dx + 6.0 * r2 * dy / cols
      },
      rows, cols)

    // warmup (JIT) then timed repeats
    MomentumCorrection.generateInverseDfield(fwd, out, out)
    val times = (0 until runs).map { _ =>
      val t0 = System.nanoTime()
      val inv = MomentumCorrection.generateInverseDfield(fwd, out, out)
      val dt = (System.nanoTime() - t0) / 1e9
      require(!inv.rdeform(out / 2 * out + out / 2).isNaN) // keep it honest
      dt
    }
    println(f"""{"metric":"inv_dfield","value":${times.min}%.4f,"unit":"sec","all":[${times.map(t => f"$t%.4f").mkString(",")}],"grid":$rows,"out":$out}""")
  }
}
