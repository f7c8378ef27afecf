package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pure Column algebra for sed's per-event coordinate transforms.
  *
  * Every function here is a scalar arithmetic expression over columns —
  * no UDFs, no shuffles — so the whole calibration chain stays inside one
  * WholeStageCodegen stage and is evaluated at parquet-scan speed. Each
  * function has a twin `...Sql` emitter producing the structurally
  * identical ANSI-SQL text for the DuckDB oracle, generated from the SAME
  * parameter values, so Spark and the oracle compute bit-identical IEEE
  * doubles (we avoid transcendentals wherever the physics allows; where
  * they appear, operand order is mirrored exactly).
  */
object SedFunctions {

  /** Render a double so SQL parses back the identical IEEE-754 value.
    * Always exponent notation: DuckDB types a plain `0.1` literal as exact
    * DECIMAL (so `0.1 * bigint_col` would be exact decimal math, diverging
    * from Spark's double), while `0.1E0` is typed DOUBLE. */
  def d2s(x: Double): String = {
    // fail at the call site: a NaN/Infinity constant (e.g. a zero-width
    // adc range or gamma=0) would otherwise surface as unparseable oracle
    // SQL far from the root cause
    require(!x.isNaN && !x.isInfinite, s"non-finite constant in plan: $x")
    val s = java.lang.Double.toString(x)
    if (s.contains("E")) s else s + "E0"
  }

  // ---------------------------------------------------------------------
  // Energy axis (reference: src/sed/calibrator/energy.py:2381 tof2ev,
  // 2420 tof2evpoly, 2447 tof2ns)
  // ---------------------------------------------------------------------

  /** TOF (bin number) → kinetic/binding energy in eV: E = m_e/2 * (d/(t*w*b - t0))^2 + E0. */
  def tof2ev(t: Column, tofDistance: Double, timeOffset: Double, binwidth: Double,
             binning: Int, energyScale: String, energyOffset: Double): Column = {
    val sign = if (energyScale == "kinetic") 1.0 else -1.0
    val wb = binwidth * binning
    val ratio = lit(tofDistance) / (t * lit(wb) - lit(timeOffset))
    lit(2.84281e-12 * sign) * ratio * ratio + lit(energyOffset)
  }

  def tof2evSql(t: String, tofDistance: Double, timeOffset: Double, binwidth: Double,
                binning: Int, energyScale: String, energyOffset: Double): String = {
    val sign = if (energyScale == "kinetic") 1.0 else -1.0
    val wb = binwidth * binning
    val ratio = s"(${d2s(tofDistance)} / ($t * ${d2s(wb)} - ${d2s(timeOffset)}))"
    s"((${d2s(2.84281e-12 * sign)} * $ratio) * $ratio + ${d2s(energyOffset)})"
  }

  /** Polynomial TOF→eV: E = sum_i a_i t^(i+1) + E0 (a given highest-order-first,
    * evaluated lowest order first as in the reference). */
  def tof2evpoly(t: Column, polyA: Seq[Double], energyOffset: Double): Column = {
    val asc = polyA.reverse // lowest order first, order 1..n
    var acc: Column = lit(0.0)
    var tp: Column = t
    for (a <- asc) { acc = acc + lit(a) * tp; tp = tp * t }
    acc + lit(energyOffset)
  }

  def tof2evpolySql(t: String, polyA: Seq[Double], energyOffset: Double): String = {
    val asc = polyA.reverse
    var acc = "0.0"
    var tp = t
    for (a <- asc) { acc = s"($acc + ${d2s(a)} * $tp)"; tp = s"($tp * $t)" }
    s"($acc + ${d2s(energyOffset)})"
  }

  /** TOF steps → nanoseconds (energy.py:2447). */
  def tof2ns(t: Column, binwidth: Double, binning: Int): Column =
    t * lit(1e9 * binwidth * binning)

  def tof2nsSql(t: String, binwidth: Double, binning: Int): String =
    s"($t * ${d2s(1e9 * binwidth * binning)})"

  // ---------------------------------------------------------------------
  // Energy correction surfaces (energy.py:1730 correction_function)
  // ---------------------------------------------------------------------

  /** Spherical (field-free drift) TOF correction. */
  def energyCorrectionSpherical(x: Column, y: Column, centerX: Double, centerY: Double,
                                amplitude: Double, diameter: Double): Column = {
    val dx = x - lit(centerX); val dy = y - lit(centerY)
    (lit(1.0) - sqrt(lit(1.0) - (dx * dx + dy * dy) / lit(diameter * diameter))) *
      lit(-100.0 * amplitude)
  }

  def energyCorrectionSphericalSql(x: String, y: String, centerX: Double, centerY: Double,
                                   amplitude: Double, diameter: Double): String = {
    val dx = s"($x - ${d2s(centerX)})"; val dy = s"($y - ${d2s(centerY)})"
    s"((1.0 - SQRT(1.0 - ($dx * $dx + $dy * $dy) / ${d2s(diameter * diameter)})) * ${d2s(-100.0 * amplitude)})"
  }

  /** 2D Lorentzian TOF correction. */
  def energyCorrectionLorentzian(x: Column, y: Column, centerX: Double, centerY: Double,
                                 amplitude: Double, gamma: Double): Column = {
    val dx = x - lit(centerX); val dy = y - lit(centerY)
    lit(100000.0 * amplitude / (gamma * math.Pi)) *
      (lit(gamma * gamma) / (dx * dx + dy * dy + lit(gamma * gamma)) - lit(1.0))
  }

  def energyCorrectionLorentzianSql(x: String, y: String, centerX: Double, centerY: Double,
                                    amplitude: Double, gamma: Double): String = {
    val dx = s"($x - ${d2s(centerX)})"; val dy = s"($y - ${d2s(centerY)})"
    s"(${d2s(100000.0 * amplitude / (gamma * math.Pi))} * (${d2s(gamma * gamma)} / ($dx * $dx + $dy * $dy + ${d2s(gamma * gamma)}) - 1.0))"
  }

  /** 2D Gaussian TOF correction. EXP is the one transcendental we cannot
    * avoid; Spark (JVM Math.exp) and DuckDB (libm) agree on these inputs —
    * validated empirically by the oracle self-check. */
  def energyCorrectionGaussian(x: Column, y: Column, centerX: Double, centerY: Double,
                               amplitude: Double, sigma: Double): Column = {
    val dx = x - lit(centerX); val dy = y - lit(centerY)
    lit(20000.0 * amplitude / math.sqrt(2.0 * math.Pi * sigma * sigma)) *
      (exp((dx * dx + dy * dy) / lit(-2.0 * sigma * sigma)) - lit(1.0))
  }

  def energyCorrectionGaussianSql(x: String, y: String, centerX: Double, centerY: Double,
                                  amplitude: Double, sigma: Double): String = {
    val dx = s"($x - ${d2s(centerX)})"; val dy = s"($y - ${d2s(centerY)})"
    s"(${d2s(20000.0 * amplitude / math.sqrt(2.0 * math.Pi * sigma * sigma))} * (EXP(($dx * $dx + $dy * $dy) / ${d2s(-2.0 * sigma * sigma)}) - 1.0))"
  }

  /** Asymmetric 2D Lorentzian correction (independent X/Y profiles). */
  def energyCorrectionLorentzianAsym(x: Column, y: Column, centerX: Double, centerY: Double,
                                     amplitude: Double, gamma: Double,
                                     amplitude2: Double, gamma2: Double): Column = {
    val dx = x - lit(centerX); val dy = y - lit(centerY)
    val cy = lit(100000.0 * amplitude / (gamma * math.Pi)) *
      (lit(gamma * gamma) / (dy * dy + lit(gamma * gamma)) - lit(1.0))
    val cx = lit(100000.0 * amplitude2 / (gamma2 * math.Pi)) *
      (lit(gamma2 * gamma2) / (dx * dx + lit(gamma2 * gamma2)) - lit(1.0))
    cy + cx
  }

  def energyCorrectionLorentzianAsymSql(x: String, y: String, centerX: Double, centerY: Double,
                                        amplitude: Double, gamma: Double,
                                        amplitude2: Double, gamma2: Double): String = {
    val dx = s"($x - ${d2s(centerX)})"; val dy = s"($y - ${d2s(centerY)})"
    val cy = s"(${d2s(100000.0 * amplitude / (gamma * math.Pi))} * (${d2s(gamma * gamma)} / ($dy * $dy + ${d2s(gamma * gamma)}) - 1.0))"
    val cx = s"(${d2s(100000.0 * amplitude2 / (gamma2 * math.Pi))} * (${d2s(gamma2 * gamma2)} / ($dx * $dx + ${d2s(gamma2 * gamma2)}) - 1.0))"
    s"($cy + $cx)"
  }

  // ---------------------------------------------------------------------
  // Momentum axis (momentum.py:2066 detector_coordinates_2_k_coordinates)
  // ---------------------------------------------------------------------

  /** Detector pixel coordinate → momentum coordinate (one axis). */
  def detectorToK(det: Column, start: Double, center: Double,
                  conversion: Double, step: Double): Column = {
    val det0 = start + step * center
    lit(conversion) * ((det - lit(det0)) / lit(step))
  }

  def detectorToKSql(det: String, start: Double, center: Double,
                     conversion: Double, step: Double): String = {
    val det0 = start + step * center
    s"(${d2s(conversion)} * (($det - ${d2s(det0)}) / ${d2s(step)}))"
  }

  // ---------------------------------------------------------------------
  // Delay axis (delay.py:82 append_delay_axis, 434 mm_to_ps)
  // ---------------------------------------------------------------------

  /** Delay stage mm → relative delay ps (double pass). */
  def mmToPs(mm: Double, time0mm: Double): Double = (mm - time0mm) / 0.15

  /** Linear ADC → delay (ps) calibration. */
  def adcToDelay(adc: Column, adcRange: (Double, Double),
                 delayRange: (Double, Double)): Column =
    lit(delayRange._1) + (adc - lit(adcRange._1)) *
      lit((delayRange._2 - delayRange._1) / (adcRange._2 - adcRange._1))

  def adcToDelaySql(adc: String, adcRange: (Double, Double),
                    delayRange: (Double, Double)): String =
    s"(${d2s(delayRange._1)} + ($adc - ${d2s(adcRange._1)}) * ${d2s((delayRange._2 - delayRange._1) / (adcRange._2 - adcRange._1))})"

  // ---------------------------------------------------------------------
  // Deterministic jitter (core/dfops.py:17 apply_jitter)
  // ---------------------------------------------------------------------
  // The reference uses np.random; for a reproducible, oracle-checkable (and
  // restart-safe, partition-order-independent) stream we derive the noise
  // from the event's own id with integer hashing — the standard
  // counter-based-RNG design for distributed engines.

  private val MOD = 1000003L // prime
  /** One LCG-style draw in [0, 1): u = ((id mod M)·a + b mod M) / M.
    * `id` is reduced mod M BEFORE the multiply so the intermediate stays
    * < M·a < 2^63 for ANY id (DuckDB errors on int64 overflow; Java would
    * silently wrap — both avoided). Per-draw multiplier variation
    * decorrelates successive draws: an additive-only variation would make
    * Irwin–Hall sums perfectly correlated. Non-negative ids assumed. */
  private def draw(id: Column, a: Long, b: Long): Column =
    (((id % lit(MOD)) * lit(a) + lit(b)) % lit(MOD)).cast("double") / lit(MOD.toDouble)

  private def drawSql(id: String, a: Long, b: Long): String =
    s"(CAST((($id % $MOD) * $a + $b) % $MOD AS DOUBLE) / ${d2s(MOD.toDouble)})"

  private def drawA(k: Long): Long = {
    val a = (2654435761L % MOD + k * 97911L) % MOD
    if (a == 0) 1L else a
  }
  private def drawB(streamKey: Long, k: Long): Long = (streamKey * 12 + k) * 40503L % MOD

  /** Deterministic uniform in [-1, 1) keyed by an integer id column. */
  def unitNoise(id: Column, streamKey: Long): Column =
    draw(id, drawA(0), drawB(streamKey, 0)) * lit(2.0) - lit(1.0)

  def unitNoiseSql(id: String, streamKey: Long): String =
    s"(${drawSql(id, drawA(0), drawB(streamKey, 0))} * 2.0 - 1.0)"

  /** Uniform jitter: col + amp * U[-1,1). */
  def jitterUniform(col: Column, id: Column, amp: Double, streamKey: Long = 1L): Column =
    col + lit(amp) * unitNoise(id, streamKey)

  def jitterUniformSql(col: String, id: String, amp: Double, streamKey: Long = 1L): String =
    s"($col + ${d2s(amp)} * ${unitNoiseSql(id, streamKey)})"

  /** Normal-ish jitter via Irwin–Hall (sum of 12 uniforms − 6): mean 0,
    * stdev 1, all-arithmetic (cross-engine bit-exact, unlike Box–Muller). */
  def jitterNormal(col: Column, id: Column, amp: Double, streamKey: Long = 1L): Column = {
    var s: Column = lit(0.0)
    for (k <- 1 to 12)
      s = s + draw(id, drawA(k), drawB(streamKey, k))
    col + lit(amp) * (s - lit(6.0))
  }

  def jitterNormalSql(col: String, id: String, amp: Double, streamKey: Long = 1L): String = {
    var s = "0.0"
    for (k <- 1 to 12)
      s = s"($s + ${drawSql(id, drawA(k), drawB(streamKey, k))})"
    s"($col + ${d2s(amp)} * ($s - 6.0))"
  }

  // ---------------------------------------------------------------------
  // Sector alignment (energy.py:1489 align_dld_sectors)
  // ---------------------------------------------------------------------

  /** tof - sector_delays[sector]; delay table enters the plan as a literal
    * CASE chain (tiny, codegen'd — the Dask reference broadcasts an array). */
  def sectorAlign(tof: Column, sectorId: Column, sectorDelays: Seq[Double]): Column = {
    val delay = sectorDelays.zipWithIndex.tail.foldLeft(when(sectorId === 0, lit(sectorDelays.head))) {
      case (acc, (d, i)) => acc.when(sectorId === i, lit(d))
    }.otherwise(lit(0.0))
    tof - delay
  }

  def sectorAlignSql(tof: String, sectorId: String, sectorDelays: Seq[Double]): String = {
    val cases = sectorDelays.zipWithIndex
      .map { case (d, i) => s"WHEN $sectorId = $i THEN ${d2s(d)}" }.mkString(" ")
    s"($tof - (CASE $cases ELSE 0.0 END))"
  }

  // ---------------------------------------------------------------------
  // 1-D linear interpolation (core/dfops.py:124 add_time_stamped_data)
  // ---------------------------------------------------------------------

  /** np.interp over literal knots: clamped outside, piecewise linear inside.
    * Knot table is tiny (external sensor samples) → literal CASE chain. */
  def interp1d(x: Column, xs: Seq[Double], ys: Seq[Double]): Column = {
    require(xs.length == ys.length && xs.length >= 2)
    var expr = when(x <= lit(xs.head), lit(ys.head))
    for (i <- 0 until xs.length - 1) {
      val slope = (ys(i + 1) - ys(i)) / (xs(i + 1) - xs(i))
      expr = expr.when(x <= lit(xs(i + 1)),
        lit(ys(i)) + (x - lit(xs(i))) * lit(slope))
    }
    expr.otherwise(lit(ys.last))
  }

  def interp1dSql(x: String, xs: Seq[Double], ys: Seq[Double]): String = {
    val sb = new StringBuilder(s"(CASE WHEN $x <= ${d2s(xs.head)} THEN ${d2s(ys.head)}")
    for (i <- 0 until xs.length - 1) {
      val slope = (ys(i + 1) - ys(i)) / (xs(i + 1) - xs(i))
      sb ++= s" WHEN $x <= ${d2s(xs(i + 1))} THEN (${d2s(ys(i))} + ($x - ${d2s(xs(i))}) * ${d2s(slope)})"
    }
    sb ++= s" ELSE ${d2s(ys.last)} END)"
    sb.toString
  }

  // ---------------------------------------------------------------------
  // Affine pose transform (momentum.py:910 coordinate_transform /
  // 1074 pose_adjustment: scaling + rotation + translation)
  // ---------------------------------------------------------------------

  /** Returns (x', y') columns for scale→rotate(θ about center)→translate.
    * sin/cos are evaluated ONCE on the driver and enter the plan as
    * constants, so the per-event math is pure mul/add. */
  def poseTransform(x: Column, y: Column, scale: Double, angleRad: Double,
                    centerX: Double, centerY: Double,
                    xTrans: Double, yTrans: Double): (Column, Column) = {
    val c = math.cos(angleRad); val s = math.sin(angleRad)
    val dx = x - lit(centerX); val dy = y - lit(centerY)
    val nx = lit(scale) * (dx * lit(c) - dy * lit(s)) + lit(centerX) + lit(xTrans)
    val ny = lit(scale) * (dx * lit(s) + dy * lit(c)) + lit(centerY) + lit(yTrans)
    (nx, ny)
  }

  def poseTransformSql(x: String, y: String, scale: Double, angleRad: Double,
                       centerX: Double, centerY: Double,
                       xTrans: Double, yTrans: Double): (String, String) = {
    val c = math.cos(angleRad); val s = math.sin(angleRad)
    val dx = s"($x - ${d2s(centerX)})"; val dy = s"($y - ${d2s(centerY)})"
    val nx = s"(${d2s(scale)} * ($dx * ${d2s(c)} - $dy * ${d2s(s)}) + ${d2s(centerX)} + ${d2s(xTrans)})"
    val ny = s"(${d2s(scale)} * ($dx * ${d2s(s)} + $dy * ${d2s(c)}) + ${d2s(centerY)} + ${d2s(yTrans)})"
    (nx, ny)
  }
}
