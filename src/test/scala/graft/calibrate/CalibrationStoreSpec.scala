package graft.calibrate

import java.nio.file.Files

import graft.SparkSpecBase
import graft.functions.SedFunctions.detectorToK
import org.apache.spark.sql.functions.col

import CalibrationStore._

class CalibrationStoreSpec extends SparkSpecBase {

  private def fullStore: Calibrations = {
    // every section populated from an actual FIT, not hand-typed numbers —
    // the round-trip must preserve fitted values bit-exactly
    val poly = {
      val a = Array(3e-9, -2e-4)
      def p(t: Double): Double = a(0) * t * t + a(1) * t
      val pos = Array(41000.0, 42000.0, 43000.0, 44000.0, 45000.0)
      EnergyCalibration.polyFit(pos, pos.map(x => p(x) - p(pos(0))), refEnergy = 10.0, order = 2)
    }
    val kcal = MomentumCalibration.calibrate(64, 64, (30.0, 40.0), (32.0, 32.0),
      kDistance = 4.0 / 3.0 * math.Pi / 3.28, binRanges = ((-256.0, 1792.0), (-256.0, 1792.0)))
    val dfield = MomentumCorrection.splineWarp(
      Array(0.0, 0.0, 15.0, 15.0, 7.0), Array(0.0, 15.0, 0.0, 15.0, 8.0),
      Array(0.0, 0.0, 15.0, 15.0, 7.5), Array(0.0, 15.0, 0.0, 15.0, 7.5), 16, 16)
    Calibrations(
      energy = Some(poly),
      energyCorrection = Some(EnergyCorrectionParams("lorentzian", 250.0, 75.0, -0.25,
        Map("gamma" -> 700.0))),
      momentum = Some(kcal),
      dfield = Some(dfield),
      sectorDelays = Some(Seq(0.0, 12.5, -7.25, 3.75)),
      delay = Some(DelayCalibration((0.0, 500.0), (-110.0, 110.0), 1.5, flipTimeAxis = true)))
  }

  test("JSON round-trip preserves every calibration bit-exactly") {
    val c = fullStore
    val dir = Files.createTempDirectory("calstore").toString
    val path = s"$dir/calibration.json"
    CalibrationStore.save(c, path)
    val r = CalibrationStore.load(path)

    assert(r.energy.get.coeffs.sameElements(c.energy.get.coeffs))
    assert(r.energy.get.e0 == c.energy.get.e0 && r.energy.get.offset == c.energy.get.offset)
    assert(r.energyCorrection.get == c.energyCorrection.get)
    val (m0, m1) = (c.momentum.get, r.momentum.get)
    assert(m1.kxScale == m0.kxScale && m1.kyScale == m0.kyScale &&
      m1.xCenter == m0.xCenter && m1.yCenter == m0.yCenter &&
      m1.rStart == m0.rStart && m1.cStart == m0.cStart &&
      m1.rStep == m0.rStep && m1.cStep == m0.cStep)
    assert(m1.kxAxis.sameElements(m0.kxAxis) && m1.kyAxis.sameElements(m0.kyAxis))
    assert(r.dfield.get.rows == c.dfield.get.rows && r.dfield.get.cols == c.dfield.get.cols)
    assert(r.dfield.get.rdeform.sameElements(c.dfield.get.rdeform))
    assert(r.dfield.get.cdeform.sameElements(c.dfield.get.cdeform))
    assert(r.sectorDelays.get == c.sectorDelays.get)
    assert(r.delay.get == c.delay.get)
  }

  test("loaded calibration yields IDENTICAL Column plan constants as the fit") {
    val c = fullStore
    val r = CalibrationStore.parse(CalibrationStore.render(c))
    // momentum: the detectorToK literals must render to the identical plan
    // (Column.toString prints every literal with round-trip precision)
    def kCol(m: MomentumCalibration.KCalibration) =
      detectorToK(col("x"), m.rStart, m.xCenter, m.kxScale, m.rStep)
    assert(kCol(r.momentum.get).toString == kCol(c.momentum.get).toString)
    // energy correction: rebuilt surface is plan-identical
    assert(r.energyCorrection.get.column(col("x"), col("y")).toString ==
      c.energyCorrection.get.column(col("x"), col("y")).toString)
  }

  test("partial stores round-trip (sections are independent)") {
    val c = Calibrations(sectorDelays = Some(Seq(1.0, -2.0)))
    val r = CalibrationStore.parse(CalibrationStore.render(c))
    assert(r == c.copy())
    assert(r.energy.isEmpty && r.momentum.isEmpty && r.dfield.isEmpty && r.delay.isEmpty)
  }

  test("saveWorkflowParams persists exactly the calibrations the chain applied") {
    import spark.implicits._
    val c = fullStore
    val df = Seq((250.0, 75.0, 41000.0, 1L, 100.0), (300.0, 80.0, 43000.0, 2L, 300.0))
      .toDF("x", "y", "tof", "sector", "adc")
    val proc = graft.sed.SedProcessor(df)
      .applyEnergyCorrection(c.energyCorrection.get)
      .appendEnergyAxisPoly(c.energy.get)
      .appendKAxis(c.momentum.get)
      .alignDldSectors("sector", c.sectorDelays.get)
      .calibrateDelayAxis("adc", c.delay.get.adcRange, c.delay.get.delayRange)
    val dir = Files.createTempDirectory("calstore").toString
    val path = s"$dir/workflow.json"
    proc.saveWorkflowParams(path)
    val r = CalibrationStore.load(path)
    assert(r.energyCorrection.get == c.energyCorrection.get)
    assert(r.energy.get.coeffs.sameElements(c.energy.get.coeffs))
    assert(r.momentum.get.kxScale == c.momentum.get.kxScale)
    assert(r.sectorDelays.get == c.sectorDelays.get)
    assert(r.delay.get == c.delay.get.copy(time0mm = 0.0, flipTimeAxis = false))
    assert(r.dfield.isEmpty) // never applied -> never saved
    // an untouched chain refuses to save (reference parity)
    intercept[IllegalArgumentException] {
      graft.sed.SedProcessor(df).saveWorkflowParams(s"$dir/empty.json")
    }
  }

  test("malformed config fails at load with section.field-named errors") {
    def errOf(json: String): String =
      intercept[IllegalArgumentException] { CalibrationStore.parse(json) }.getMessage
    // missing field
    assert(errOf("""{"energy_calibration":{"coeffs":[1.0,2.0],"E0":-1.0}}""")
      .contains("energy_calibration.offset is missing"))
    // wrong type
    assert(errOf("""{"energy_calibration":{"coeffs":"nope","E0":-1.0,"offset":0.0}}""")
      .contains("energy_calibration.coeffs must be an array of numbers"))
    // wrong element type, with index
    assert(errOf("""{"sector_delays":[1.0,"x"]}""")
      .contains("sector_delays[1] must be a number"))
    // unknown enum value names the allowed set
    val e = errOf("""{"energy_correction":{"correction_type":"cubic",
      "center_x":0,"center_y":0,"amplitude":1,"params":{}}}""")
    assert(e.contains("energy_correction.correction_type") && e.contains("spherical"))
    // kind-specific parameter demanded by name
    assert(errOf("""{"energy_correction":{"correction_type":"gaussian",
      "center_x":0,"center_y":0,"amplitude":1,"params":{}}}""")
      .contains("energy_correction.params.sigma is missing"))
    // shape constraint: dfield grid length must be rows*cols
    assert(errOf("""{"momentum_correction":{"rows":4,"cols":4,
      "rdeform":[1.0,2.0],"cdeform":[1.0,2.0]}}""")
      .contains("momentum_correction.rdeform must have exactly 16 elements"))
    // fixed-length ranges
    assert(errOf("""{"delay_calibration":{"adc_range":[0.0],
      "delay_range":[0.0,1.0],"time0_mm":0.0}}""")
      .contains("delay_calibration.adc_range must have exactly 2 elements"))
    // not JSON at all
    assert(errOf("""{nope""").contains("not valid JSON"))
    // a valid store still loads after all this strictness (arrays compare
    // by reference, so compare the canonical rendering)
    val c = CalibrationStore.render(fullStore)
    assert(CalibrationStore.render(CalibrationStore.parse(c)) === c)
  }

  test("every correction type rebuilds a valid column") {
    import spark.implicits._
    val df = Seq((250.0, 75.0), (300.0, 80.0)).toDF("x", "y")
    val kinds = Seq(
      EnergyCorrectionParams("spherical", 250.0, 75.0, -0.25, Map("diameter" -> 3000.0)),
      EnergyCorrectionParams("lorentzian", 250.0, 75.0, -0.25, Map("gamma" -> 700.0)),
      EnergyCorrectionParams("gaussian", 250.0, 75.0, -0.25, Map("sigma" -> 400.0)),
      EnergyCorrectionParams("lorentzian_asymmetric", 250.0, 75.0, -0.25,
        Map("gamma" -> 700.0, "amplitude2" -> -0.1, "gamma2" -> 500.0)))
    for (p <- kinds) {
      val vals = df.select(p.column(col("x"), col("y"))).as[Double].collect()
      assert(vals.forall(v => !v.isNaN))
      // at the center the correction is exactly 0
      assert(math.abs(vals(0)) < 1e-12)
    }
  }
}
