package graft.calibrate

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Column
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.functions.SedFunctions

/** Calibration persistence — the reference's fit-once / apply-everywhere
  * workflow loop: fit a calibration on a reference run, save it to a
  * config file, re-apply it to every later run (reference:
  * src/sed/core/config.py:163 `load_config` / :196 `save_config`;
  * processor.py:1432 `save_energy_calibration`, :679 `save_splinewarp`,
  * :929 `save_momentum_calibration`, :1072 `save_energy_correction`,
  * :1802 `save_delay_calibration`).
  *
  * The store is a single JSON document with one optional section per
  * calibration kind, mirroring the reference's config-dict sections.
  * Every number round-trips exactly (shortest-round-trip double text both
  * ways), so a loaded calibration produces literally identical Column plan
  * constants to the freshly fitted one. The artifact is driver-side config
  * state (like the reference's ~/.config YAML) — a few KB, or a few MB
  * when a dense deformation field is included — not data; distributed
  * state never goes through here.
  */
object CalibrationStore {

  /** Named energy-correction surface parameters (the persistable form of
    * processor.py:1072 save_energy_correction: correction_type, amplitude,
    * center, and the per-type shape parameters). `column` rebuilds the
    * exact Column surface used by SedProcessor.applyEnergyCorrection. */
  case class EnergyCorrectionParams(kind: String, centerX: Double, centerY: Double,
                                    amplitude: Double, params: Map[String, Double]) {
    def column(x: Column, y: Column): Column = kind match {
      case "spherical" =>
        SedFunctions.energyCorrectionSpherical(x, y, centerX, centerY, amplitude, params("diameter"))
      case "lorentzian" =>
        SedFunctions.energyCorrectionLorentzian(x, y, centerX, centerY, amplitude, params("gamma"))
      case "gaussian" =>
        SedFunctions.energyCorrectionGaussian(x, y, centerX, centerY, amplitude, params("sigma"))
      case "lorentzian_asymmetric" =>
        SedFunctions.energyCorrectionLorentzianAsym(x, y, centerX, centerY, amplitude,
          params("gamma"), params("amplitude2"), params("gamma2"))
      case other => throw new IllegalArgumentException(s"unknown correction type: $other")
    }
  }

  /** Delay-axis calibration (processor.py:1802 save_delay_calibration:
    * adc_range + delay_range, or the mm-stage form via time0). */
  case class DelayCalibration(adcRange: (Double, Double), delayRange: (Double, Double),
                              time0mm: Double = 0.0, flipTimeAxis: Boolean = false)

  /** All persistable calibrations, each optional — a store can carry any
    * subset, like the reference's config sections. */
  case class Calibrations(
      energy: Option[EnergyCalibration.PolyCalibration] = None,
      energyCorrection: Option[EnergyCorrectionParams] = None,
      momentum: Option[MomentumCalibration.KCalibration] = None,
      dfield: Option[MomentumCorrection.Dfield] = None,
      sectorDelays: Option[Seq[Double]] = None,
      delay: Option[DelayCalibration] = None)

  // ---- JSON emit (hand-mapped: stable field names are the contract) ----

  private def jarr(xs: Iterable[Double]): JArray = JArray(xs.map(JDouble(_): JValue).toList)

  private def toJson(c: Calibrations): JValue = {
    val sections = List(
      c.energy.map(e => "energy_calibration" -> (JObject(
        "coeffs" -> jarr(e.coeffs), "E0" -> JDouble(e.e0),
        "offset" -> JDouble(e.offset)): JValue)),
      c.energyCorrection.map(ec => "energy_correction" -> (JObject(
        "correction_type" -> JString(ec.kind),
        "center_x" -> JDouble(ec.centerX), "center_y" -> JDouble(ec.centerY),
        "amplitude" -> JDouble(ec.amplitude),
        "params" -> JObject(ec.params.toList.sortBy(_._1).map { case (k, v) => k -> (JDouble(v): JValue) })): JValue)),
      c.momentum.map(m => "momentum_calibration" -> (JObject(
        "kx_scale" -> JDouble(m.kxScale), "ky_scale" -> JDouble(m.kyScale),
        "x_center" -> JDouble(m.xCenter), "y_center" -> JDouble(m.yCenter),
        "rstart" -> JDouble(m.rStart), "cstart" -> JDouble(m.cStart),
        "rstep" -> JDouble(m.rStep), "cstep" -> JDouble(m.cStep),
        "kx_axis" -> jarr(m.kxAxis), "ky_axis" -> jarr(m.kyAxis)): JValue)),
      c.dfield.map(d => "momentum_correction" -> (JObject(
        "rows" -> JInt(d.rows), "cols" -> JInt(d.cols),
        "rdeform" -> jarr(d.rdeform), "cdeform" -> jarr(d.cdeform)): JValue)),
      c.sectorDelays.map(sd => "sector_delays" -> (jarr(sd): JValue)),
      c.delay.map(dl => "delay_calibration" -> (JObject(
        "adc_range" -> jarr(Seq(dl.adcRange._1, dl.adcRange._2)),
        "delay_range" -> jarr(Seq(dl.delayRange._1, dl.delayRange._2)),
        "time0_mm" -> JDouble(dl.time0mm),
        "flip_time_axis" -> JBool(dl.flipTimeAxis)): JValue)))
    JObject(sections.flatten)
  }

  // ---- JSON read ----

  private def dbl(v: JValue): Double = v match {
    case JDouble(d) => d
    case JInt(i) => i.toDouble
    case JLong(l) => l.toDouble
    case JDecimal(d) => d.toDouble
    case other => throw new IllegalArgumentException(s"expected number, got $other")
  }

  private def dbls(v: JValue): Array[Double] = v match {
    case JArray(xs) => xs.map(dbl).toArray
    case other => throw new IllegalArgumentException(s"expected array, got $other")
  }

  private def fromJson(j: JValue): Calibrations = {
    def sect(name: String): Option[JValue] = j \ name match {
      case JNothing => None
      case v => Some(v)
    }
    Calibrations(
      energy = sect("energy_calibration").map(s =>
        EnergyCalibration.PolyCalibration(dbls(s \ "coeffs"), dbl(s \ "E0"), dbl(s \ "offset"))),
      energyCorrection = sect("energy_correction").map { s =>
        val params = (s \ "params") match {
          case JObject(fields) => fields.map { case (k, v) => k -> dbl(v) }.toMap
          case _ => Map.empty[String, Double]
        }
        EnergyCorrectionParams((s \ "correction_type").asInstanceOf[JString].s,
          dbl(s \ "center_x"), dbl(s \ "center_y"), dbl(s \ "amplitude"), params)
      },
      momentum = sect("momentum_calibration").map(s =>
        MomentumCalibration.KCalibration(
          dbl(s \ "kx_scale"), dbl(s \ "ky_scale"), dbl(s \ "x_center"), dbl(s \ "y_center"),
          dbl(s \ "rstart"), dbl(s \ "cstart"), dbl(s \ "rstep"), dbl(s \ "cstep"),
          dbls(s \ "kx_axis"), dbls(s \ "ky_axis"))),
      dfield = sect("momentum_correction").map(s =>
        MomentumCorrection.Dfield(dbls(s \ "rdeform"), dbls(s \ "cdeform"),
          dbl(s \ "rows").toInt, dbl(s \ "cols").toInt)),
      sectorDelays = sect("sector_delays").map(s => dbls(s).toSeq),
      delay = sect("delay_calibration").map { s =>
        val ar = dbls(s \ "adc_range"); val dr = dbls(s \ "delay_range")
        DelayCalibration((ar(0), ar(1)), (dr(0), dr(1)), dbl(s \ "time0_mm"),
          (s \ "flip_time_axis") match { case JBool(b) => b; case _ => false })
      })
  }

  /** Serialize to pretty JSON text (the file format). */
  def render(c: Calibrations): String =
    JsonMethods.pretty(JsonMethods.render(toJson(c)))

  def parse(text: String): Calibrations = fromJson(JsonMethods.parse(text))

  /** Save to a local file (the reference's user-config analogue,
    * config.py:196 save_config with overwrite semantics). */
  def save(c: Calibrations, path: String): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.write(p, render(c).getBytes(StandardCharsets.UTF_8))
  }

  def load(path: String): Calibrations =
    parse(new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8))
}
