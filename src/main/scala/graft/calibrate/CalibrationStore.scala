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

  // ---- JSON read with load-time validation ----

  /** Load-time validation failure naming the exact section and field
    * (the reference's typed-config behavior, core/config_model.py:1 —
    * a malformed file fails AT LOAD with a pointed message, never as a
    * cast error deep inside a Catalyst plan). */
  final class ConfigFieldError(val section: String, val field: String, problem: String)
      extends IllegalArgumentException(
        s"invalid calibration config: $section.$field $problem")

  private final class Sect(val name: String, v: JValue) {
    private def get(field: String): JValue = v \ field match {
      case JNothing => throw new ConfigFieldError(name, field, "is missing")
      case x => x
    }
    def dbl(field: String): Double = get(field) match {
      case JDouble(d) => d
      case JInt(i) => i.toDouble
      case JLong(l) => l.toDouble
      case JDecimal(d) => d.toDouble
      case other => throw new ConfigFieldError(name, field,
        s"must be a number, got ${other.getClass.getSimpleName.stripPrefix("J")}")
    }
    def dbls(field: String, exactLen: Int = -1): Array[Double] = get(field) match {
      case JArray(xs) =>
        val arr = xs.zipWithIndex.map {
          case (JDouble(d), _) => d
          case (JInt(i), _) => i.toDouble
          case (JLong(l), _) => l.toDouble
          case (JDecimal(d), _) => d.toDouble
          case (other, i) => throw new ConfigFieldError(name, s"$field[$i]",
            s"must be a number, got ${other.getClass.getSimpleName.stripPrefix("J")}")
        }.toArray
        if (exactLen >= 0 && arr.length != exactLen)
          throw new ConfigFieldError(name, field,
            s"must have exactly $exactLen elements, got ${arr.length}")
        arr
      case other => throw new ConfigFieldError(name, field,
        s"must be an array of numbers, got ${other.getClass.getSimpleName.stripPrefix("J")}")
    }
    def str(field: String): String = get(field) match {
      case JString(s) => s
      case other => throw new ConfigFieldError(name, field,
        s"must be a string, got ${other.getClass.getSimpleName.stripPrefix("J")}")
    }
    def bool(field: String, default: Boolean): Boolean = v \ field match {
      case JNothing => default
      case JBool(b) => b
      case other => throw new ConfigFieldError(name, field,
        s"must be a boolean, got ${other.getClass.getSimpleName.stripPrefix("J")}")
    }
  }

  private val CorrectionKinds =
    Map("spherical" -> Seq("diameter"), "lorentzian" -> Seq("gamma"),
      "gaussian" -> Seq("sigma"),
      "lorentzian_asymmetric" -> Seq("gamma", "amplitude2", "gamma2"))

  private def fromJson(j: JValue): Calibrations = {
    def sect(name: String): Option[Sect] = j \ name match {
      case JNothing => None
      case v => Some(new Sect(name, v))
    }
    Calibrations(
      energy = sect("energy_calibration").map { s =>
        val coeffs = s.dbls("coeffs")
        if (coeffs.isEmpty)
          throw new ConfigFieldError(s.name, "coeffs", "must be non-empty")
        EnergyCalibration.PolyCalibration(coeffs, s.dbl("E0"), s.dbl("offset"))
      },
      energyCorrection = sect("energy_correction").map { s =>
        val kind = s.str("correction_type")
        val needed = CorrectionKinds.getOrElse(kind,
          throw new ConfigFieldError(s.name, "correction_type",
            s"must be one of ${CorrectionKinds.keys.toSeq.sorted.mkString(", ")}, got '$kind'"))
        val ps = new Sect(s"${s.name}.params", j \ s.name \ "params")
        val params = needed.map(f => f -> ps.dbl(f)).toMap
        EnergyCorrectionParams(kind,
          s.dbl("center_x"), s.dbl("center_y"), s.dbl("amplitude"), params)
      },
      momentum = sect("momentum_calibration").map(s =>
        MomentumCalibration.KCalibration(
          s.dbl("kx_scale"), s.dbl("ky_scale"), s.dbl("x_center"), s.dbl("y_center"),
          s.dbl("rstart"), s.dbl("cstart"), s.dbl("rstep"), s.dbl("cstep"),
          s.dbls("kx_axis"), s.dbls("ky_axis"))),
      dfield = sect("momentum_correction").map { s =>
        val rows = s.dbl("rows").toInt; val cols = s.dbl("cols").toInt
        if (rows < 2 || cols < 2)
          throw new ConfigFieldError(s.name, "rows/cols", "must each be >= 2")
        MomentumCorrection.Dfield(
          s.dbls("rdeform", rows * cols), s.dbls("cdeform", rows * cols), rows, cols)
      },
      sectorDelays = (j \ "sector_delays") match {
        case JNothing => None
        case _ => Some(new Sect("<root>", j).dbls("sector_delays").toSeq)
      },
      delay = sect("delay_calibration").map { s =>
        val ar = s.dbls("adc_range", 2); val dr = s.dbls("delay_range", 2)
        DelayCalibration((ar(0), ar(1)), (dr(0), dr(1)), s.dbl("time0_mm"),
          s.bool("flip_time_axis", default = false))
      })
  }

  /** Serialize to pretty JSON text (the file format). */
  def render(c: Calibrations): String =
    JsonMethods.pretty(JsonMethods.render(toJson(c)))

  /** The applied calibrations as a nested metadata tree (same section
    * and field names as the JSON contract) — feeds the MetaHandler /
    * NeXus "process" branch (reference core/metadata.py accumulating
    * each calibrator stage's metadata dict). */
  def tree(c: Calibrations): Map[String, Any] =
    toJson(c).values.asInstanceOf[Map[String, Any]]

  def parse(text: String): Calibrations = {
    val j = try JsonMethods.parse(text) catch {
      case e: Exception => throw new IllegalArgumentException(
        s"invalid calibration config: not valid JSON (${e.getMessage})")
    }
    fromJson(j)
  }

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
