package graft.io

import java.nio.file.Files

import graft.SparkSpecBase
import graft.operators.{BinAxis, Binning}

/** Config-driven NXmpes NeXus export (reference io/nexus.py:14 to_nexus +
  * config/NXmpes_config.json via pynxtools): the MetaHandler tree is
  * mapped onto NXmpes instrument/sample/calibration paths and the written
  * file round-trips through the pure-JVM Hdf5File reader. */
class NxmpesSpec extends SparkSpecBase {
  import spark.implicits._

  private def hist = {
    val axes = Seq(BinAxis("a", 2, 0.0, 2.0), BinAxis("b", 3, 0.0, 3.0))
    val df = Seq((0.5, 0.5), (0.5, 0.5), (1.5, 2.5)).toDF("a", "b")
    (Binning.histogram(df, axes), axes)
  }

  private val metaFixture: Map[String, Any] = Map(
    "attributes" -> Map("title" -> "graphite scan 49", "start_time" -> "2024-03-01T10:00:00"),
    "user" -> Map("name" -> "A. Researcher", "email" -> "a@example.org"),
    "instrument" -> Map(
      "energy_resolution" -> 110.0,
      "analyzer" -> Map(
        "lens_mode" -> "6kV_kmodem4.0_high_ang",
        "projection" -> "reciprocal",
        "scheme" -> "momentum dispersive",
        "fa_shape" -> "circle", "fa_size" -> 200.0,
        "ca_shape" -> "open", "ca_size" -> Double.NaN)),
    "file" -> Map(
      "KTOF:Lens:Extr:V" -> 6000.0,
      "KTOF:Lens:A:V" -> 1340.0,
      "KTOF:Lens:B:V" -> 1340.5,
      "KTOF:Lens:Foc:V" -> 222.0,
      "KTOF:Lens:TOF:V" -> 20.0,
      "KTOF:Lens:Sample:V" -> 17.0,
      "trARPES:Carving:TEMP_RBV" -> 300.0),
    "sample" -> Map("name" -> "HOPG", "chemical_formula" -> "C"),
    "process" -> Map(
      "energy_calibration" -> Map(
        "coeffs" -> Seq(1.5, -2.0, 0.25), "E0" -> -21.5, "offset" -> 330.0),
      "momentum_calibration" -> Map(
        "kx_scale" -> 0.012, "ky_scale" -> 0.012,
        "x_center" -> 256.0, "y_center" -> 256.0,
        "kx_axis" -> Seq(-1.0, 0.0, 1.0), "ky_axis" -> Seq(-1.0, 0.0, 1.0))))

  test("NXmpes export maps the metadata tree onto definition paths and round-trips") {
    val (h, axes) = hist
    val path = s"${Files.createTempDirectory("nxmpes")}/scan.nxs"
    val report = SedWriter.nexusNxmpes(h, axes, path, Nxmpes.defaultConfig, metaFixture)

    val f = Hdf5File.fromPath(java.nio.file.Paths.get(path))
    // root + entry structure
    assert(f.attributes("/").get("default").contains("entry"))
    assert(f.attributes("/entry").get("NX_class").contains("NXentry"))
    assert(f.attributes("/entry").get("default").contains("data"))
    assert(f.readString("/entry/definition") == "NXmpes")
    assert(f.readString("/entry/title") == "graphite scan 49")
    assert(f.readString("/entry/start_time") == "2024-03-01T10:00:00")
    // NXdata cube still present alongside the mapped tree
    assert(f.attributes("/entry/data").get("NX_class").contains("NXdata"))
    assert(f.readDoubles("/entry/data/counts").sum == 3.0)
    // instrument branch: classes + fields from @attrs references
    assert(f.attributes("/entry/instrument").get("NX_class").contains("NXinstrument"))
    assert(f.attributes("/entry/instrument/electronanalyzer")
      .get("NX_class").contains("NXelectronanalyzer"))
    val cc = "/entry/instrument/electronanalyzer/collectioncolumn"
    assert(f.attributes(cc).get("NX_class").contains("NXcollectioncolumn"))
    assert(f.readString(s"$cc/lens_mode") == "6kV_kmodem4.0_high_ang")
    assert(f.readString(s"$cc/projection") == "reciprocal")
    assert(f.readDoubles(s"$cc/extractor_voltage").head == 6000.0)
    assert(f.attributes(s"$cc/extractor_voltage").get("units").contains("V"))
    // wildcard lens expansion: one NXelectromagnetic_lens group per variant
    Seq("A" -> 1340.0, "B" -> 1340.5, "Foc" -> 222.0).foreach { case (lens, v) =>
      assert(f.attributes(s"$cc/lens_$lens").get("NX_class")
        .contains("NXelectromagnetic_lens"))
      assert(f.readString(s"$cc/lens_$lens/name") == lens)
      assert(f.readDoubles(s"$cc/lens_$lens/voltage").head == v)
    }
    // aperture sizes with µ-units survive UTF-8 attr encoding
    assert(f.readDoubles(s"$cc/field_aperture/size").head == 200.0)
    assert(f.attributes(s"$cc/field_aperture/size").get("units").contains("µm"))
    // manipulator sensors + @link as a REAL HDF5 soft link: the linked
    // path resolves transparently to the target sensor group
    val sensor = "/entry/instrument/manipulator/temperature_sensor"
    assert(f.readDoubles(s"$sensor/value").head == 300.0)
    val viaLink = "/entry/sample/temperature_env/temperature_sensor"
    assert(f.readString(s"$viaLink/name") == "sample_temperature")
    assert(f.readDoubles(s"$viaLink/value").head == 300.0)
    assert(f.attributes(s"$viaLink/value").get("units").contains("K"))
    // calibration sections: applied stamped true, parameters round-trip
    assert(f.readDoubles("/entry/energy_calibration/applied").head == 1.0)
    assert(f.readDoubles("/entry/energy_calibration/fit_formula_inputs/coefficients")
      .toSeq == Seq(1.5, -2.0, 0.25))
    assert(f.readDoubles("/entry/kx_calibration/calibration_parameters/scaling_factor")
      .head == 0.012)
    assert(f.readDoubles("/entry/kx_calibration/calibrated_axis").toSeq ==
      Seq(-1.0, 0.0, 1.0))
    assert(f.readString("/entry/sample/name") == "HOPG")
    assert(f.attributes("/entry/sample").get("NX_class").contains("NXsample"))
    // report: the mapped paths registered; the ONLY missing-required
    // entries are the `applied` flags of sections this chain never
    // applied (distortion, delay) — exactly what a pynxtools validation
    // would flag, and nothing from the applied sections
    assert(report.resolved.exists(_.contains("lens_mode")))
    assert(report.missingRequired.forall(_.endsWith("/applied")),
      s"unexpected missing required: ${report.missingRequired}")
    assert(report.missingRequired.exists(_.contains("distortion")))
    assert(!report.missingRequired.exists(_.contains("energy_calibration")))
    // and the un-applied section left no stray groups' datasets behind
    assert(!f.exists("/entry/distortion/rdeform_field"))
  }

  test("missing required fields are reported, and strict mode throws naming them") {
    val (h, axes) = hist
    val path = s"${Files.createTempDirectory("nxmpes2")}/scan.nxs"
    val bare = Map[String, Any]() // nothing resolvable
    val report = SedWriter.nexusNxmpes(h, axes, path, Nxmpes.defaultConfig, bare)
    // title falls back to its literal default; lens_mode/projection are
    // required with no default -> reported missing
    assert(report.missingRequired.exists(_.endsWith("lens_mode")))
    assert(report.missingRequired.exists(_.endsWith("projection")))
    val f = Hdf5File.fromPath(java.nio.file.Paths.get(path))
    assert(f.readString("/entry/title") == "graft binned scan") // literal fallback
    assert(f.readString("/entry/user/name") == "unknown")
    val err = intercept[IllegalArgumentException] {
      SedWriter.nexusNxmpes(h, axes, path, Nxmpes.defaultConfig, bare, strict = true)
    }
    assert(err.getMessage.contains("lens_mode"))
  }

  test("attributes on @link fields are reported unapplied, not silently dropped") {
    // an HDF5 soft link cannot carry attributes of its own — a config
    // '@units' sibling of an '@link:' entry must surface in the Report
    val cfg = """{
      "/ENTRY/instrument/source/value": 42.0,
      "/ENTRY/instrument/source/value/@units": "mm",
      "/ENTRY/sample/mirror": "@link:/entry/instrument/source",
      "/ENTRY/sample/mirror/@units": "mm",
      "/ENTRY/sample/mirror/@note": "alias"
    }"""
    val (nodes, _, _, report) = Nxmpes.map(cfg, Map.empty)
    assert(report.unapplied.toSet ==
      Set("ENTRY/sample/mirror/@units", "ENTRY/sample/mirror/@note"))
    // the link itself still materializes; the dataset's own attr applied
    val sample = nodes.collectFirst {
      case g: Hdf5Writer.Group if g.name == "sample" => g }.get
    assert(sample.children.exists {
      case Hdf5Writer.SoftLink("mirror", "/entry/instrument/source") => true
      case _ => false
    })
    val inst = nodes.collectFirst {
      case g: Hdf5Writer.Group if g.name == "instrument" => g }.get
    val src = inst.children.collectFirst {
      case g: Hdf5Writer.Group if g.name == "source" => g }.get
    assert(src.children.collectFirst {
      case d: Hdf5Writer.DoubleDataset if d.name == "value" => d.attrs }.get
      .contains(("units", "mm")))
  }

  test("the reference's own NXmpes config parses in the same dialect") {
    // dialect-compatibility evidence: the pynxtools config shipped with
    // the reference loads and maps without error; its literal fields
    // resolve, its @attrs references resolve when the tree has them
    val refPath = java.nio.file.Paths.get(
      "/root/reference/src/sed/config/NXmpes_config.json")
    assume(Files.exists(refPath))
    val cfg = new String(Files.readAllBytes(refPath), "UTF-8")
    val meta = Map[String, Any](
      "instrument" -> Map("analyzer" -> Map(
        "slow_axes" -> "delay", "projection" -> "reciprocal",
        "lens_mode" -> "6kV_kmodem4.0_high_ang",
        "scheme" -> "momentum dispersive",
        "fa_shape" -> "circle", "fa_size" -> 200.0,
        "ca_shape" -> "open", "ca_size" -> 200.0)))
    val (nodes, entryAttrs, rootAttrs, report) = Nxmpes.map(cfg, meta)
    assert(rootAttrs.contains(("default", "entry")))
    assert(entryAttrs.contains(("default", "data")))
    // literal institution string resolves; the analyzer fields came from meta
    assert(report.resolved.exists(_.contains("experiment_institution")))
    assert(report.resolved.exists(_.contains("lens_mode")))
    // instrument group materialized with the electronanalyzer subtree
    val inst = nodes.collectFirst {
      case g: Hdf5Writer.Group if g.name == "instrument" => g }.get
    assert(inst.children.exists(_.name == "electronanalyzer"))
    // required eln/attrs-only fields without our tree -> reported, not fatal
    assert(report.missingRequired.nonEmpty)
  }
}
