package graft.sed

import graft.SparkSpecBase
import graft.operators.{BinAxis, ColumnOffset}
import graft.functions.SedFunctions
import org.apache.spark.sql.functions._

class SedProcessorSpec extends SparkSpecBase {
  import spark.implicits._

  private def proc = SedProcessor(
    events.withColumn("x", $"value")
      .withColumn("y", $"user_id".cast("double"))
      .withColumn("tof", $"value" * 100.0 + 10000.0))

  test("full fluent chain stays lazy and computes the canonical cube") {
    val cube2 = proc.copy(dataframe = proc.dataframe
        .withColumn("__sec", ($"event_id" % 4).cast("int")))
      .filterColumn("value", 1.0, 499.0)
      .addJitter(Seq("tof"), "event_id", 0.5)
      .alignDldSectors("__sec", Seq(0.0, 12.5, -7.25, 3.75))
      .applyEnergyCorrection((x, y) =>
        SedFunctions.energyCorrectionSpherical(x, y, 250.0, 75.0, 1.0, 3000.0))
      .appendEnergyAxis(0.9, 1e-8, 4.125e-12, 1, "kinetic", -10.0)
      .appendKAxis(0.0, 256.0, 0.0131, 2.0, 0.0, 64.0, 0.0121, 1.0)
      .compute(Seq(BinAxis("kx", 32, -4.0, 0.0), BinAxis("ky", 32, -1.0, 0.0),
        BinAxis("energy", 32, 0.0, 2500.0)))
    val total = cube2.agg(sum("cnt")).as[Long].head()
    assert(total > 0)
    assert(cube2.columns.toSet ==
      Set("kx_bin", "ky_bin", "energy_bin", "cnt", "kx_center", "ky_center", "energy_center"))
  }

  test("appendEnergyAxis equals the raw function") {
    val viaProc = proc.appendEnergyAxis(0.9, 1e-8, 4.125e-12, 1, "kinetic", -10.0)
      .dataframe.select("event_id", "energy")
    val direct = proc.dataframe.select($"event_id",
      SedFunctions.tof2ev($"tof", 0.9, 1e-8, 4.125e-12, 1, "kinetic", -10.0).as("energy"))
    assert(viaProc.exceptAll(direct).count() == 0 && direct.exceptAll(viaProc).count() == 0)
  }

  test("addEnergyOffset with preserve_mean keeps the energy mean") {
    val p = proc.appendEnergyAxis(0.9, 1e-8, 4.125e-12, 1, "kinetic", -10.0)
    val off = p.addEnergyOffset(Seq(ColumnOffset("value", 0.02, None, preserveMean = true)))
    val (m0, m1) = (p.dataframe.agg(avg("energy")).as[Double].head(),
      off.dataframe.agg(avg("energy")).as[Double].head())
    assert(math.abs(m0 - m1) < 1e-9)
  }

  test("delay axis + flip offset") {
    val d = proc.calibrateDelayAxis("value", (0.0, 500.0), (-76.0, 56.0))
      .addDelayOffset(constant = 3.0, flip = true)
      .dataframe.select("delay").as[Double].collect()
    assert(d.forall(v => v >= -56.0 + 3.0 - 1e-9 && v <= 76.0 + 3.0 + 1e-9))
  }

  test("save dispatches on extension: nexus bytes, tiff bytes, parquet+axes") {
    val axes = Seq(BinAxis("x", 4, 0.0, 512.0), BinAxis("y", 4, 0.0, 512.0))
    val dir = java.nio.file.Files.createTempDirectory("proc_save").toString
    proc.save(s"$dir/cube.nxs", axes, compress = true)
    val f = graft.io.Hdf5File.fromPath(java.nio.file.Paths.get(s"$dir/cube.nxs"))
    assert(f.attributes("/entry/data")("signal") == "counts")
    assert(f.readDoubles("/entry/data/counts").sum > 0)
    proc.save(s"$dir/img.tiff", axes)
    assert(java.nio.file.Files.size(java.nio.file.Paths.get(s"$dir/img.tiff")) > 8)
    proc.save(s"$dir/binned", axes)
    assert(spark.read.parquet(s"$dir/binned/data").count() > 0)
  }

  test("NeXus export round-trips the instrument/process metadata tree") {
    val axes = Seq(BinAxis("x", 4, 0.0, 512.0), BinAxis("y", 4, 0.0, 512.0))
    val dir = java.nio.file.Files.createTempDirectory("proc_meta").toString
    val cal = graft.calibrate.EnergyCalibration.PolyCalibration(
      Array(1.5, -2.25, 0.125), e0 = -10.5, offset = 42000.0)
    val p = proc
      .appendEnergyAxisPoly(cal)
      .calibrateDelayAxis("value", (0.0, 500.0), (-76.0, 56.0))
      .addAttribute("run", "Scan0030")
      .addMetadata(Map(
        "beamline" -> "pg2",
        "detector" -> Map("model" -> "DLD8s", "voltage" -> 299.5)), "instrument")
    p.save(s"$dir/cube.h5", axes)
    val f = graft.io.Hdf5File.fromPath(java.nio.file.Paths.get(s"$dir/cube.h5"))
    // instrument branch: nested groups with scalar attrs
    assert(f.attributes("/entry/instrument")("beamline") === "pg2")
    val det = f.attributes("/entry/instrument/detector")
    assert(det("model") === "DLD8s" && det("voltage") === 299.5)
    // process branch: the applied calibrations with store field names
    val ec = f.attributes("/entry/process/energy_calibration")
    assert(ec("E0") === -10.5 && ec("offset") === 42000.0)
    assert(f.readDoubles("/entry/process/energy_calibration/coeffs").toSeq ===
      Seq(1.5, -2.25, 0.125))
    val dc = f.attributes("/entry/process/delay_calibration")
    assert(dc("time0_mm") === 0.0 && dc("flip_time_axis") === 0L)
    assert(f.readDoubles("/entry/process/delay_calibration/adc_range").toSeq ===
      Seq(0.0, 500.0))
    // flat run attributes branch
    assert(f.attributes("/entry/attributes")("run") === "Scan0030")
    // NXdata payload still intact alongside the metadata
    assert(f.attributes("/entry/data")("signal") === "counts")
    assert(f.readDoubles("/entry/data/counts").sum > 0)
  }

  test("saveNxmpes maps the chain's applied calibrations onto NXmpes paths") {
    val axes = Seq(BinAxis("x", 4, 0.0, 512.0), BinAxis("y", 4, 0.0, 512.0))
    val dir = java.nio.file.Files.createTempDirectory("proc_nxmpes").toString
    val cal = graft.calibrate.EnergyCalibration.PolyCalibration(
      Array(1.5, -2.25, 0.125), e0 = -10.5, offset = 42000.0)
    val p = proc
      .appendEnergyAxisPoly(cal)
      .addAttribute("title", "graphite 0030")
      .addMetadata(Map("analyzer" -> Map(
        "lens_mode" -> "6kV_kmodem4.0", "projection" -> "reciprocal")), "instrument")
    val report = p.saveNxmpes(s"$dir/scan.nxs", axes)
    val f = graft.io.Hdf5File.fromPath(java.nio.file.Paths.get(s"$dir/scan.nxs"))
    assert(f.readString("/entry/definition") == "NXmpes")
    assert(f.readString("/entry/title") == "graphite 0030")
    // the chain's energy calibration landed on the NXcalibration template
    assert(f.readDoubles("/entry/energy_calibration/applied").head == 1.0)
    assert(f.readDoubles(
      "/entry/energy_calibration/fit_formula_inputs/coefficients").toSeq ==
      Seq(1.5, -2.25, 0.125))
    assert(f.readDoubles(
      "/entry/energy_calibration/fit_formula_inputs/reference_energy").head == -10.5)
    // analyzer metadata reached the collectioncolumn
    assert(f.readString(
      "/entry/instrument/electronanalyzer/collectioncolumn/lens_mode") == "6kV_kmodem4.0")
    // cube rides alongside
    assert(f.readDoubles("/entry/data/counts").sum > 0)
    // momentum/delay sections were not applied -> their required
    // `applied` flags are the report's missing entries
    assert(report.missingRequired.forall(_.endsWith("/applied")))
    assert(!report.missingRequired.exists(_.contains("energy_calibration")))
  }

  test("generateSplinewarp: identity landmarks yield the identity field") {
    val marks = Seq((10.0, 10.0), (10.0, 50.0), (50.0, 10.0), (50.0, 50.0), (30.0, 30.0))
    val df = proc.generateSplinewarp(marks, marks, rows = 8, cols = 8)
    // identity warp: rdeform(r,c) == r and cdeform(r,c) == c on the grid
    for (r <- 0 until 8; c <- 0 until 8) {
      assert(math.abs(df.rdeform(r * 8 + c) - r) < 1e-6)
      assert(math.abs(df.cdeform(r * 8 + c) - c) < 1e-6)
    }
  }

  test("whole chain is one scan: no shuffle before the histogram groupBy") {
    val plan = proc
      .addJitter(Seq("tof"), "event_id", 0.5)
      .appendEnergyAxis(0.9, 1e-8, 4.125e-12, 1, "kinetic", -10.0)
      .appendKAxis(0.0, 256.0, 0.0131, 2.0, 0.0, 64.0, 0.0121, 1.0)
      .compute(Seq(BinAxis("energy", 32, 0.0, 2500.0)))
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 == 1, s"expected exactly 1 shuffle:\n$plan")
  }
}
