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
