package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import graft.functions.SedFunctions._

class SedFunctionsSpec extends SparkSpecBase {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Double =
    Seq(1).toDF("x").select(c).as[Double].head()

  test("tof2ev matches the flight-tube formula") {
    val t = 42000.0
    val got = one(tof2ev(lit(t), 0.9, 1e-8, 4.125e-12, 1, "kinetic", -10.0))
    val ratio = 0.9 / (t * 4.125e-12 - 1e-8)
    assert(got === 2.84281e-12 * ratio * ratio - 10.0)
  }

  test("tof2ev binding scale flips the sign") {
    val t = 42000.0
    val kin = one(tof2ev(lit(t), 0.9, 1e-8, 4.125e-12, 1, "kinetic", 0.0))
    val bin = one(tof2ev(lit(t), 0.9, 1e-8, 4.125e-12, 1, "binding", 0.0))
    assert(kin === -bin)
  }

  test("tof2evpoly evaluates lowest order first (reference layout)") {
    // a = [2, 3] highest-first => E = 3 t + 2 t^2 + off
    val got = one(tof2evpoly(lit(5.0), Seq(2.0, 3.0), 1.0))
    assert(got === 3.0 * 5.0 + 2.0 * 25.0 + 1.0)
  }

  test("interp1d clamps outside the knots and interpolates inside") {
    val xs = Seq(0.0, 10.0, 20.0); val ys = Seq(1.0, 3.0, 2.0)
    assert(one(interp1d(lit(-5.0), xs, ys)) === 1.0)
    assert(one(interp1d(lit(25.0), xs, ys)) === 2.0)
    assert(one(interp1d(lit(5.0), xs, ys)) === 2.0)   // midpoint of 1..3
    assert(one(interp1d(lit(15.0), xs, ys)) === 2.5)  // midpoint of 3..2
  }

  test("jitter is deterministic and bounded by amp") {
    val df = events.limit(200)
    val j = df.select((jitterUniform($"value", $"event_id", 0.5) - $"value").as("d")).as[Double].collect()
    assert(j.forall(d => d >= -0.5 && d < 0.5))
    val j2 = df.select((jitterUniform($"value", $"event_id", 0.5) - $"value").as("d")).as[Double].collect()
    assert(j.toSeq == j2.toSeq) // same ids -> same noise, any run
  }

  test("jitterNormal has ~zero mean and unit-ish sigma at amp=1") {
    val d = events.select((jitterNormal($"value", $"event_id", 1.0) - $"value").as("d")).as[Double].collect()
    val mean = d.sum / d.length
    val sd = math.sqrt(d.map(x => (x - mean) * (x - mean)).sum / d.length)
    assert(math.abs(mean) < 0.1 && sd > 0.8 && sd < 1.2)
  }

  test("sectorAlign subtracts the per-sector delay") {
    val delays = Seq(0.0, 12.5, -7.25)
    val got = Seq((100.0, 1), (100.0, 2), (100.0, 0), (100.0, 7))
      .toDF("tof", "sec")
      .select(sectorAlign($"tof", $"sec", delays).as("t")).as[Double].collect()
    assert(got.toSeq == Seq(87.5, 107.25, 100.0, 100.0)) // unknown sector -> 0.0
  }

  test("poseTransform is an exact affine map (rotation about center)") {
    val (nx, ny) = poseTransform(lit(1.0), lit(0.0), 1.0, math.Pi / 2, 0.0, 0.0, 0.0, 0.0)
    val r = Seq(1).toDF("x").select(nx.as("nx"), ny.as("ny")).as[(Double, Double)].head()
    assert(math.abs(r._1) < 1e-15 && math.abs(r._2 - 1.0) < 1e-15)
  }
}
