package graft.calibrate

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpecBase
import graft.operators.BinAxis
import graft.sed.SedProcessor

/** Driver-side numeric checks for the auto feature workflow
  * (reference momentum.py:419 feature_extract / :351 add_features). */
class FeatureDetectionSpec extends AnyFunSuite {
  import FeatureDetection._

  /** 128×128 image: Gaussian blobs at the vertices of a hexagon of
    * radius 40 about (64,64), plus a center blob, over a flat floor. */
  private def hexImage(centerAmp: Double = 0.9): Array[Array[Double]] = {
    val img = Array.fill(128, 128)(0.01)
    val blobs = (0 until 6).map { i =>
      val a = math.Pi / 3 * i + 0.2
      (64.0 + 40 * math.cos(a), 64.0 + 40 * math.sin(a), 1.0)
    } :+ ((64.0, 64.0, centerAmp))
    for (r <- 0 until 128; c <- 0 until 128) {
      var v = img(r)(c)
      blobs.foreach { case (br, bc, amp) =>
        val d2 = (r - br) * (r - br) + (c - bc) * (c - bc)
        v += amp * math.exp(-d2 / 18.0)
      }
      img(r)(c) = v
    }
    img
  }

  test("peakDetect2d finds the 7 blobs with sub-bin accuracy") {
    val peaks = peakDetect2d(hexImage(), radius = 6, ampFraction = 0.3)
    assert(peaks.size == 7)
    val expected = (0 until 6).map { i =>
      val a = math.Pi / 3 * i + 0.2
      (64.0 + 40 * math.cos(a), 64.0 + 40 * math.sin(a))
    } :+ ((64.0, 64.0))
    expected.foreach { case (er, ec) =>
      assert(peaks.exists(p => math.abs(p.row - er) < 1.0 && math.abs(p.col - ec) < 1.0),
        s"no peak near ($er,$ec): $peaks")
    }
  }

  test("peakDetect2d keeps one winner per plateau and honors the threshold") {
    val img = Array.fill(20, 20)(0.0)
    img(5)(5) = 1.0; img(5)(6) = 1.0 // plateau
    img(15)(15) = 0.05 // below threshold
    val peaks = peakDetect2d(img, radius = 2, ampFraction = 0.1)
    assert(peaks.size == 1 && peaks.head.amp == 1.0)
  }

  test("addFeatures: centroidnn center pick, ccw ordering, zero score for a regular hexagon") {
    val pts = (0 until 6).map { i =>
      val a = math.Pi / 3 * i
      (10 + 4 * math.cos(a), 20 + 4 * math.sin(a))
    } :+ ((10.1, 20.05)) // near-center point
    val f = addFeatures(scala.util.Random.shuffle(pts), rotsym = 6)
    assert(f.includeCenter && f.center == ((10.1, 20.05)))
    assert(f.outer.size == 6)
    // ccw: angles strictly ascending
    val angs = f.outer.map(p => math.atan2(p._2 - f.center._2, p._1 - f.center._1))
    assert(angs == angs.sorted)
    assert(math.abs(f.meanCenterVertexDist - 4.0) < 0.15)
    assert(f.symmetryScore < 0.05, s"score ${f.symmetryScore}")
  }

  test("addFeatures without center uses the centroid; cw reverses the order") {
    val pts = (0 until 4).map { i =>
      val a = math.Pi / 2 * i
      (5 + 2 * math.cos(a), 5 + 2 * math.sin(a))
    }
    val ccw = addFeatures(pts, rotsym = 4, direction = "ccw")
    val cw = addFeatures(pts, rotsym = 4, direction = "cw")
    assert(!ccw.includeCenter)
    assert(math.abs(ccw.center._1 - 5.0) < 1e-9 && math.abs(ccw.center._2 - 5.0) < 1e-9)
    assert(cw.outer == ccw.outer.reverse)
  }

  test("idealPolygon targets a regular polygon pairing 1:1 with the ordered vertices") {
    // squash one vertex of a hexagon; targets must restore the mean radius
    val pts = (0 until 6).map { i =>
      val a = math.Pi / 3 * i
      val rr = if (i == 2) 3.0 else 4.0
      (rr * math.cos(a), rr * math.sin(a))
    }
    val f = addFeatures(pts, rotsym = 6)
    val tgt = idealPolygon(f, rotsym = 6)
    assert(tgt.size == 6)
    val rMean = f.meanCenterVertexDist
    tgt.foreach { case (x, y) =>
      val r = math.hypot(x - f.center._1, y - f.center._2)
      assert(math.abs(r - rMean) < 1e-9)
    }
    // vertex 0 target sits exactly at vertex 0's detected angle
    val a0 = math.atan2(f.outer.head._2 - f.center._2, f.outer.head._1 - f.center._1)
    val at = math.atan2(tgt.head._2 - f.center._2, tgt.head._1 - f.center._1)
    assert(math.abs(a0 - at) < 1e-9)
  }
}

/** End-to-end: distributed histogram → driver detection → splinewarp. */
class DefineFeaturesSpec extends SparkSpecBase {

  test("defineFeatures detects a seeded hexagon through the distributed histogram") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // 6 clusters at hexagon vertices (radius 30 about (50,50)) + center
    val pts = (0 until 7000).map { i =>
      val k = i % 7
      val (bx, by) = if (k == 6) (50.0, 50.0) else {
        val a = math.Pi / 3 * k
        (50.0 + 30 * math.cos(a), 50.0 + 30 * math.sin(a))
      }
      (bx + rnd.nextGaussian() * 0.8, by + rnd.nextGaussian() * 0.8)
    }
    val df = pts.toDF("x", "y")
    val proc = SedProcessor(df)
    val f = proc.defineFeatures(BinAxis("x", 100, 0.0, 100.0),
      BinAxis("y", 100, 0.0, 100.0), rotsym = 6, radius = 5, ampFraction = 0.2)
    assert(f.includeCenter)
    assert(math.abs(f.center._1 - 50.0) < 1.5 && math.abs(f.center._2 - 50.0) < 1.5)
    assert(math.abs(f.meanCenterVertexDist - 30.0) < 1.5)
    assert(f.symmetryScore < 0.1)
    // the detected landmarks drive the splinewarp directly
    val dfield = proc.generateSplinewarp(
      f.outer :+ f.center,
      FeatureDetection.idealPolygon(f, 6) :+ f.center, rows = 64, cols = 64)
    assert(dfield.rows == 64 && dfield.cols == 64)
  }
}
