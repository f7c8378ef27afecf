package graft.calibrate

/** Automatic symmetry-point detection for momentum correction — the
  * driver-side numeric core behind the reference's auto feature workflow
  * (reference: src/sed/core/processor.py:583 `define_features`,
  * src/sed/calibrator/momentum.py:419 `feature_extract` /
  * momentum.py:351 `add_features`, which delegate to the public
  * `symmetrize.pointops` routines `peakdetect2d`, `pointset_center`,
  * `pointset_order`).
  *
  * Division of labor at scale: the IMAGE is produced by the distributed
  * binning engine (a bounded 2-D histogram — the only pass over event
  * data); everything here operates on that plot-sized dense grid on the
  * driver, exactly like the reference operates on the pre-binned slice.
  */
object FeatureDetection {

  /** A detected local maximum: sub-bin centroid-refined position + the
    * peak bin's amplitude. Row/col are in bin-index units. */
  final case class Peak(row: Double, col: Double, amp: Double)

  /** Ordered landmark set (add_features semantics): `center` plus the
    * `rotsym` outer vertices ordered by angle; geometric summary
    * distances and the rotational-symmetry deviation score. */
  final case class Features(
      center: (Double, Double),
      outer: IndexedSeq[(Double, Double)],
      includeCenter: Boolean,
      meanCenterVertexDist: Double,
      meanVertexVertexDist: Double,
      symmetryScore: Double)

  /** Local-maximum peak detection on a dense 2-D image (the `maxlist`
    * method of symmetrize.pointops.peakdetect2d): a bin is a peak when
    * it attains the maximum of its (2·radius+1)² neighborhood and its
    * amplitude exceeds `ampFraction` of the image maximum. Plateau ties
    * keep the first bin in scan order. Positions are refined to the
    * 3×3 intensity centroid around the peak bin (sub-bin accuracy, the
    * role of the reference's source-detection centroiding). */
  def peakDetect2d(img: Array[Array[Double]], radius: Int = 4,
                   ampFraction: Double = 0.1): Seq[Peak] = {
    require(radius >= 1, "radius must be >= 1")
    val nr = img.length
    val nc = if (nr == 0) 0 else img(0).length
    var gmax = Double.NegativeInfinity
    var r = 0
    while (r < nr) { var c = 0; while (c < nc) {
      if (img(r)(c) > gmax) gmax = img(r)(c); c += 1 }; r += 1 }
    if (gmax <= 0.0) return Nil
    val thr = ampFraction * gmax
    val out = scala.collection.mutable.ArrayBuffer.empty[Peak]
    r = 0
    while (r < nr) {
      var c = 0
      while (c < nc) {
        val v = img(r)(c)
        if (v > thr) {
          // strict max over later bins, >= over earlier bins: exactly one
          // winner per plateau (the first in scan order)
          var isMax = true
          var dr = -radius
          while (isMax && dr <= radius) {
            var dc = -radius
            while (isMax && dc <= radius) {
              val rr = r + dr; val cc = c + dc
              if ((dr != 0 || dc != 0) && rr >= 0 && rr < nr && cc >= 0 && cc < nc) {
                val w = img(rr)(cc)
                val earlier = dr < 0 || (dr == 0 && dc < 0)
                if (w > v || (w == v && earlier)) isMax = false
              }
              dc += 1
            }
            dr += 1
          }
          if (isMax) {
            // 3x3 centroid refinement around the peak bin
            var m = 0.0; var mr = 0.0; var mc = 0.0
            var dr2 = -1
            while (dr2 <= 1) {
              var dc2 = -1
              while (dc2 <= 1) {
                val rr = r + dr2; val cc = c + dc2
                if (rr >= 0 && rr < nr && cc >= 0 && cc < nc) {
                  val w = img(rr)(cc)
                  m += w; mr += w * rr; mc += w * cc
                }
                dc2 += 1
              }
              dr2 += 1
            }
            out += Peak(if (m > 0) mr / m else r.toDouble,
              if (m > 0) mc / m else c.toDouble, v)
          }
        }
        c += 1
      }
      r += 1
    }
    out.sortBy(p => -p.amp).toSeq
  }

  /** add_features (momentum.py:351): n == rotsym ⇒ no center present,
    * center = centroid of the points (`pointset_center(method="centroid")`);
    * n == rotsym+1 ⇒ the point nearest the centroid IS the center
    * (`method="centroidnn"`), the rest are the outer vertices. Outer
    * points are ordered by angle about the center (`pointset_order`,
    * ccw = ascending angle, cw = descending). The symmetry score is the
    * rotational deviation: mean distance between each ordered vertex
    * rotated by 2π/rotsym about the center and its successor, normalized
    * by the mean center-vertex radius (0 = perfect rotsym symmetry). */
  def addFeatures(points: Seq[(Double, Double)], rotsym: Int = 6,
                  direction: String = "ccw"): Features = {
    require(points.size == rotsym || points.size == rotsym + 1,
      s"found ${points.size} points, but $rotsym or ${rotsym + 1} (incl. center) required")
    require(direction == "ccw" || direction == "cw", s"bad direction $direction")
    val cx0 = points.map(_._1).sum / points.size
    val cy0 = points.map(_._2).sum / points.size
    val (center, outer0, includeCenter) =
      if (points.size == rotsym) ((cx0, cy0), points, false)
      else {
        val c = points.minBy(p => dist2(p, (cx0, cy0)))
        (c, points.filterNot(_ == c), true)
      }
    val ordered0 = outer0.sortBy(p => math.atan2(p._2 - center._2, p._1 - center._1))
    val ordered = (if (direction == "ccw") ordered0 else ordered0.reverse).toIndexedSeq
    val radii = ordered.map(p => math.sqrt(dist2(p, center)))
    val mcv = radii.sum / rotsym
    val mvv = ordered.indices.map { i =>
      math.sqrt(dist2(ordered(i), ordered((i + 1) % rotsym)))
    }.sum / rotsym
    val ang = 2.0 * math.Pi / rotsym * (if (direction == "ccw") 1 else -1)
    val (ca, sa) = (math.cos(ang), math.sin(ang))
    val dev = ordered.indices.map { i =>
      val (px, py) = (ordered(i)._1 - center._1, ordered(i)._2 - center._2)
      val rot = (center._1 + ca * px - sa * py, center._2 + sa * px + ca * py)
      math.sqrt(dist2(rot, ordered((i + 1) % rotsym)))
    }.sum / rotsym
    Features(center, ordered, includeCenter, mcv, mvv,
      if (mcv > 0) dev / mcv else 0.0)
  }

  /** The symmetrization TARGETS for the detected features: the ideal
    * regular `rotsym`-gon about the detected center with radius = the
    * mean center-vertex distance, vertex 0 at the first ordered vertex's
    * angle (the reference's arot = [0, 360/rotsym, ...] with ascale = 1
    * applied to the mean-distance circle). Feed (features.outer [+center],
    * idealPolygon [+center]) straight into MomentumCorrection.splineWarp. */
  def idealPolygon(f: Features, rotsym: Int = 6): IndexedSeq[(Double, Double)] = {
    val a0 = math.atan2(f.outer.head._2 - f.center._2, f.outer.head._1 - f.center._1)
    // preserve the detected ordering direction so targets pair 1:1
    val cross = {
      val (x1, y1) = (f.outer.head._1 - f.center._1, f.outer.head._2 - f.center._2)
      val (x2, y2) = (f.outer(1)._1 - f.center._1, f.outer(1)._2 - f.center._2)
      x1 * y2 - y1 * x2
    }
    val step = 2.0 * math.Pi / rotsym * (if (cross >= 0) 1 else -1)
    (0 until rotsym).map { i =>
      (f.center._1 + f.meanCenterVertexDist * math.cos(a0 + i * step),
        f.center._2 + f.meanCenterVertexDist * math.sin(a0 + i * step))
    }
  }

  private def dist2(a: (Double, Double), b: (Double, Double)): Double = {
    val dx = a._1 - b._1; val dy = a._2 - b._2
    dx * dx + dy * dy
  }
}
