package graft.calibrate

/** Tiny dense linear-algebra helpers for the driver-side calibration fits
  * (landmark/peak counts are at most a few hundred — this is deliberately
  * NOT distributed math; the results are broadcast into Column plans).
  */
private[calibrate] object LinAlg {

  /** Solve A·x = b in place via Gaussian elimination with partial
    * pivoting. A is n×n row-major; returns x. */
  def solve(aIn: Array[Double], bIn: Array[Double], n: Int): Array[Double] = {
    val a = aIn.clone(); val b = bIn.clone()
    var col = 0
    while (col < n) {
      var p = col
      var i = col + 1
      while (i < n) { if (math.abs(a(i * n + col)) > math.abs(a(p * n + col))) p = i; i += 1 }
      require(math.abs(a(p * n + col)) > 1e-12, "singular system")
      if (p != col) {
        var j = 0
        while (j < n) { val t = a(col * n + j); a(col * n + j) = a(p * n + j); a(p * n + j) = t; j += 1 }
        val t = b(col); b(col) = b(p); b(p) = t
      }
      i = col + 1
      while (i < n) {
        val f = a(i * n + col) / a(col * n + col)
        var j = col
        while (j < n) { a(i * n + j) -= f * a(col * n + j); j += 1 }
        b(i) -= f * b(col)
        i += 1
      }
      col += 1
    }
    val x = new Array[Double](n)
    var i2 = n - 1
    while (i2 >= 0) {
      var s = b(i2)
      var j = i2 + 1
      while (j < n) { s -= a(i2 * n + j) * x(j); j += 1 }
      x(i2) = s / a(i2 * n + i2)
      i2 -= 1
    }
    x
  }

  /** Least-squares polynomial fit of degree `deg` (normal equations):
    * returns coefficients highest order first (numpy.polyfit layout). */
  def polyfit(xs: Array[Double], ys: Array[Double], deg: Int): Array[Double] = {
    val n = deg + 1
    val ata = new Array[Double](n * n)
    val atb = new Array[Double](n)
    var k = 0
    while (k < xs.length) {
      val pows = new Array[Double](n)
      var p = 1.0
      var j = n - 1
      while (j >= 0) { pows(j) = p; p *= xs(k); j -= 1 } // pows(j) = x^(n-1-j)
      var i = 0
      while (i < n) {
        atb(i) += pows(i) * ys(k)
        var j2 = 0
        while (j2 < n) { ata(i * n + j2) += pows(i) * pows(j2); j2 += 1 }
        i += 1
      }
      k += 1
    }
    solve(ata, atb, n)
  }

  /** Evaluate a polynomial with coefficients highest order first. */
  def polyval(coeffs: Array[Double], x: Double): Double = {
    var acc = 0.0
    var i = 0
    while (i < coeffs.length) { acc = acc * x + coeffs(i); i += 1 }
    acc
  }
}
