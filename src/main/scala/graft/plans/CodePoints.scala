// Same packaging rationale as FloatVecDot.scala.
package org.apache.spark.sql.graft

import org.apache.spark.unsafe.types.UTF8String

/** UTF-8 bytes → code-point array in ONE pass with ONE allocation — no
  * intermediate String copy, no IntStream machinery (the
  * `toString.codePoints().toArray` route measured ~7× slower on the
  * per-pair MatchExtend hot path at the 100× anchored-dedup receipt).
  * Pure-ASCII inputs take the no-copy path (n == bytes.length). Callers
  * index the result by code-point offset — the CharGramHashes60 / SQL
  * substring / DuckDB substr coordinate system. */
object CodePoints {
  def of(s: UTF8String): Array[Int] = {
    val b = s.getBytes
    val out = new Array[Int](b.length)
    var i = 0
    var n = 0
    while (i < b.length) {
      val b0 = b(i) & 0xFF
      if (b0 < 0x80) { out(n) = b0; i += 1 }
      else if (b0 < 0xE0) {
        out(n) = ((b0 & 0x1F) << 6) | (b(i + 1) & 0x3F); i += 2
      } else if (b0 < 0xF0) {
        out(n) = ((b0 & 0x0F) << 12) | ((b(i + 1) & 0x3F) << 6) | (b(i + 2) & 0x3F)
        i += 3
      } else {
        out(n) = ((b0 & 0x07) << 18) | ((b(i + 1) & 0x3F) << 12) |
          ((b(i + 2) & 0x3F) << 6) | (b(i + 3) & 0x3F)
        i += 4
      }
      n += 1
    }
    if (n == b.length) out else java.util.Arrays.copyOf(out, n)
  }
}
