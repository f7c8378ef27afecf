package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives over `array<float>` columns.
  *
  * All math is promoted to double and folded sequentially in index order
  * (`aggregate` is a left fold), so results are bit-identical to any other
  * engine that sums left-to-right in double — the DuckDB oracles use
  * `list_reduce`, which has the same guarantee. Everything here is pure
  * Column algebra: map-only, no UDFs, stays inside whole-stage codegen.
  */
object VectorFunctions {

  /** Dot product in double precision, left-to-right over the index —
    * a native codegen expression (graft.plans.FloatVecDot), not an
    * interpreted higher-order-function fold. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.FloatVecDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Dot of a float-vector column with a literal hyperplane (values must be
    * float-exact, e.g. ±1 LSH planes). */
  def dotLit(a: Column, w: Seq[Double]): Column =
    dot(a, lit(w.map(_.toFloat).toArray))

  // ---- DuckDB oracle emitters (list_reduce = same sequential fold) ----

  def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(generate_series(1, len($a)), i -> " +
      s"CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (acc, v) -> acc + v)"

  def cosineSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})))"

  // ---------------------------------------------------------------------
  // Deterministic pseudo-random hyperplanes for sign-LSH
  // ---------------------------------------------------------------------

  /** splitmix64 — the standard public-domain 64-bit mixer. */
  def splitmix64(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** ±1 hyperplane for (table, bit) over `dim` dimensions, derived from
    * splitmix64 — deterministic, so driver and any executor agree. */
  def signPlane(table: Int, bit: Int, dim: Int): Seq[Double] =
    (0 until dim).map { i =>
      if (((splitmix64(table.toLong * 1000003L + bit * 7919L + i) >>> 13) & 1L) == 0L) -1.0 else 1.0
    }
}
