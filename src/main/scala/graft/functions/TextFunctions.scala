package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis and fingerprinting primitives for large-scale document
  * pipelines (dedup, language ID, quality scoring, token stats).
  *
  * Everything is built from higher-order array functions
  * (`transform`/`aggregate`/`zip_with`) over the in-row token array —
  * map-only, no explode+shuffle, fully inside codegen'd projection. The
  * cross-engine-deterministic token hash is the first 32 bits of md5, so
  * the DuckDB oracle can reproduce signatures bit-for-bit.
  */
object TextFunctions {

  /** Whitespace tokens. The input is trimmed first and empty tokens are
    * filtered: `split` emits "" at the boundaries for leading/trailing
    * whitespace (and for all-whitespace text), which would silently
    * inflate every token statistic and hash the empty string. */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => length(t) > 0)
  val tokensSql: String => String =
    t => s"list_filter(string_split_regex(trim($t), '\\s+'), t -> length(t) > 0)"

  /** 32-bit deterministic hash of a string: first 8 hex chars of md5.
    * (SQL-expression form, usable inside lambda bodies.) */
  def hash32Expr(x: String): String =
    s"CAST(conv(substring(md5($x), 1, 8), 16, 10) AS BIGINT)"
  def hash32Sql(x: String): String =
    s"(('0x' || substr(md5($x), 1, 8))::BIGINT)"

  // ---------------------------------------------------------------------
  // MinHash (shingle → k permutations → signature)
  // ---------------------------------------------------------------------

  /** Prime just above 2^32 for the universal-hash permutation family. */
  val MinhashP: Long = 4294967311L
  /** Deterministic permutation coefficients; A_j < 2^28 so A*h < 2^63. */
  def minhashA(j: Int): Long = 976369L + 15485863L * j
  def minhashB(j: Int): Long = 1000003L * j + 12345L

  /** Word n-gram shingles of the token array (null-safe for < n tokens:
    * caller filters `size(tokens) >= n`). */
  def shingles(toks: Column, n: Int): Column =
    transform(sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k + 1)): _*))

  /** shinglesSql — via lateral generate_series in DuckDB (no ORDINALITY):
    * emitted inline by the query builders. */

  // The signature computation itself is the native codegen expression
  // org.apache.spark.sql.graft.MinHashSigs: sig_j = min over shingle
  // hashes h of (A_j·h + B_j) mod P, seeded with P — coefficients live
  // HERE (minhashA/minhashB/MinhashP) so there is a single definition.

  /** 32-bit shingle/token hash as a Column (first 8 md5 hex chars). */
  def expr_hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** LSH band key combining `rows` consecutive signature values (base-31
    * polynomial — exact in int64: sig < 2^33, 31^3·2^33 < 2^63). */
  def bandKey(sigs: Seq[Column]): Column =
    sigs.reduce((a, b) => a * lit(31L) + b)

  // ---------------------------------------------------------------------
  // SimHash (32-bit) — the per-row vote loop is the native codegen
  // expression org.apache.spark.sql.graft.SimHash32 over pre-hashed
  // tokens; only the oracle emitter lives here.
  // ---------------------------------------------------------------------

  /** DuckDB oracle for simhash32 over a doc table with (doc_id, text). */
  def simhash32Sql(table: String): String = {
    val sums = (0 until 32)
      .map(b => s"SUM(CASE WHEN ((x >> $b) & 1) = 1 THEN 1 ELSE -1 END) AS b$b")
      .mkString(", ")
    val fp = (0 until 32)
      .map(b => s"(CASE WHEN b$b > 0 THEN ${1L << b} ELSE 0 END)")
      .mkString(" + ")
    s"""SELECT doc_id, CAST($fp AS BIGINT) AS simhash FROM (
       SELECT doc_id, $sums FROM (
         SELECT doc_id, ${hash32Sql("tok")} AS x FROM (
           SELECT doc_id, UNNEST(${tokensSql("text")}) AS tok FROM $table))
       GROUP BY doc_id)""".replaceAll("\\s+", " ")
  }

  // ---------------------------------------------------------------------
  // Language ID / quality / token stats / fingerprint
  // ---------------------------------------------------------------------

  /** Marker-word languages for the n-gram/stopword language heuristic. */
  val LangMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|to|in)\\b",
    "es" -> "\\b(el|la|de|los|que)\\b",
    "de" -> "\\b(der|die|das|und|ist)\\b",
    "fr" -> "\\b(le|les|des|est|une)\\b")

  def markerCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))
  def markerCountSql(text: String, pattern: String): String =
    s"len(regexp_extract_all($text, '$pattern'))"

  /** Position-weighted rolling fingerprint:
    * Σ_i i·(31·len(tok_i) + ascii(tok_i)), i 1-based. Order-sensitive (a
    * permuted document fingerprints differently), integer-exact. */
  def fingerprint(toks: Column): Column =
    aggregate(
      transform(toks, (x, i) =>
        (i.cast("long") + 1L) * (lit(31L) * length(x) + ascii(x))),
      lit(0L), (a, b) => a + b)

  def fingerprintSql(table: String): String =
    s"""SELECT doc_id, CAST(SUM(i * (31 * length(l[i]) + ascii(l[i]))) AS BIGINT) AS fp FROM (
       SELECT doc_id, ${tokensSql("text")} AS l FROM $table),
       UNNEST(generate_series(1, len(l))) AS g(i) GROUP BY doc_id"""
      .replaceAll("\\s+", " ")
}
