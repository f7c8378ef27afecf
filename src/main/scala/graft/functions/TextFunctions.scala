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

  // ---------------------------------------------------------------------
  // PII scrubbing (emails / IPv4 / phone numbers)
  // ---------------------------------------------------------------------

  /** PII patterns, written in the common subset of Java regex (Spark's
    * `regexp_replace`) and RE2 (DuckDB) so the oracle substitutes
    * byte-identically: no backreferences, no lookaround, `\b`/`\d` and
    * bounded repetition only. Substitution order is emails → IPv4 →
    * phones; each later pattern runs on the already-redacted text, so a
    * dotted host inside an email can't double-match as an address. */
  val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pat = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhonePat = "\\+\\d{1,2}-\\d{3}-\\d{3}-\\d{4}"

  /** Sequential PII redaction: emails, then IPv4 literals, then
    * international-format phone numbers, each replaced by a typed tag.
    * Map-only codegen'd regexp chain — the shape of the scrubbing pass a
    * training-data pipeline runs over every document before anything
    * else sees the text. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPat, "[EMAIL]"),
        Ipv4Pat, "[IP]"),
      PhonePat, "[PHONE]")

  def redactPiiSql(text: String): String =
    s"""regexp_replace(regexp_replace(regexp_replace($text,
        '$EmailPat', '[EMAIL]', 'g'), '$Ipv4Pat', '[IP]', 'g'),
        '$PhonePat', '[PHONE]', 'g')""".replaceAll("\\s+", " ")

  // ---------------------------------------------------------------------
  // Hashed-linear quality classifier (fastText-style inference)
  // ---------------------------------------------------------------------

  /** Integer micro-unit weight of hashed-feature bucket `i` (a column
    * expression over an int column): deterministic in [-1000, 1000],
    * derived from the same cross-engine md5 hash as everything else —
    * the oracle recomputes the identical "model". A real deployment
    * swaps this for a broadcast weight array learned offline; the
    * inference plan (hash → bucket → weight → sum) is unchanged. */
  private def bucketWeight(idx: Column): Column =
    expr_hash32(concat(lit("w:"), idx.cast("string"))) % 2001L - 1000L

  /** Linear text-classifier inference over hashing-trick features
    * (Weinberger et al. 2009; the fastText / CCNet quality-filter
    * shape): each token hashes to one of `dim` buckets and the document
    * score is the sum of bucket weights, in exact integer micro-units —
    * order-independent, so the oracle matches bit-for-bit with no float
    * drift. Map-only: the whole scoring pass is column algebra inside
    * the row, no shuffle, no model join. */
  def hashedLinearScoreU(toks: Column, dim: Int): Column = {
    require(dim > 0, "dim must be positive")
    aggregate(toks, lit(0L), (acc, t) => acc + bucketWeight(expr_hash32(t) % dim))
  }

  /** DuckDB twin of [[hashedLinearScoreU]] over a token-list fragment. */
  def hashedLinearScoreUSql(toksList: String, dim: Int): String = {
    val w = s"(${hash32Sql(s"'w:' || ((${hash32Sql("t")}) % $dim)::VARCHAR")} % 2001 - 1000)"
    s"CAST(coalesce(list_sum(list_transform($toksList, t -> $w)), 0) AS BIGINT)"
  }
}
