package graft.plans

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.CharRunCounts

import graft.SparkSpecBase

/** r17 optimization gate for q_char_entropy's fused scan: the native
  * CharRunCounts expression must reproduce the count MULTISET of the
  * round-11 formulation — `array_sort(regexp_extract_all(text,
  * '[\\s\\S]', 0))` run-cut — character for character, and the whole
  * entropy_u derivation must be bit-identical through it (the oracle is
  * unchanged, so any drift here is a driver-gate hash mismatch). */
class CharEntropySpec extends SparkSpecBase {
  import spark.implicits._

  private val fixtures = Seq(
    "hello world",
    "aaaaaaa",                       // single-char flood
    "",                              // empty → empty counts
    " \t\n mixed\nws ",              // whitespace classes ([\s\S] keeps them)
    "naïve café — über",             // 2-byte UTF-8
    "数据 大模型 数据",              // 3-byte UTF-8, repeats
    "mixed ascii 数据 and ïï",
    "a😀b😀",    // 4-byte UTF-8 (supplementary plane):
                                     // the one case where per-code-point
                                     // regex matching vs CodePoints
                                     // decoding could plausibly diverge
    "z" * 1000 + "ab" * 17,          // long run + tail
    (0 until 257).map(i => ('!' + i % 90).toChar).mkString
  )

  /** The pre-r17 formulation, verbatim (regex char array + sort + run-cut). */
  private def legacyCounts(c: org.apache.spark.sql.Column) = {
    val cs = array_sort(regexp_extract_all(c, lit("[\\s\\S]"), lit(0)))
    val st = filter(sequence(lit(0), size(cs) - 1),
      i => (i === 0) || (get(cs, i) =!= get(cs, i - 1)))
    transform(sequence(lit(0), size(st) - 1),
      j => (coalesce(get(st, j + 1), size(cs)) - get(st, j)).cast("long"))
  }

  test("CharRunCounts == legacy regex run-cut counts (as multisets) on every fixture") {
    // the empty string is compared through the query's own filter
    // (size >= 1): the legacy run-cut alone yields [0] for "" — an
    // artifact of sequence(0, -1) descending — which q_char_entropy
    // always filtered out BEFORE counting (and the fused path's empty
    // array is filtered identically; the third test pins that)
    val nonEmpty = fixtures.filter(_.nonEmpty)
    val df = nonEmpty.toDF("text")
      .select(
        array_sort(CharRunCounts(col("text"))).as("fused"),
        array_sort(legacyCounts(col("text"))).as("legacy"))
    val rows = df.collect()
    assert(rows.length == nonEmpty.length)
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"fused=${r.getSeq[Long](0)} legacy=${r.getSeq[Long](1)}")
    }
  }

  test("entropy_u derivation is bit-identical through the fused counts") {
    def lnU(x: org.apache.spark.sql.Column) =
      floor(round(log(x.cast("double")), 6) * 1000000 + 0.5).cast("long")
    def entropyOf(df: org.apache.spark.sql.DataFrame,
                  cnts: org.apache.spark.sql.Column) =
      df.withColumn("__cnts", cnts)
        .withColumn("__n", aggregate(col("__cnts"), lit(0L), (acc, c) => acc + c))
        .withColumn("__S",
          aggregate(col("__cnts"), lit(0L), (acc, c) => acc + c * lnU(c)))
        .select(col("text"), col("__n").as("n"),
          size(col("__cnts")).cast("long").as("d"),
          (lnU(col("__n")) - expr("__S div __n")).as("h"))
    val base = fixtures.filter(_.nonEmpty).toDF("text")
    val fused = entropyOf(base, CharRunCounts(col("text"))).collect()
    val legacy = entropyOf(base, legacyCounts(col("text"))).collect()
    assert(fused.toSeq == legacy.toSeq)
  }

  test("null text stays null; empty text yields an empty array (filter parity)") {
    val df = Seq[Option[String]](None, Some(""), Some("x"))
      .toDF("text")
      .select(CharRunCounts(col("text")).as("c"))
    val rows = df.collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getSeq[Long](0).isEmpty)
    assert(rows(2).getSeq[Long](0) == Seq(1L))
  }
}
