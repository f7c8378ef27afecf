package graft.sed

import graft.SparkSpecBase
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** The shared fertility report (PipelineQueries.fertilityReport): the
  * rows-only q_token_fertility_unigram entry runs the SAME arithmetic as
  * the oracle-green q_token_fertility — this pins that shared arithmetic
  * directly (hand-computable enc → exact integer ratios) and the unigram
  * entry's row shape. */
class FertilitySpec extends SparkSpecBase {
  import spark.implicits._

  test("report arithmetic is exact integer division on hand inputs") {
    val df = Seq(
      (1L, "alpha beta gamma", "s1"),
      (2L, "delta epsilon", "s1"),
      (3L, "zeta", "s2")).toDF("doc_id", "text", "source")
    val enc = Seq((1L, 7L, "x"), (2L, 5L, "x"), (3L, 2L, "x"))
      .toDF("doc_id", "__n_sub", "algorithm")
    val got = PipelineQueries.fertilityReport(df, enc)
      .select("source", "algorithm", "n_docs", "n_chars", "n_words", "n_sub",
        "chars_per_token_u", "fertility_u")
      .as[(String, String, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    // s1: chars 16+13=29, words 3+2=5, sub 12; s2: chars 4, words 1, sub 2
    assert(got == Seq(
      ("s1", "x", 2L, 29L, 5L, 12L, 29L * 1000000 / 12, 12L * 1000000 / 5),
      ("s2", "x", 1L, 4L, 1L, 2L, 2000000L, 2000000L)))
  }

  test("unigram fertility entry: one row per source, self-consistent ratios") {
    val rows = SparkEntryRows.fertilityUnigram(spark)
    assert(rows.nonEmpty)
    rows.foreach { case (_, algo, nDocs, nChars, nWords, nSub, cpt, fert) =>
      assert(algo == "unigram" && nDocs > 0 && nSub > 0)
      assert(cpt == nChars * 1000000 / nSub)
      assert(fert == nSub * 1000000 / nWords)
    }
    assert(rows.map(_._1).distinct.length == rows.length)
  }
}

/** Collects the q_token_fertility_unigram entry once (the fit is the
  * expensive part; shared across assertions). */
private object SparkEntryRows {
  def fertilityUnigram(spark: org.apache.spark.sql.SparkSession)
      : Seq[(String, String, Long, Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    graft.SparkEntry.queries("q_token_fertility_unigram")(spark, "/root/testdata/sf0.001")
      .select("source", "algorithm", "n_docs", "n_chars", "n_words", "n_sub",
        "chars_per_token_u", "fertility_u")
      .as[(String, String, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
  }
}
