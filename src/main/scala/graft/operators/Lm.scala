package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Self-trained n-gram language-model scoring — the perplexity-style
  * quality signal of CCNet-grade corpus pipelines (reference quality
  * analog: sed has no LM filter; this follows Kneser & Ney 1995 and the
  * KenLM formulation used by CCNet/RefinedWeb).
  */
object Lm {

  /** Interpolated Kneser-Ney bigram score per document.
    *
    * Fits the bigram model on the corpus itself (one groupBy over the
    * exploded bigram stream), smooths with absolute discount `discount`
    * interpolated against the CONTINUATION unigram
    * N1+(·w2) / N1+(··) — the count of distinct left-contexts a word
    * appears after, not its raw frequency — and scores every document by
    * its mean bigram log-probability:
    *
    *   P(w2|w1) = (c(w1,w2) − D)/c(w1) + D·N1+(w1·)/c(w1) · N1+(·w2)/N1+(··)
    *
    * Scale shape: model assembly is |bigram-types|-bounded (two
    * vocab-bounded aggs joined back on w1/w2), the only corpus-sized
    * exchange is the single join of the bigram stream to the model on the
    * bigram key (identical to the MLE scorer's), and N1+(··) rides a
    * broadcast 1-row aggregate. Log-probs are ROUND(6)-quantized then
    * summed as exact micro-unit longs, so the per-doc aggregation is
    * reduction-order-proof (bit-stable under any partitioning).
    *
    * Output: (doc_id, n_bigrams, lp_u, avg_lp).
    */
  def knScore(docs: DataFrame, idCol: String, textCol: String,
              discount: Double): DataFrame =
    knScoreWith(knModel(docs, textCol, discount), docs, idCol, textCol)

  /** The |bigram-types|-bounded KN model of a corpus: (b, lp) with lp the
    * ROUND(6) micro-unit log-prob. Fit ONCE offline and reuse across
    * [[knScoreWith]] calls (the streaming twin scores every arriving
    * micro-batch against this). */
  def knModel(docs: DataFrame, textCol: String, discount: Double): DataFrame = {
    require(discount > 0 && discount < 1, "KN discount must be in (0,1)")
    val bg = docs
      .withColumn("__toks", TextFunctions.tokens(col(textCol)))
      .filter(size(col("__toks")) >= 2)
      .select(explode(TextFunctions.shingles(col("__toks"), 2)).as("b"))
    // whitespace tokens can't contain spaces, so "w1 w2" splits exactly
    val bc = bg.groupBy("b").agg(count(lit(1)).as("c"))
      .withColumn("w1", substring_index(col("b"), " ", 1))
      .withColumn("w2", substring_index(col("b"), " ", -1))
    val uc = bc.groupBy("w1")
      .agg(sum("c").as("c1"), count(lit(1)).as("n1p_fwd"))
    val cont = bc.groupBy("w2").agg(count(lit(1)).as("n1p_rev"))
    val tot = bc.agg(count(lit(1)).as("tt"))
    bc.join(uc, "w1").join(cont, "w2").crossJoin(broadcast(tot))
      .withColumn("p",
        (col("c").cast("double") - lit(discount)) / col("c1").cast("double")
          + (lit(discount) * col("n1p_fwd").cast("double") / col("c1").cast("double"))
            * (col("n1p_rev").cast("double") / col("tt").cast("double")))
      .select(col("b"),
        floor(round(log(col("p")), 6) * 1000000 + 0.5).cast("long").as("lp"))
  }

  /** Score documents against a fitted [[knModel]]: one join of the
    * bigram stream to the model on the bigram key, then the
    * reduction-order-proof micro-unit per-doc sum. Bigrams absent from
    * the model drop (the fit corpus defines the event space). */
  def knScoreWith(model: DataFrame, docs: DataFrame, idCol: String,
                  textCol: String): DataFrame =
    docs
      .withColumn("__toks", TextFunctions.tokens(col(textCol)))
      .filter(size(col("__toks")) >= 2)
      .select(col(idCol),
        explode(TextFunctions.shingles(col("__toks"), 2)).as("b"))
      .join(model, "b")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), sum("lp").as("lp_u"))
      .select(col(idCol), col("n_bigrams"), col("lp_u"),
        (col("lp_u").cast("double") / col("n_bigrams") / 1e6).as("avg_lp"))
}
