package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Tokenizer fitting over a corpus — the counting passes behind BPE-style
  * vocabulary construction (Sennrich et al. 2016, arXiv:1508.07909).
  *
  * The scale trick is classic BPE: adjacent-pair statistics are computed
  * over the DISTINCT word vocabulary weighted by word frequency, never
  * over the corpus. One corpus-wide explode builds the (word, freq)
  * vocab (map-side partial counts, vocab-sized shuffle); the pair
  * explode then runs over |vocab| rows × word length — corpus-size-
  * independent. Top-k is a TakeOrdered (bounded heap per partition), no
  * global sort materialization; the (count DESC, pair ASC) total order
  * makes the cut deterministic under ties.
  */
object Tokenizer {

  /** Frequency-weighted adjacent character-pair counts — the argmax
    * candidates of a BPE merge step. Returns the `topK` (pair, cnt)
    * rows by (cnt DESC, pair ASC). */
  def bpePairCounts(docs: DataFrame, textCol: String, topK: Int): DataFrame = {
    val vocab = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
    vocab
      .filter(length(col("w")) >= 2)
      .select(col("freq"), explode(transform(
        sequence(lit(1), length(col("w")) - 1),
        i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy("pair").agg(sum("freq").as("cnt"))
      .orderBy(col("cnt").desc, col("pair").asc)
      .limit(topK)
  }

  /** DuckDB oracle for [[bpePairCounts]] over a (textCol) relation. */
  def bpePairCountsSql(table: String, textCol: String, topK: Int): String = {
    val toks = TextFunctions.tokensSql(textCol)
    s"""WITH v AS (SELECT w, COUNT(*) AS freq FROM (
           SELECT unnest($toks) AS w FROM $table) GROUP BY w),
       p AS (SELECT substr(w, i, 2) AS pair, freq FROM (
           SELECT w, freq, unnest(range(1, length(w))) AS i
           FROM v WHERE length(w) >= 2))
       SELECT pair, CAST(SUM(freq) AS BIGINT) AS cnt FROM p
       GROUP BY pair ORDER BY cnt DESC, pair ASC LIMIT $topK"""
      .replaceAll("\\s+", " ")
  }
}
