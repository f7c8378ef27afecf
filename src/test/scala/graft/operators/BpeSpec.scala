package graft.operators

import graft.SparkSpecBase
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.BpeEncode

/** Iterative BPE fit + apply (Sennrich et al. 2016): the hand-computed
  * classic example, greedy ≡ double-replace equivalence, and the
  * vocab-join apply path vs the native walker. */
class BpeSpec extends SparkSpecBase {
  import spark.implicits._

  // the paper's example vocabulary: low×5 lower×2 newest×6 widest×3
  // (no end-of-word marker — graft's convention)
  private def sennrich = Seq(
    (1L, Array.fill(5)("low").mkString(" ")),
    (2L, Array.fill(2)("lower").mkString(" ")),
    (3L, Array.fill(6)("newest").mkString(" ")),
    (4L, Array.fill(3)("widest").mkString(" "))).toDF("doc_id", "text")

  test("bpeFit reproduces the hand-computed Sennrich merge sequence") {
    val got = Tokenizer.bpeFit(sennrich, "text", 8)
      .as[(Int, String, String, Long)].collect().toSeq
    val expected = Seq(
      (1, "e", "s", 9L), (2, "es", "t", 9L), (3, "l", "o", 7L),
      (4, "lo", "w", 7L), (5, "e", "w", 6L), (6, "ew", "est", 6L),
      (7, "n", "ewest", 6L), (8, "d", "est", 3L))
    assert(got.sortBy(_._1) == expected)
  }

  test("bpeFit stops early when no pairs remain") {
    val tiny = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val got = Tokenizer.bpeFit(tiny, "text", 10)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got == Seq((1, "a", "b", 2L))) // after (a,b) the word is one symbol
  }

  test("double-replace merge rewriting equals the greedy walker (overlap adversarial)") {
    // 'aaaa': greedy (a,a) -> [aa, aa]; a single string replace would
    // leave [aa, a, a] — the second pass must recover the skipped merge
    val docs = Seq((1L, "aaaa aaa aaaa"), (2L, "aabaa aaaa")).toDF("doc_id", "text")
    val (merges, vocab) = Tokenizer.bpeFitWithVocab(docs, "text", 3)
    val mseq = merges.as[(Int, String, String, Long)].collect()
      .sortBy(_._1).map(m => (m._2, m._3)).toSeq
    val viaVocab = Tokenizer.bpeApplyTrained(docs, "doc_id", "text", vocab)
    val viaWalker = docs
      .select(col("doc_id"),
        BpeEncode(TextFunctions.tokens(col("text")), mseq).as("__syms"))
      .select(col("doc_id"), size(col("__syms")).cast("long").as("n_bpe_tokens"),
        md5(concat_ws(" ", col("__syms")).cast("binary")).as("bpe_md5"))
    assert(viaVocab.collect().toSet == viaWalker.collect().toSet)
  }

  test("bpeApplyTrained agrees with the native greedy walker on the real corpus") {
    val docs = documents.limit(120).cache()
    val (merges, vocab) = Tokenizer.bpeFitWithVocab(docs, "text", 8)
    val mseq = merges.as[(Int, String, String, Long)].collect()
      .sortBy(_._1).map(m => (m._2, m._3)).toSeq
    val viaVocab = Tokenizer.bpeApplyTrained(docs, "doc_id", "text", vocab)
    val viaWalker = docs
      .select(col("doc_id"),
        BpeEncode(TextFunctions.tokens(col("text")), mseq).as("__syms"))
      .select(col("doc_id"), size(col("__syms")).cast("long").as("n_bpe_tokens"),
        md5(concat_ws(" ", col("__syms")).cast("binary")).as("bpe_md5"))
    assert(viaVocab.collect().toSet == viaWalker.collect().toSet)
    docs.unpersist()
    ()
  }

  test("BpeEncode: out-of-vocabulary words char-split, merges apply in order") {
    val merges = Seq(("a", "b"), ("ab", "c"))
    val got = Seq(Tuple1("abc xyz ab")).toDF("t")
      .select(BpeEncode(TextFunctions.tokens(col("t")), merges).as("s"))
      .as[Seq[String]].head()
    assert(got == Seq("abc", "x", "y", "z", "ab"))
  }

  test("more merges never increase the encoded token count") {
    val docs = documents.limit(80).cache()
    def total(k: Int): Long = {
      val (_, vocab) = Tokenizer.bpeFitWithVocab(docs, "text", k)
      Tokenizer.bpeApplyTrained(docs, "doc_id", "text", vocab)
        .agg(sum("n_bpe_tokens")).as[Long].head()
    }
    val t2 = total(2); val t8 = total(8)
    val chars = docs.select(sum(length(regexp_replace(col("text"), "\\s+", ""))))
      .as[Long].head()
    docs.unpersist()
    assert(t8 <= t2 && t2 <= chars)
  }
}
