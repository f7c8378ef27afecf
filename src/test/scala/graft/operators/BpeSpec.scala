package graft.operators

import graft.SparkSpecBase
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.BpeEncode

/** Iterative BPE fit + apply (Sennrich et al. 2016): the hand-computed
  * classic example, the greedy-fold merge rewrite vs a reference
  * learn_bpe simulation (long-run fuzz — the inputs where a string
  * replace diverges), and the vocab-join apply path vs the native
  * walker. */
class BpeSpec extends SparkSpecBase {
  import spark.implicits._

  /** Plain-Scala reference learn_bpe (Sennrich 2016): word table with
    * freq, per round count pairs → (cnt DESC, l ASC, r ASC) argmax →
    * one greedy left-to-right merge pass per word. The ground truth the
    * engine fit must reproduce exactly. */
  private def refFit(corpus: Seq[String], k: Int)
      : (Seq[(Int, String, String, Long)], Map[String, Vector[String]]) = {
    val freq: Map[String, Long] = corpus.flatMap(_.trim.split("\\s+"))
      .filter(_.nonEmpty).groupBy(identity).map { case (w, o) => w -> o.size.toLong }
    var enc: Map[String, Vector[String]] = freq.keys.map(w =>
      w -> w.codePoints().toArray.toVector
        .map(cp => new String(Character.toChars(cp)))).toMap
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var step = 1
    var done = false
    while (step <= k && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, syms) <- enc; i <- 0 until syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        counts(p) = counts.getOrElse(p, 0L) + freq(w)
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), cnt) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        merges += ((step, l, r, cnt))
        enc = enc.map { case (w, syms) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              b += l + r; i += 2
            } else { b += syms(i); i += 1 }
          }
          w -> b.result()
        }
        step += 1
      }
    }
    (merges.result(), enc)
  }

  /** The engine fit's (merges, per-word encodings), comparable shape. */
  private def engineFit(text: String, k: Int)
      : (Seq[(Int, String, String, Long)], Map[String, Vector[String]]) = {
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val (merges, vocab) = Tokenizer.bpeFitWithVocab(docs, "text", k)
    val m = merges.as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    val e = vocab.select("w", "ws").as[(String, String)].collect()
      .map { case (w, ws) =>
        w -> ws.split(Tokenizer.Sep).filter(_.nonEmpty).toVector
      }.toMap
    (m, e)
  }

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

  test("l == r merges on runs of 5+ pair off greedily (where string replace diverges)") {
    // 'aaaaa' under merge (a,a): greedy = [aa, aa, a]; a non-overlapping
    // string replace of ·a·a· (even applied twice) yields [aa, a, aa]
    // because the match consumes the shared boundary separator — the
    // first diverging input class, length-5 runs
    val (merges, enc) = engineFit("aaaaa aaaaaa aaaaaaa", 2)
    assert(merges == Seq((1, "a", "a", 15L), (2, "aa", "aa", 5L)))
    assert(enc == Map(
      "aaaaa" -> Vector("aaaa", "a"),
      "aaaaaa" -> Vector("aaaa", "aa"),
      "aaaaaaa" -> Vector("aaaa", "aa", "a")))
  }

  test("fit equals the reference learn_bpe simulation (long-run fuzz)") {
    val rnd = new scala.util.Random(911)
    for (trial <- 1 to 12) {
      val text = Seq.fill(5 + rnd.nextInt(5)) {
        (0 until 1 + rnd.nextInt(9))
          .map(_ => if (rnd.nextInt(3) == 0) "b" else "a").mkString
      }.mkString(" ")
      val (gotM, gotE) = engineFit(text, 4)
      val (refM, refE) = refFit(Seq(text), 4)
      assert(gotM == refM, s"merge table, trial $trial corpus '$text'")
      assert(gotE == refE, s"encodings, trial $trial corpus '$text'")
    }
  }

  test("fold merge rewriting equals the greedy walker (overlap adversarial)") {
    // 'aaaa': greedy (a,a) -> [aa, aa]; a single string replace would
    // leave [aa, a, a] — the greedy fold must not skip the second merge
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
