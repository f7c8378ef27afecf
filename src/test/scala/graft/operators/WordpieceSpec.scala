package graft.operators

import graft.SparkSpecBase
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.BpeEncode

/** WordPiece training (Schuster & Nakajima 2012): likelihood-scored
  * merges vs BPE's count-scored ones, a reference-simulation fuzz, and
  * the vocab-join apply path vs the greedy walker. */
class WordpieceSpec extends SparkSpecBase {
  import spark.implicits._

  /** Plain-Scala reference WordPiece fit: per round, pair + symbol
    * counts, argmax of cnt/(cl·cr) (score DESC, l ASC, r ASC), greedy
    * left-to-right merge pass — the ground truth the engine must
    * reproduce exactly (score quotient computed with the same
    * double/double expression as the engine). */
  private def refWpFit(corpus: Seq[String], k: Int)
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
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      val syms = scala.collection.mutable.Map.empty[String, Long]
      for ((w, ss) <- enc) {
        ss.foreach(s => syms(s) = syms.getOrElse(s, 0L) + freq(w))
        for (i <- 0 until ss.length - 1) {
          val p = (ss(i), ss(i + 1))
          pairs(p) = pairs.getOrElse(p, 0L) + freq(w)
        }
      }
      if (pairs.isEmpty) done = true
      else {
        val ((l, r), cnt) = pairs.toSeq.minBy { case ((a, b), c) =>
          (-(c.toDouble / (syms(a).toDouble * syms(b).toDouble)), a, b)
        }
        merges += ((step, l, r, cnt))
        enc = enc.map { case (w, ss) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < ss.length) {
            if (i + 1 < ss.length && ss(i) == l && ss(i + 1) == r) {
              b += l + r; i += 2
            } else { b += ss(i); i += 1 }
          }
          w -> b.result()
        }
        step += 1
      }
    }
    (merges.result(), enc)
  }

  private def engineFit(text: String, k: Int)
      : (Seq[(Int, String, String, Long)], Map[String, Vector[String]]) = {
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val (merges, vocab) = Tokenizer.wordpieceFitWithVocab(docs, "text", k)
    val m = merges.as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    val e = vocab.select("w", "ws").as[(String, String)].collect()
      .map { case (w, ws) =>
        w -> ws.split(Tokenizer.Sep).filter(_.nonEmpty).toVector
      }.toMap
    (m, e)
  }

  test("likelihood scoring picks the rare-but-predictive pair BPE would skip") {
    // pair (a,b): cnt 20, but cl = 100, cr = 70 → score 20/7000 ≈ 0.0029
    // pair (x,y): cnt 3, cl = cr = 3          → score 3/9     ≈ 0.333
    // BPE (count argmax) merges (a,b) first; WordPiece merges (x,y)
    val text = (Seq.fill(20)("ab") ++ Seq.fill(80)("a") ++
      Seq.fill(50)("b") ++ Seq.fill(3)("xy")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val wp1 = Tokenizer.wordpieceFit(docs, "text", 1)
      .as[(Int, String, String, Long)].head()
    val bpe1 = Tokenizer.bpeFit(docs, "text", 1)
      .as[(Int, String, String, Long)].head()
    assert(wp1 == ((1, "x", "y", 3L)))
    assert(bpe1 == ((1, "a", "b", 20L)))
  }

  test("fit equals the reference WordPiece simulation (fuzz incl. long runs)") {
    val rnd = new scala.util.Random(1213)
    for (trial <- 1 to 10) {
      val text = Seq.fill(5 + rnd.nextInt(5)) {
        (0 until 1 + rnd.nextInt(9))
          .map(_ => "abc" (rnd.nextInt(3)).toString).mkString
      }.mkString(" ")
      val (gotM, gotE) = engineFit(text, 4)
      val (refM, refE) = refWpFit(Seq(text), 4)
      assert(gotM == refM, s"merge table, trial $trial corpus '$text'")
      assert(gotE == refE, s"encodings, trial $trial corpus '$text'")
    }
  }

  test("wordpieceApplyTrained agrees with the greedy walker on the corpus") {
    val docs = documents.limit(100).cache()
    val (merges, vocab) = Tokenizer.wordpieceFitWithVocab(docs, "text", 6)
    val mseq = merges.as[(Int, String, String, Long)].collect()
      .sortBy(_._1).map(m => (m._2, m._3)).toSeq
    val viaVocab = Tokenizer.wordpieceApplyTrained(docs, "doc_id", "text", vocab)
    val viaWalker = docs
      .select(col("doc_id"),
        BpeEncode(TextFunctions.tokens(col("text")), mseq).as("__syms"))
      .select(col("doc_id"), size(col("__syms")).cast("long").as("n_wp_tokens"),
        md5(concat_ws(" ", col("__syms")).cast("binary")).as("wp_md5"))
    assert(viaVocab.collect().toSet == viaWalker.collect().toSet)
    docs.unpersist()
    ()
  }
}
