package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.UnigramViterbi

/** Unigram-LM tokenizer (Kudo 2018): Viterbi optimality against
  * brute-force segmentation enumeration, seed inventory hand-check,
  * hard-EM likelihood monotonicity, OOV coverage, determinism, and the
  * apply join-path equivalence. */
class UnigramSpec extends SparkSpecBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)

  /** All segmentations of w into pieces, scored like the expression. */
  private def bruteBest(w: String, pieces: Map[String, Long], unk: Long)
      : (Long, Seq[String]) = {
    def segs(s: String): Seq[Seq[String]] =
      if (s.isEmpty) Seq(Seq.empty)
      else (1 to s.length).flatMap { l =>
        val head = s.substring(0, l)
        val ok = pieces.contains(head) || l == 1
        if (!ok) Seq.empty else segs(s.substring(l)).map(head +: _)
      }
    def score(seg: Seq[String]): Long =
      seg.map(p => pieces.getOrElse(p, if (p.length == 1) unk else Long.MinValue)).sum
    // tie-break: the DP keeps the longer piece at each END position,
    // scanning backwards — replicate by comparing reversed length lists
    val best = segs(w).map(s => (score(s), s)).filter(_._1 > Long.MinValue / 2)
    val maxScore = best.map(_._1).max
    val winner = best.filter(_._1 == maxScore)
      .maxBy(_._2.reverse.map(_.length).toSeq)(
        math.Ordering.Implicits.seqOrdering[Seq, Int])
    (maxScore, winner._2)
  }

  test("UnigramViterbi equals brute-force best segmentation incl. tie-break") {
    for (_ <- 1 to 60) {
      val alpha = "ab" + (if (rnd.nextBoolean()) "c" else "")
      val w = Seq.fill(2 + rnd.nextInt(6))(alpha(rnd.nextInt(alpha.length))).mkString
      val cand = (for {
        i <- 0 until w.length; j <- (i + 1) to math.min(w.length, i + 3)
      } yield w.substring(i, j)).distinct
      val pieces = cand.filter(_ => rnd.nextBoolean())
        .map(p => p -> (-1000000L - rnd.nextInt(5) * 500000L)).toMap ++
        w.map(c => c.toString -> -3000000L).toMap // chars always present
      val got = spark.range(1).select(UnigramViterbi(lit(w), pieces, Tokenizer.UnkLogpU))
        .as[Seq[String]].head()
      val (bs, bseg) = bruteBest(w, pieces, Tokenizer.UnkLogpU)
      assert(got.map(p => pieces(p)).sum == bs, s"score mismatch for '$w': $got")
      assert(got == bseg, s"tie-break mismatch for '$w': $got vs $bseg")
    }
  }

  test("UnigramViterbi: OOV chars fall back to the unk floor, empty word -> empty") {
    val pieces = Map("a" -> -1000000L, "ab" -> -1500000L)
    val got = spark.range(1).select(UnigramViterbi(lit("axb"), pieces, -9000000L))
      .as[Seq[String]].head()
    assert(got == Seq("a", "x", "b")) // x and b only exist via the floor
    assert(spark.range(1).select(UnigramViterbi(lit(""), pieces, -9000000L))
      .as[Seq[String]].head().isEmpty)
  }

  test("UnigramViterbi refuses piece tables over the MaxPieces reference-object limit") {
    // the table serializes into every task's plan — SentencePiece-scale
    // 1M-piece inventories must not ride inline (UnigramViterbi.MaxPieces
    // names the boundary; at the cap construction still succeeds)
    val over = (0 to org.apache.spark.sql.graft.UnigramViterbi.MaxPieces)
      .map(i => i.toString -> -1000000L).toMap
    val e = intercept[IllegalArgumentException] {
      org.apache.spark.sql.graft.UnigramViterbi(lit("x"), over, -9000000L)
    }
    assert(e.getMessage.contains("reference-object limit"))
    val at = over - "0"
    assert(at.size == org.apache.spark.sql.graft.UnigramViterbi.MaxPieces)
    org.apache.spark.sql.graft.UnigramViterbi(lit("x"), at, -9000000L) // no throw
  }

  test("UnigramViterbi walks code points: an astral char is one symbol, never a split surrogate") {
    val emoji = new String(Character.toChars(0x1F600)) // 😀, a surrogate pair in UTF-16
    val pieces = Map("a" -> -1000000L, emoji -> -1500000L, ("a" + emoji) -> -1200000L)
    val got = spark.range(1).select(UnigramViterbi(lit("a" + emoji + "a"), pieces, -9000000L))
      .as[Seq[String]].head()
    assert(got == Seq("a" + emoji, "a"))
    // an UNSEEN astral char falls back as ONE unk symbol, not two halves
    val oov = spark.range(1).select(UnigramViterbi(lit("a" + new String(Character.toChars(0x1F4A9))),
      Map("a" -> -1000000L), -9000000L)).as[Seq[String]].head()
    assert(oov == Seq("a", new String(Character.toChars(0x1F4A9))))
  }

  test("unigramSeed: hand-computed counts, chars always kept, top multi-char cut") {
    val docs = Seq((1L, "ab ab b")).toDF("doc_id", "text")
    // words: ab freq 2, b freq 1; substrings (maxLen 2):
    //   from ab: a(2), b(2), ab(2); from b: b(1)
    val got = Tokenizer.unigramSeed(docs, "text", 2, 1)
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.keySet == Set("a", "b", "ab"))
    assert(got("a")._1 == 2L && got("b")._1 == 3L && got("ab")._1 == 2L)
    // total over selected = 7; ln(2/7), ln(3/7) micro-quantized
    def m(p: Double) = math.floor(BigDecimal(math.log(p))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble * 1000000 + 0.5).toLong
    assert(got("a")._2 == m(2.0 / 7) && got("b")._2 == m(3.0 / 7) && got("ab")._2 == m(2.0 / 7))
    // seedSize=1 keeps only ONE multi-char piece even if more exist
    val got2 = Tokenizer.unigramSeed(Seq((1L, "ab cd")).toDF("doc_id", "text"), "text", 2, 1)
      .as[(String, Long, Long)].collect().map(_._1).toSet
    assert(got2.count(_.length > 1) == 1)
    assert(Set("a", "b", "c", "d").subsetOf(got2))
  }

  test("unigramFit: hard-EM Viterbi likelihood is non-decreasing over rounds") {
    val docs = Seq(
      (1L, Array.fill(6)("abab").mkString(" ")),
      (2L, Array.fill(3)("abc").mkString(" ")),
      (3L, Array.fill(2)("cab babab").mkString(" "))).toDF("doc_id", "text")
    val words = Seq(("abab", 6L), ("abc", 3L), ("cab", 2L), ("babab", 2L))
    def objective(model: Map[String, Long]): Long = words.map { case (w, f) =>
      f * bruteBest(w, model, Tokenizer.UnkLogpU)._1
    }.sum
    val objs = (1 to 3).map { r =>
      val m = Tokenizer.unigramFit(docs, "text", 4, 50, r, 50)
        .as[(String, Long)].collect().toMap
      objective(m)
    }
    assert(objs == objs.sorted, s"likelihood regressed across rounds: $objs")
    // and the fit is deterministic
    val again = Tokenizer.unigramFit(docs, "text", 4, 50, 3, 50)
      .as[(String, Long)].collect().toMap
    val first = Tokenizer.unigramFit(docs, "text", 4, 50, 3, 50)
      .as[(String, Long)].collect().toMap
    assert(again == first)
  }

  test("unigramFit: every char survives, vocab cap respected, pieces score negatively") {
    val docs = Seq((1L, "xyz zy xxyyzz xyz")).toDF("doc_id", "text")
    val fit = Tokenizer.unigramFit(docs, "text", 3, 100, 2, 2)
      .as[(String, Long)].collect()
    val chars = fit.map(_._1).filter(_.length == 1).toSet
    assert(Set("x", "y", "z").subsetOf(chars))
    assert(fit.count(_._1.length > 1) <= 2)
    assert(fit.forall(_._2 < 0))
  }

  test("unigramApplyTrained (join path) equals direct per-token Viterbi") {
    val docs = Seq(
      (1L, "abab abc cab"), (2L, "abab abab"), (3L, "zq abc")).toDF("doc_id", "text")
    val pieces = Tokenizer.unigramFit(docs, "text", 4, 50, 2, 50)
      .as[(String, Long)].collect().toMap
    val viaJoin = Tokenizer.unigramApplyTrained(docs, "doc_id", "text", pieces)
      .as[(Long, Long, String)].collect().toSet
    val direct = docs
      .select(col("doc_id"), posexplode(graft.functions.TextFunctions.tokens(col("text")))
        .as(Seq("i", "w")))
      .select(col("doc_id"), col("i"),
        UnigramViterbi(col("w"), pieces, Tokenizer.UnkLogpU).as("__syms"))
      .groupBy("doc_id")
      .agg(sum(size(col("__syms"))).as("n_pieces"),
        collect_list(struct(col("i"), col("__syms"))).as("__parts"))
      .select(col("doc_id"), col("n_pieces"),
        md5(concat_ws(" ",
          flatten(transform(array_sort(col("__parts")), p => p("__syms"))))
          .cast("binary")).as("pieces_md5"))
      .as[(Long, Long, String)].collect().toSet
    assert(viaJoin == direct && viaJoin.size == 3)
  }
}
