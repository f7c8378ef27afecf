package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{MatchExtend, WinnowedAnchors}

/** Character-level exact substring dedup (Lee et al. 2021 ExactSubstr,
  * Spark-first): the exact per-position operator, the winnowing-anchored
  * scale path, and the expressions beneath them. */
class SubstringDedupSpec extends SparkSpecBase {
  import spark.implicits._

  private val rng = new scala.util.Random(42)
  private def randText(n: Int): String =
    (0 until n).map(_ => ('a' + rng.nextInt(26)).toChar).mkString

  private def spansOf(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[(Long, Long)]] =
    df.select("doc_id", "span_start", "span_end").as[(Long, Long, Long)]
      .collect().groupBy(_._1).map { case (d, xs) =>
        d -> xs.map(x => (x._2, x._3)).sorted.toSeq
      }

  /** Brute-force reference: positions in doc covered by an L-gram that
    * also occurs in a lower-id doc, merged into maximal intervals. */
  private def bruteSpans(docs: Seq[(Long, String)], L: Int): Map[Long, Seq[(Long, Long)]] = {
    val grams = docs.flatMap { case (id, t) =>
      (0 to t.length - L).map(p => (t.substring(p, p + L), id, p))
    }
    val minDoc = grams.groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).min }
    val hits = grams.filter { case (g, id, _) => id > minDoc(g) }
      .groupBy(_._2).map { case (id, xs) => id -> xs.map(_._3).sorted }
    hits.map { case (id, ps) =>
      val spans = ps.foldLeft(List.empty[(Long, Long)]) { case (acc, p) =>
        acc match {
          case (s, e) :: rest if p <= e => (s, math.max(e, p + L).toLong) :: rest
          case _ => (p.toLong, (p + L).toLong) :: acc
        }
      }.reverse
      id -> spans
    }
  }

  test("substringDedup: planted shared substring is trimmed in the later doc only") {
    val shared = randText(60)
    val docs = Seq(
      (1L, randText(50) + shared + randText(40)),
      (2L, randText(30) + shared + randText(70)),
      (3L, randText(100))).toDF("doc_id", "text")
    val got = spansOf(Dedup.substringDedup(docs, "doc_id", "text", 40))
    assert(!got.contains(1L)) // min-id doc keeps
    assert(!got.contains(3L)) // no shared content
    assert(got(2L) == Seq((30L, 90L))) // exactly the planted copy
  }

  test("substringDedup equals the brute-force L-gram union on random near-dup corpora") {
    val L = 12
    val base = randText(300)
    // docs sharing assorted chunks of `base` at varying offsets + noise
    val docs: Seq[(Long, String)] = (1L to 12L).map { id =>
      val nChunks = rng.nextInt(3)
      val parts = (0 until nChunks).map { _ =>
        val s = rng.nextInt(200); base.substring(s, s + 50 + rng.nextInt(50))
      }
      (id, (parts :+ randText(30 + rng.nextInt(100))).mkString(randText(3)))
    }
    val got = spansOf(Dedup.substringDedup(docs.toDF("doc_id", "text"), "doc_id", "text", L))
    assert(got == bruteSpans(docs, L))
  }

  test("substringDedup: a repeat longer than L merges into ONE maximal span") {
    val shared = randText(200)
    val docs = Seq((1L, shared), (2L, randText(20) + shared + randText(20)))
      .toDF("doc_id", "text")
    val got = spansOf(Dedup.substringDedup(docs, "doc_id", "text", 40))
    assert(got(2L) == Seq((20L, 220L)))
  }

  test("substringTrim re-assembles exactly the text outside the trim spans") {
    val shared1 = randText(50)
    val shared2 = randText(45)
    val mid = randText(20)
    val docs = Seq(
      (1L, shared1 + randText(30) + shared2),
      (2L, randText(10) + shared1 + mid + shared2 + randText(15)),
      (3L, randText(80))).toDF("doc_id", "text")
    val got = Dedup.substringTrim(docs, "doc_id", "text", 40)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    def md5(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // doc 2 loses both planted repeats, keeps its own segments
    val doc2 = docs.filter($"doc_id" === 2L).select("text").as[String].head()
    val expectKept = doc2.substring(0, 10) + doc2.substring(60, 80) + doc2.substring(125)
    assert(got(2L) == ((2L, 95L, md5(expectKept))))
    // keeper and unrelated docs pass through whole
    val doc1 = docs.filter($"doc_id" === 1L).select("text").as[String].head()
    val doc3 = docs.filter($"doc_id" === 3L).select("text").as[String].head()
    assert(got(1L) == ((0L, 0L, md5(doc1))))
    assert(got(3L) == ((0L, 0L, md5(doc3))))
  }

  test("topRepeats ranks planted boilerplate by doc spread with a deterministic sample") {
    val boiler = randText(12) // in 3 docs, twice in one of them
    val pair = randText(12)   // in 2 docs
    val docs = Seq(
      (1L, boiler + randText(5) + boiler),
      (2L, randText(7) + boiler),
      (3L, boiler + pair),
      (4L, pair + randText(9))).toDF("doc_id", "text")
    val got = Dedup.topRepeats(docs, "doc_id", "text", 12, 3)
      .select("n_docs", "n_occ", "sample").as[(Long, Long, String)].collect()
    assert(got.head == ((3L, 4L, boiler)))
    assert(got.tail.forall(_._1 == 2L)) // pair (and any chance overlaps) at 2 docs
    assert(got.map(_._3).contains(pair))
  }

  test("CharGramHashes60 is bit-identical to the md5/conv SQL formulation, incl. non-ASCII") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "héllo wörld ünïcode ありがとう 🙂 end of text here",
      randText(120), "shrt", "")
    val L = 7
    texts.foreach { t =>
      val df = Seq(Tuple1(t)).toDF("t")
      val native = df.select(org.apache.spark.sql.graft.CharGramHashes60(col("t"), L).as("h"))
        .as[Seq[Long]].head()
      val sql = df.selectExpr(
        s"""CASE WHEN length(t) >= $L THEN transform(sequence(0, length(t) - $L),
            i -> CAST(conv(substring(md5(CAST(substring(t, i + 1, $L) AS BINARY)), 1, 15), 16, 10) AS BIGINT))
            ELSE array() END AS h""").as[Seq[Long]].head()
      assert(native == sql, s"hash mismatch on '${t.take(30)}...'")
    }
  }

  test("WinnowedAnchors: every window of w gram positions contains an anchor; copies agree") {
    val k = 16; val w = 25
    val t = randText(500)
    val anchors = Seq(t).toDF("text")
      .select(explode(WinnowedAnchors(col("text"), k, w)).as("a"))
      .select("a.pos").as[Int].collect().sorted
    val m = t.length - k + 1
    // guarantee: any w consecutive gram positions include >= 1 anchor
    (0 to m - w).foreach { s =>
      assert(anchors.exists(p => p >= s && p < s + w), s"window at $s has no anchor")
    }
    // content-locality: a shifted copy selects the same anchors at the
    // same relative offsets (interior — away from edges by w+k)
    val shift = 37
    val t2 = randText(shift) + t
    val anchors2 = Seq(t2).toDF("text")
      .select(explode(WinnowedAnchors(col("text"), k, w)).as("a"))
      .select("a.pos").as[Int].collect().map(_ - shift).toSet
    val interior = anchors.filter(p => p >= w + k && p < m - (w + k))
    assert(interior.nonEmpty && interior.forall(anchors2.contains))
  }

  test("WinnowedAnchors: short docs still emit an anchor; sub-k docs emit none") {
    val k = 16; val w = 25
    def count(t: String): Long =
      Seq(t).toDF("text").select(size(WinnowedAnchors(col("text"), k, w)).as("n"))
        .as[Long].head()
    assert(count(randText(18)) == 1L) // fewer than w grams -> one window
    assert(count(randText(15)) == 0L) // shorter than k
  }

  test("MatchExtend: maximal extension, and null on a false seed") {
    val a = "xxxHELLOWORLDzzz"
    val b = "yyHELLOWORLDqqq"
    // anchor = 5 chars "OWORL" at a:7 / b:6
    val got = Seq((a, 7L, b, 6L)).toDF("a", "ap", "b", "bp")
      .select(MatchExtend(col("a"), col("ap"), col("b"), col("bp"), 5).as("se"))
      .as[Seq[Long]].head()
    assert(got == Seq(2L, 12L)) // "HELLOWORLD" spans b[2, 12)
    val nul = Seq((a, 0L, b, 0L)).toDF("a", "ap", "b", "bp")
      .select(MatchExtend(col("a"), col("ap"), col("b"), col("bp"), 5).as("se"))
      .collect().head
    assert(nul.isNullAt(0)) // grams differ -> null, not a bogus interval
  }

  test("substringDedupAnchored: planted >= w+k-1 repeats are all recovered (guarantee)") {
    val k = 16; val w = 25; val minLen = 40 // t = w + k - 1 = 40
    // planted repeats use RANDOM content so each anchor's earliest
    // occurrence is inside the planted pair (the guarantee's premise)
    val planted = (0 until 5).map(_ => randText(minLen + rng.nextInt(60)))
    val docs: Seq[(Long, String)] =
      planted.zipWithIndex.flatMap { case (p, i) =>
        Seq((2L * i + 1, randText(60) + p + randText(40)),
          (2L * i + 2, randText(25) + p + randText(80)))
      }
    val got = spansOf(Dedup.substringDedupAnchored(
      docs.toDF("doc_id", "text"), "doc_id", "text", minLen, k, w))
    planted.zipWithIndex.foreach { case (p, i) =>
      val laterId = 2L * i + 2
      val (s, e) = (25L, 25L + p.length)
      assert(got.contains(laterId), s"planted repeat $i not found")
      assert(got(laterId).exists { case (ss, ee) => ss <= s && ee >= e },
        s"planted repeat $i [$s,$e) not covered by ${got(laterId)}")
    }
  }

  test("substringDedupAnchored: every span is TRUE duplicated text from an earlier doc") {
    val docsSeq: Seq[(Long, String)] = {
      val base = randText(400)
      (1L to 10L).map { id =>
        val s = rng.nextInt(300)
        (id, randText(rng.nextInt(40)) + base.substring(s, s + 60 + rng.nextInt(40)) +
          randText(rng.nextInt(40)))
      }
    }
    val byId = docsSeq.toMap
    val got = spansOf(Dedup.substringDedupAnchored(
      docsSeq.toDF("doc_id", "text"), "doc_id", "text", 40, 16, 25))
    assert(got.nonEmpty)
    got.foreach { case (id, spans) =>
      spans.foreach { case (s, e) =>
        val piece = byId(id).substring(s.toInt, e.toInt)
        // a merged span may chain matches from DIFFERENT earlier docs;
        // every constituent 40-char window must exist in some earlier doc
        (0 to piece.length - 40).foreach { off =>
          val gram = piece.substring(off, off + 40)
          assert((1L until id).exists(p => byId.get(p).exists(_.contains(gram))),
            s"span [$s,$e) of doc $id carries a window not in any earlier doc")
        }
      }
    }
  }

  test("astral-plane chars: anchored spans share the exact operator's code-point coordinates") {
    // astral chars are 2 UTF-16 code units but ONE code point — a
    // code-unit-indexed anchor/extension walk would emit ~2× offsets
    // and split surrogate pairs at span edges
    val alphabet = ("abcdefgh".map(_.toString) ++
      Seq("𝕏", "🌍", "𝒶", "😀",
        "𝛀", "🚀", "𝜋", "🧬")).toArray
    def atext(n: Int): String =
      (0 until n).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
    val p = atext(60)
    assert(p.codePointCount(0, p.length) == 60 && p.length > 60) // astral-bearing fixture
    val df = Seq((1L, atext(30) + p + atext(10)), (2L, atext(17) + p + atext(25)))
      .toDF("doc_id", "text").cache()
    val exact = spansOf(Dedup.substringDedup(df, "doc_id", "text", 40))
    val anch = spansOf(Dedup.substringDedupAnchored(df, "doc_id", "text", 40, 16, 25))
    df.unpersist()
    // exact trims the later doc at CODE-POINT offsets [17, 77)
    assert(exact.contains(2L) && exact(2L).exists { case (s, e) => s <= 17 && e >= 77 },
      s"exact spans ${exact.get(2L)} miss the planted code-point interval [17,77)")
    // anchored recovers it in the SAME coordinate system (the planted
    // repeat is ≥ w+k−1, so the winnowing guarantee applies)
    assert(anch.contains(2L) && anch(2L).exists { case (s, e) => s <= 17 && e >= 77 },
      s"anchored spans ${anch.get(2L)} miss the planted code-point interval [17,77)")
    // and never exceeds exact spans beyond the documented < k−1 seed slack
    anch(2L).foreach { case (s, e) =>
      assert(exact(2L).exists { case (es, ee) => es - 15 <= s && e <= ee + 15 },
        s"anchored [$s,$e) vs exact ${exact(2L)}")
    }
  }

  test("substringDedupAnchored never trims beyond the exact operator's spans by more than seed slack") {
    val base = randText(300)
    val docsSeq: Seq[(Long, String)] = (1L to 8L).map { id =>
      val s = rng.nextInt(200)
      (id, randText(20) + base.substring(s, s + 80) + randText(20))
    }
    val df = docsSeq.toDF("doc_id", "text").cache()
    val exact = spansOf(Dedup.substringDedup(df, "doc_id", "text", 40))
    val anch = spansOf(Dedup.substringDedupAnchored(df, "doc_id", "text", 40, 16, 25))
    df.unpersist()
    // anchored finds a subset of docs (winnowing may skip sub-guarantee
    // repeats) and, where it finds spans, they sit inside exact spans
    // (extension is char-exact; merged unions can only be narrower)
    anch.foreach { case (id, spans) =>
      assert(exact.contains(id))
      spans.foreach { case (s, e) =>
        assert(exact(id).exists { case (es, ee) => es <= s && ee >= e },
          s"anchored span [$s,$e) of doc $id outside exact spans ${exact(id)}")
      }
    }
  }
}
