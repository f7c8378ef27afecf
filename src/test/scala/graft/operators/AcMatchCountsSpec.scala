package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** AcMatchCounts (Aho–Corasick multi-pattern occurrence counts): gated by
  * brute-force per-position equality — for every pattern p, the count must
  * equal |{ i : substring(s, i, len(p)) = p }|, the definition the DuckDB
  * oracle replays — on hand fixtures (nesting, self-overlap, phrases,
  * multi-byte text) and randomized corpora, through the real codegen path
  * (all assertions run the expression inside a DataFrame projection). */
class AcMatchCountsSpec extends SparkSpecBase {
  import spark.implicits._

  private def brute(s: String, p: String): Long =
    (0 to s.length - p.length).count(i => s.regionMatches(i, p, 0, p.length)).toLong

  private def run(texts: Seq[String], pats: Seq[String]): Seq[Seq[Long]] =
    texts.toDF("t")
      .select(org.apache.spark.sql.graft.AcMatchCounts(col("t"), pats).as("c"))
      .as[Seq[Long]].collect().toSeq

  test("hand fixtures: nesting, self-overlap, phrases") {
    val pats = Seq("aa", "a", "ab ra", "abra")
    val texts = Seq("abracadabra abra", "aaaa", "", "xyz")
    val got = run(texts, pats)
    texts.zip(got).foreach { case (t, cs) =>
      assert(cs == pats.map(p => brute(t, p)), s"text '$t'")
    }
    // spot values: "aaaa" has 3 self-overlapping "aa" and 4 "a"
    assert(got(1) == Seq(3L, 4L, 0L, 0L))
  }

  test("nested patterns both count via dictionary suffix links") {
    val pats = Seq("value", "hash value")
    val got = run(Seq("hash value of a value"), pats)
    assert(got.head == Seq(2L, 1L))
  }

  test("multi-byte text: byte matching lands only on code-point boundaries") {
    val pats = Seq("ü", "😀", "a😀")
    val texts = Seq("aüb😀üa😀", "üüü", "plain ascii")
    run(texts, pats).zip(texts).foreach { case (cs, t) =>
      assert(cs == pats.map(p => brute(t, p)), s"text '$t'")
    }
  }

  test("randomized: equals brute-force per-position counts") {
    val rng = new scala.util.Random(1109)
    (0 until 20).foreach { trial =>
      def rs(n: Int) = (0 until n).map(_ => ('a' + rng.nextInt(3)).toChar).mkString
      val pats = (0 until 1 + rng.nextInt(6)).map(_ => rs(1 + rng.nextInt(4))).distinct
      val texts = (0 until 5).map(_ => rs(rng.nextInt(60)))
      run(texts, pats).zip(texts).foreach { case (cs, t) =>
        assert(cs == pats.map(p => brute(t, p)), s"trial $trial text '$t' pats $pats")
      }
    }
  }

  // ---- word-boundary (C4) mode ----

  private def isWord(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'A' && c <= 'Z') ||
      (c >= 'a' && c <= 'z') || c == '_'

  /** Brute-force boundary-mode reference over CHARACTERS — the oracle's
    * per-character predicate; must equal the engine's byte-local check. */
  private def bruteB(s: String, p: String): Long =
    (0 to s.length - p.length).count { i =>
      s.regionMatches(i, p, 0, p.length) &&
        (i == 0 || !isWord(s.charAt(i - 1))) &&
        (i + p.length == s.length || !isWord(s.charAt(i + p.length)))
    }.toLong

  private def runB(texts: Seq[String], pats: Seq[String]): Seq[Seq[Long]] =
    texts.toDF("t")
      .select(org.apache.spark.sql.graft.AcMatchCounts(col("t"), pats,
        boundary = true).as("c"))
      .as[Seq[Long]].collect().toSeq

  test("boundary mode: 'ass' never fires inside 'class' — the C4 rule") {
    val pats = Seq("ass", "class")
    val got = runB(Seq("class ass, classy a_ss class.ass 1ass"), pats)
    // "ass" hits: standalone "ass," and "class.ass" (dot neighbor);
    // NOT inside class/classy, not "a_ss", not "1ass".
    // "class" hits: "class " and "class." — not "classy".
    assert(got.head == Seq(2L, 2L))
  }

  test("boundary mode: start/end of string and phrase patterns") {
    val pats = Seq("drop table", "slow")
    val got = runB(Seq("drop table", "slow! so slowly, slow"), pats)
    assert(got(0) == Seq(1L, 0L))
    assert(got(1) == Seq(0L, 2L)) // "slow!" and trailing "slow"; not "slowly"
  }

  test("boundary mode at UTF-8 multi-byte edges: non-ASCII neighbors are boundaries") {
    val pats = Seq("ass", "ü")
    // é (2-byte), 😀 (4-byte), ü pattern with word/non-word neighbors
    val texts = Seq("éassé", "😀ass😀", "xassé", "éassx", "üb aü büc", "ass")
    val got = runB(texts, pats)
    texts.zip(got).foreach { case (t, cs) =>
      assert(cs == pats.map(p => bruteB(t, p)), s"text '$t'")
    }
    assert(got(0) == Seq(1L, 0L)) // accented neighbors do NOT glue
    assert(got(2) == Seq(0L, 0L)) // 'x' before kills it
  }

  test("boundary mode randomized: equals the per-character brute reference") {
    val rng = new scala.util.Random(1112)
    val alpha = "ab_1 .é"
    (0 until 20).foreach { trial =>
      def rs(n: Int) = (0 until n).map(_ => alpha(rng.nextInt(alpha.length))).mkString
      val pats = (0 until 1 + rng.nextInt(5)).map(_ => rs(1 + rng.nextInt(3)))
        .filter(_.nonEmpty).distinct
      if (pats.nonEmpty) {
        val texts = (0 until 5).map(_ => rs(rng.nextInt(50)))
        runB(texts, pats).zip(texts).foreach { case (cs, t) =>
          assert(cs == pats.map(p => bruteB(t, p)), s"trial $trial text '$t' pats $pats")
        }
      }
    }
  }

  test("empty patterns and over-cap byte totals are refused") {
    intercept[IllegalArgumentException] {
      org.apache.spark.sql.graft.AcMatchCounts(col("t"), Seq.empty[String])
    }
    intercept[IllegalArgumentException] {
      org.apache.spark.sql.graft.AcMatchCounts(col("t"), Seq("a", ""))
    }
    val big = "x" * 1024
    intercept[IllegalArgumentException] {
      org.apache.spark.sql.graft.AcMatchCounts(col("t"),
        (0 to 1024).map(i => big + i.toString))
    }
  }
}
