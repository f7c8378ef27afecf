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
