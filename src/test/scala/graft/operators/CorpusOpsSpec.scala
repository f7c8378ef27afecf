package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.functions.TextFunctions

/** Corpus-construction operators added round 8: PII redaction,
  * paragraph-level exact dedup, deterministic train-order sharding, and
  * hashed-linear quality-classifier inference. */
class CorpusOpsSpec extends SparkSpecBase {

  import org.apache.spark.sql.DataFrame

  private def docsDf(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // ------------------------------------------------------------------ PII

  test("redactPii replaces emails, IPv4 literals and phone numbers") {
    val df = docsDf(
      (0L, "mail a.user+tag@sub.example.co.uk now"),
      (1L, "host 192.168.0.1 and 10.0.0.255 up"),
      (2L, "call +1-202-555-0147 or +49-301-555-9999"),
      (3L, "mixed bob@x.org at 8.8.8.8 +1-111-555-0000"))
      .select(col("doc_id"), TextFunctions.redactPii(col("text")).as("red"))
    val got = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(0L) == "mail [EMAIL] now")
    assert(got(1L) == "host [IP] and [IP] up")
    assert(got(2L) == "call [PHONE] or [PHONE]")
    assert(got(3L) == "mixed [EMAIL] at [IP] [PHONE]")
  }

  test("redactPii near-miss handling: non-matches untouched, greedy IPv4 prefix redacts") {
    // 3-octet version strings, @-less handles, un-prefixed digit runs
    // don't match; a 5-octet dotted run DOES lose its 4-octet prefix
    // (documented greedy-left semantics, asserted below)
    val text = "v1.2.3 of pkg @handle says 202-555-0147 and 1.2.3.4.5 is odd"
    val out = docsDf((0L, text))
      .select(TextFunctions.redactPii(col("text"))).head().getString(0)
    // 1.2.3.4.5: the first four octets DO form a \b-delimited IPv4 match
    // (the boundary between '4' and '.' is a word boundary) — redacting
    // the prefix is the documented greedy-left semantics
    assert(out == "v1.2.3 of pkg @handle says 202-555-0147 and [IP].5 is odd")
  }

  // --------------------------------------------------- paragraph dedup

  private def para(s: String, n: Int = 2) =
    Dedup.paragraphDedup(docsDf((0L, s)), "doc_id", "text", n)

  test("paragraphDedup keeps the corpus-order-first copy of a paragraph") {
    // 2-token paragraphs: doc0 = [a b][c d], doc1 = [c d][e f], doc2 = [a b]
    val out = Dedup.paragraphDedup(
      docsDf((0L, "a b c d"), (1L, "c d e f"), (2L, "a b")),
      "doc_id", "text", 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))).toMap
    assert(out(0L)._1 == 2 && out(0L)._2 == 2) // both survive (first copies)
    assert(out(1L)._1 == 2 && out(1L)._2 == 1) // "c d" dropped, "e f" kept
    assert(out(2L)._1 == 1 && out(2L)._2 == 0) // "a b" fully deduped
    // doc1's kept text is exactly "e f"
    val md5ef = java.security.MessageDigest.getInstance("MD5")
      .digest("e f".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(1L)._3 == md5ef && out(1L)._4 == 3L)
  }

  test("paragraphDedup drops later copies within the SAME doc") {
    val out = para("x y x y x y", n = 2).head()
    assert(out.getLong(1) == 3 && out.getLong(2) == 1) // one of three kept
    assert(out.getLong(4) == 3L) // kept text "x y"
  }

  test("paragraphDedup: short doc is one paragraph; zero-token docs drop") {
    val out = Dedup.paragraphDedup(
      docsDf((0L, "lone"), (1L, "   ")), "doc_id", "text", 20).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L))
    assert(out.head.getLong(1) == 1 && out.head.getLong(2) == 1)
  }

  test("paragraphDedup reassembles surviving paragraphs in order") {
    // doc0 plants "c d"; doc1 = [a b][c d][e f] keeps 1st and 3rd — the
    // kept text must be "a b e f" (order preserved, dropped middle)
    val out = Dedup.paragraphDedup(
      docsDf((0L, "c d"), (1L, "a b c d e f")), "doc_id", "text", 2)
      .filter(col("doc_id") === 1).head()
    val md5abef = java.security.MessageDigest.getInstance("MD5")
      .digest("a b e f".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out.getString(3) == md5abef && out.getLong(4) == 7L)
  }

  // ------------------------------------------------------- train order

  test("trainOrder is a seed-reproducible permutation with dense ranks") {
    val ids = docsDf((0L to 99L).map(i => (i, "t")): _*).select("doc_id")
    val a = Layout.trainOrder(ids, "doc_id", "s1", 4).collect()
    assert(a.length == 100)
    assert(a.map(_.getLong(0)).toSet == (0L to 99L).toSet) // permutation
    assert(a.forall(r => r.getLong(2) >= 0 && r.getLong(2) < 4))
    // ranks are dense 1..count inside every shard
    a.groupBy(_.getLong(2)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(3)).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // same seed -> byte-identical; different seed -> different order
    val b = Layout.trainOrder(ids, "doc_id", "s1", 4).collect()
    assert(a.map(_.toSeq).toSeq.sortBy(_.head.toString) ==
      b.map(_.toSeq).toSeq.sortBy(_.head.toString))
    val c = Layout.trainOrder(ids, "doc_id", "s2", 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    val aMap = a.map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert((0L to 99L).exists(i => aMap(i) != c(i)))
  }

  // -------------------------------------------- hashed linear classifier

  test("hashedLinearScoreU is additive and zero on empty token lists") {
    val scored = docsDf((0L, "alpha beta"), (1L, "gamma"), (2L, "alpha beta gamma"), (3L, " "))
      .select(col("doc_id"),
        TextFunctions.hashedLinearScoreU(TextFunctions.tokens(col("text")), 4096).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scored(3L) == 0L)
    assert(scored(0L) + scored(1L) == scored(2L)) // integer-exact additivity
    assert(scored.values.exists(_ != 0L)) // the model is not degenerate
  }

  test("hashedLinearScoreU matches a by-hand md5 reference model") {
    def h32(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16)
    }
    def w(tok: String, dim: Int): Long = h32("w:" + (h32(tok) % dim)) % 2001L - 1000L
    val expected = Seq("alpha", "beta", "gamma").map(w(_, 4096)).sum
    val got = docsDf((0L, "alpha beta gamma"))
      .select(TextFunctions.hashedLinearScoreU(TextFunctions.tokens(col("text")), 4096))
      .head().getLong(0)
    assert(got == expected)
  }
}
