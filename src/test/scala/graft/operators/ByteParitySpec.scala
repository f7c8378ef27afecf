package graft.operators

import graft.SparkSpecBase
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ByteAlpha

/** Byte-fallback parity for the OTHER two tokenizer trainers (round 12):
  * WordPiece and unigram-LM get the same GPT-2 byte alphabet BPE already
  * has — closed-alphabet coverage, exact round-trips (in-vocab and OOV),
  * and structural agreement with char-level mode on pure-ASCII corpora
  * (where the byte alphabet is an order-preserving bijection). */
class ByteParitySpec extends SparkSpecBase {
  import spark.implicits._

  private val mixed = Seq(
    (1L, "hello world 世界 你好 café"),
    (2L, "hello 世界 😀😀 rocket 🚀 café"),
    (3L, "naïve résumé 你好 世界 hello world"),
    (4L, "😀 🚀 hello hello 世界 世界 café naïve"),
    (5L, "combining é marks é test")).toDF("doc_id", "text")

  private val ascii = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick dog naps and the brown fox jumps"),
    (3L, "lazy lazy dog dog fox fox the the quick")).toDF("doc_id", "text")

  private def inAlphabet(s: String): Boolean = s.forall(c => c >= 0x100 && c < 0x200)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("byte-level WordPiece: vocab encodings stay closed-alphabet and round-trip") {
    val (merges, vocab) = Tokenizer.wordpieceFitWithVocab(mixed, "text", 10,
      byteLevel = true)
    assert(merges.count() == 10)
    val enc = vocab.select("w", "ws").as[(String, String)].collect()
    assert(enc.nonEmpty)
    for ((w, ws) <- enc) {
      val syms = ws.split(Tokenizer.Sep).filter(_.nonEmpty)
      assert(syms.forall(inAlphabet), s"out-of-alphabet in $w")
      assert(ByteAlpha.decode(syms.mkString) == w, s"round-trip failed for $w")
    }
    assert(enc.exists(_._2.split(Tokenizer.Sep).exists(_.length > 1)))
  }

  test("byte-level WordPiece zero unk: OOV scripts fall back to byte splits exactly") {
    val (_, vocab) = Tokenizer.wordpieceFitWithVocab(mixed, "text", 8,
      byteLevel = true)
    // Cyrillic/Hangul/Devanagari/new emoji — none seen at fit time
    val oov = Seq((1L, "привет 안녕하세요 नमस्ते"), (2L, "🎄 Ωμέγα привет"))
    val got = Tokenizer.wordpieceApplyTrained(oov.toDF("doc_id", "text"),
        "doc_id", "text", vocab, byteLevel = true)
      .orderBy("doc_id").as[(Long, Long, String)].collect().toSeq
    // expected: every OOV word byte-splits (one symbol per UTF-8 byte),
    // so counts and the order-exact md5 are computable in plain Scala
    val want = oov.map { case (id, text) =>
      val toks = text.trim.split("\\s+").filter(_.nonEmpty)
      val syms = toks.flatMap(w => ByteAlpha.encode(w).toCharArray.map(_.toString))
      (id, syms.length.toLong, md5hex(syms.mkString(" ")))
    }
    assert(got == want)
  }

  test("ASCII corpus: byte-level WordPiece merges are the char-level merges, encoded") {
    val (mc, _) = Tokenizer.wordpieceFitWithVocab(ascii, "text", 8)
    val (mb, _) = Tokenizer.wordpieceFitWithVocab(ascii, "text", 8, byteLevel = true)
    val charMerges = mc.orderBy("step")
      .select("merge_left", "merge_right", "cnt")
      .as[(String, String, Long)].collect().toSeq
    val byteMerges = mb.orderBy("step")
      .select("merge_left", "merge_right", "cnt")
      .as[(String, String, Long)].collect().toSeq
    assert(byteMerges == charMerges.map { case (l, r, c) =>
      (ByteAlpha.encode(l), ByteAlpha.encode(r), c)
    })
  }

  test("byte-level unigram: fitted pieces stay closed-alphabet; apply round-trips OOV") {
    val pieces = Tokenizer.unigramFit(mixed, "text", 6, 200, 2, 100,
        byteLevel = true)
      .as[(String, Long)].collect().toMap
    assert(pieces.nonEmpty && pieces.keys.forall(inAlphabet))
    // every fitted piece decodes to real bytes of some corpus word
    pieces.keys.foreach(p => assert(ByteAlpha.decode(p).nonEmpty))
    // apply on text containing words AND scripts never seen at fit time:
    // Viterbi segments the byte encoding (unk floor covers unseen bytes),
    // and the concatenated segmentation round-trips to the original word
    val probe = Seq("hello", "世界", "привет", "🎄", "naïve").toDF("w")
      .select(col("w"), org.apache.spark.sql.graft.UnigramViterbi(
        ByteAlpha(col("w")), pieces, Tokenizer.UnkLogpU).as("syms"))
      .as[(String, Seq[String])].collect()
    for ((w, syms) <- probe) {
      assert(syms.nonEmpty, s"unsegmentable $w")
      assert(syms.forall(inAlphabet), s"unk leak in $w")
      assert(ByteAlpha.decode(syms.mkString) == w, s"round-trip failed for $w")
    }
  }

  test("ASCII corpus: byte-level unigram apply counts equal char-level (isomorphic DP)") {
    val charPieces = Tokenizer.unigramFit(ascii, "text", 6, 100, 2, 50)
      .as[(String, Long)].collect().toMap
    val bytePieces = Tokenizer.unigramFit(ascii, "text", 6, 100, 2, 50,
        byteLevel = true)
      .as[(String, Long)].collect().toMap
    // the byte alphabet maps ASCII chars 1:1 preserving order, so the
    // whole fit is isomorphic: same pieces (encoded) with same scores
    assert(bytePieces == charPieces.map { case (p, lp) => ByteAlpha.encode(p) -> lp })
    val viaChar = Tokenizer.unigramApplyTrained(ascii, "doc_id", "text", charPieces)
      .select("doc_id", "n_pieces").as[(Long, Long)].collect().sortBy(_._1).toSeq
    val viaByte = Tokenizer.unigramApplyTrained(ascii, "doc_id", "text", bytePieces,
        byteLevel = true)
      .select("doc_id", "n_pieces").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(viaByte == viaChar)
  }
}
