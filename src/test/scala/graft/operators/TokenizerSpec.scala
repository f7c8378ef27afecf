package graft.operators

import graft.SparkSpecBase

class TokenizerSpec extends SparkSpecBase {
  import spark.implicits._

  test("bpePairCounts: frequency-weighted adjacent pairs with deterministic tie order") {
    // corpus: "abab ab", "abab" -> vocab {abab: 2, ab: 1}
    // pairs from abab (freq 2): ab, ba, ab -> ab x2, ba x1 per word
    // counts: ab = 2*2 + 1*1 = 5, ba = 2*1 = 2
    val df = Seq("abab ab", "abab").toDF("text")
    val got = Tokenizer.bpePairCounts(df, "text", 10)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("ab", 5L), ("ba", 2L)))
  }

  test("bpePairCounts: single-char words contribute nothing; topK cut is by (cnt desc, pair asc)") {
    // words: "xy" x3, "yz" x3, "zz" x1, plus 1-char noise
    val df = Seq("xy yz", "xy yz", "xy yz zz a b c").toDF("text")
    val got = Tokenizer.bpePairCounts(df, "text", 2)
      .as[(String, Long)].collect().toSeq
    // tie between xy and yz at 3 -> pair ASC keeps both, zz cut by topK
    assert(got == Seq(("xy", 3L), ("yz", 3L)))
  }
}
