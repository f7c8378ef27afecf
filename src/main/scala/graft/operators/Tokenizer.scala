package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Tokenizer fitting over a corpus — the counting passes behind BPE-style
  * vocabulary construction (Sennrich et al. 2016, arXiv:1508.07909).
  *
  * The scale trick is classic BPE: adjacent-pair statistics are computed
  * over the DISTINCT word vocabulary weighted by word frequency, never
  * over the corpus. One corpus-wide explode builds the (word, freq)
  * vocab (map-side partial counts, vocab-sized shuffle); the pair
  * explode then runs over |vocab| rows × word length — corpus-size-
  * independent. Top-k is a TakeOrdered (bounded heap per partition), no
  * global sort materialization; the (count DESC, pair ASC) total order
  * makes the cut deterministic under ties.
  */
object Tokenizer {

  /** Frequency-weighted adjacent character-pair counts — the argmax
    * candidates of a BPE merge step. Returns the `topK` (pair, cnt)
    * rows by (cnt DESC, pair ASC). */
  def bpePairCounts(docs: DataFrame, textCol: String, topK: Int): DataFrame = {
    val vocab = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
    vocab
      .filter(length(col("w")) >= 2)
      .select(col("freq"), explode(transform(
        sequence(lit(1), length(col("w")) - 1),
        i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy("pair").agg(sum("freq").as("cnt"))
      .orderBy(col("cnt").desc, col("pair").asc)
      .limit(topK)
  }

  /** DuckDB oracle for [[bpePairCounts]] over a (textCol) relation. */
  def bpePairCountsSql(table: String, textCol: String, topK: Int): String = {
    val toks = TextFunctions.tokensSql(textCol)
    s"""WITH v AS (SELECT w, COUNT(*) AS freq FROM (
           SELECT unnest($toks) AS w FROM $table) GROUP BY w),
       p AS (SELECT substr(w, i, 2) AS pair, freq FROM (
           SELECT w, freq, unnest(range(1, length(w))) AS i
           FROM v WHERE length(w) >= 2))
       SELECT pair, CAST(SUM(freq) AS BIGINT) AS cnt FROM p
       GROUP BY pair ORDER BY cnt DESC, pair ASC LIMIT $topK"""
      .replaceAll("\\s+", " ")
  }

  // ---------------------------------------------------------------------
  // Iterative BPE fit (round 10) — the actual tokenizer-training loop
  // ---------------------------------------------------------------------

  /** Symbol separator inside the packed word representation. Words are
    * kept as `·s1·s2·…·sn·` (leading + trailing separator). A merge of
    * pair (l, r) is applied as ONE greedy left-to-right fold over the
    * word's symbol list (Spark `aggregate`, DuckDB `list_reduce` — the
    * identical step function in both engines): the accumulator is the
    * rewritten packed string; when it ends in `·l·` and the next symbol
    * is `r`, the tail rewrites to `·lr·`, else the symbol appends. This
    * IS greedy non-overlapping merging — a just-merged token `lr` can
    * never re-match as the left of the pair because `lr ≠ l` (r is
    * non-empty), so the fold never chains through a merge the greedy
    * scan would skip; in particular l = r runs of any length pair off
    * exactly like Sennrich learn_bpe ('aaaaa' → [aa, aa, a]). A naive
    * string replace is NOT equivalent here (overlapping `·a·a·`
    * occurrences share their boundary separator and mis-pair on runs
    * ≥ 5 — BpeSpec's run fixtures pin the divergence). BpeSpec also
    * pins the fold against the native
    * [[org.apache.spark.sql.graft.BpeEncode]] greedy walker. */
  val Sep: String = "\u001f" // = chr(31) in the DuckDB twin

  /** The (merges, finalVocab) of `k` BPE merge rounds over the corpus
    * vocabulary (Sennrich et al. 2016, learn_bpe): each round counts
    * frequency-weighted adjacent symbol pairs over the DISTINCT word
    * table, takes the (cnt DESC, left ASC, right ASC) argmax, and
    * rewrites every word's packed symbol string. The corpus is read
    * ONCE (vocab build, localCheckpointed); each round is a
    * |vocab|-bounded shuffle + a 1-row argmax to the driver + a map-only
    * rewrite, localCheckpointed so lineage stays flat. Rounds end early
    * if no pair remains. Returns the ordered merge table
    * (step, merge_left, merge_right, cnt) and the final vocab
    * (w, ws, freq) whose `ws` IS each training word's BPE encoding. */
  def bpeFitWithVocab(docs: DataFrame, textCol: String, k: Int,
                      byteLevel: Boolean = false): (DataFrame, DataFrame) = {
    require(k >= 1, "need at least one merge round")
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .filter(!col("w").contains(Sep)) // separator-carrying words would corrupt the packing
      .withColumn("ws", packedSyms(col("w"), byteLevel))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= k && !exhausted) {
      val best = pairCountsOf(vocab)
        .orderBy(col("cnt").desc, col("lft").asc, col("rgt").asc)
        .limit(1)
        .as[(String, String, Long)].collect()
      best.headOption match {
        case None => exhausted = true
        case Some((l, r, cnt)) =>
          merges += ((step, l, r, cnt))
          vocab = vocab
            .withColumn("ws", greedyMerge(col("ws"), l, r))
            .localCheckpoint(true)
          step += 1
      }
    }
    (merges.result().toDF("step", "merge_left", "merge_right", "cnt"), vocab)
  }

  /** A word's initial packed symbol string: per-code-point split, or —
    * in byte-level mode (the GPT-2 byte-fallback alphabet,
    * [[org.apache.spark.sql.graft.ByteAlpha]]) — per-UTF-8-byte over
    * the closed 256-symbol alphabet, which makes the trained vocab
    * cover ANY input with zero unk. Byte symbols are single BMP chars
    * at 0x100 + byte, so the `(.)` split and every downstream length
    * computation work identically in both modes. */
  private def packedSyms(w: Column, byteLevel: Boolean): Column = {
    val base = if (byteLevel) org.apache.spark.sql.graft.ByteAlpha(w) else w
    concat(lit(Sep), regexp_replace(base, "(.)", "$1" + Sep))
  }

  /** One greedy left-to-right application of merge (l, r) to a packed
    * word string (see [[Sep]] for the equivalence argument): split to
    * symbols, fold the packed result string — when it ends in `·l·` and
    * the incoming symbol is r, the tail rewrites to `·lr·`. Lengths are
    * CODE POINTS (Spark `length`/`substr` = DuckDB `len`/`substr`), so
    * the step function is engine-identical to the oracle's
    * `list_reduce`. In-row column algebra, map-only. */
  private def greedyMerge(ws: Column, l: String, r: String): Column = {
    val lCp = l.codePointCount(0, l.length)
    aggregate(
      filter(split(ws, Sep), s => length(s) > 0),
      lit(Sep),
      (acc, s) => when(endswith(acc, lit(Sep + l + Sep)) && s === lit(r),
          concat(acc.substr(lit(1), length(acc) - lit(lCp + 1)), lit(l + r + Sep)))
        .otherwise(concat(acc, s, lit(Sep))))
  }

  /** Just the ordered merge table of [[bpeFitWithVocab]]. */
  def bpeFit(docs: DataFrame, textCol: String, k: Int): DataFrame =
    bpeFitWithVocab(docs, textCol, k)._1

  /** Frequency-weighted adjacent symbol-pair counts over a packed vocab
    * (w, ws, freq). The split array is materialized as its own column
    * and referenced 4× by the zip_with (multi-referenced non-cheap alias
    * — CollapseProject keeps it evaluated once per row, not per pair). */
  private def pairCountsOf(vocab: DataFrame): DataFrame =
    vocab
      .withColumn("__l", expr(s"filter(split(ws, '$Sep'), x -> x <> '')"))
      .select(col("freq"), explode(zip_with(
        slice(col("__l"), lit(1), size(col("__l")) - 1),
        slice(col("__l"), lit(2), size(col("__l")) - 1),
        (a, b) => struct(a.as("lft"), b.as("rgt")))).as("p"))
      .groupBy(col("p.lft").as("lft"), col("p.rgt").as("rgt"))
      .agg(sum("freq").as("cnt"))

  /** BPE-encode a corpus with a TRAINED vocab (the `(w, ws, freq)` of
    * [[bpeFitWithVocab]]): tokens join the vocab's packed encodings
    * (map-side against a broadcastable vocab; Catalyst decides), words
    * absent from the vocab fall back to their character split, and each
    * doc re-assembles in token order. Returns
    * (idCol, n_bpe_tokens, bpe_md5) — count and order-exact content
    * hash of the encoded stream (the compare-friendly projection of the
    * encoding). Per-doc state is bounded by doc length. */
  def bpeApplyTrained(docs: DataFrame, idCol: String, textCol: String,
                      vocab: DataFrame, byteLevel: Boolean = false): DataFrame = {
    val enc = docs
      .select(col(idCol), posexplode(TextFunctions.tokens(col(textCol))).as(Seq("i", "w")))
      .join(vocab.select(col("w"), col("ws")), Seq("w"), "left")
      // OOV fallback: character split — or, byte-level, the byte split
      // over the closed alphabet (EVERY symbol is then in-vocab by
      // construction: the 256 single-byte symbols always survive a fit)
      .withColumn("__ws", coalesce(col("ws"), packedSyms(col("w"), byteLevel)))
      .withColumn("__syms", expr(s"filter(split(__ws, '$Sep'), x -> x <> '')"))
    enc
      .groupBy(col(idCol))
      .agg(sum(size(col("__syms"))).as("n_bpe_tokens"),
        collect_list(struct(col("i"), col("__syms"))).as("__parts"))
      .select(col(idCol), col("n_bpe_tokens"),
        md5(concat_ws(" ",
          flatten(transform(array_sort(col("__parts")), p => p("__syms"))))
          .cast("binary")).as("bpe_md5"))
  }

  /** DuckDB twin of [[org.apache.spark.sql.graft.ByteAlpha]]: split the
    * string into code points, UTF-8-encode each arithmetically, and map
    * every byte b to chr(0x100 + b) — the GPT-2 byte-level alphabet,
    * replayed as pure SQL so byte-mode fits are oracle-certifiable.
    * Every emitted symbol is a single BMP code point, so all downstream
    * code-point machinery (the `(.)` split, substr lengths) works
    * unchanged in both engines. */
  def byteAlphaSql(w: String): String = {
    val cp = "unicode(c)"
    s"""list_aggregate(list_transform(flatten(list_transform(
          list_filter(string_split(regexp_replace($w, '(.)', '\\1' || chr(31), 'g'), chr(31)),
            x -> x <> ''),
          c -> CASE
            WHEN $cp < 128 THEN [$cp]
            WHEN $cp < 2048 THEN [192 + $cp // 64, 128 + $cp % 64]
            WHEN $cp < 65536 THEN [224 + $cp // 4096, 128 + ($cp // 64) % 64, 128 + $cp % 64]
            ELSE [240 + $cp // 262144, 128 + ($cp // 4096) % 64,
                  128 + ($cp // 64) % 64, 128 + $cp % 64] END)),
          b -> chr(256 + b)), 'string_agg', '')"""
  }

  /** CTE `v0` — the packed (w, ws, freq) vocab of a corpus. In byte
    * mode the packed string splits the word's [[byteAlphaSql]] encoding
    * instead of its code points (`w` stays the original word — it is
    * the vocab join key). */
  private def packedVocabCtes(table: String, textCol: String,
                              byteLevel: Boolean = false): String = {
    val toks = TextFunctions.tokensSql(textCol)
    val base = if (byteLevel) byteAlphaSql("w") else "w"
    s"""v AS (SELECT w, COUNT(*) AS freq FROM (
          SELECT unnest($toks) AS w FROM $table) GROUP BY w
          HAVING instr(w, chr(31)) = 0),
        v0 AS (SELECT w, chr(31) || regexp_replace($base, '(.)', '\\1' || chr(31), 'g') AS ws,
          freq FROM v)"""
  }

  /** CTE `p$i` — frequency-weighted adjacent symbol-pair counts of
    * round i's input vocab `v${i-1}`. */
  private def pairCte(i: Int): String =
    s"""p$i AS (SELECT l[j] AS lft, l[j+1] AS rgt, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
          SELECT list_filter(string_split(ws, chr(31)), x -> x <> '') AS l, freq
          FROM v${i - 1}), UNNEST(range(1, len(l))) AS t(j)
          GROUP BY 1, 2)"""

  /** CTE `v$i` — `v${i-1}` with round i's winning merge `b$i` applied
    * via the same greedy `list_reduce` fold as [[greedyMerge]]. */
  private def rewriteCte(i: Int): String =
    s"""v$i AS MATERIALIZED (SELECT w, list_reduce(
          list_prepend(chr(31), list_filter(string_split(ws, chr(31)), x -> x <> '')),
          (acc, s) -> CASE WHEN ends_with(acc, chr(31) || b.lft || chr(31)) AND s = b.rgt
            THEN substr(acc, 1, CAST(len(acc) - len(b.lft) - 1 AS INT)) || b.lft || b.rgt || chr(31)
            ELSE acc || s || chr(31) END) AS ws, freq FROM v${i - 1}, b$i b)"""

  /** The shared unrolled CTE chain replaying [[bpeFitWithVocab]] in
    * DuckDB: v0 (packed vocab) then, per round i, pair counts pI, the
    * count-argmax bI, and the rewritten vocab vI.
    * Ends with CTEs `b1..b$k` and `v$k` for callers to select from. */
  private def bpeCtesSql(table: String, textCol: String, k: Int,
                         byteLevel: Boolean = false): String = {
    val steps = (1 to k).map { i =>
      s"""${pairCte(i)},
          b$i AS (SELECT lft, rgt, cnt FROM p$i ORDER BY cnt DESC, lft ASC, rgt ASC LIMIT 1),
          ${rewriteCte(i)}"""
    }
    (packedVocabCtes(table, textCol, byteLevel) +: steps).mkString(", ")
  }

  /** DuckDB oracle for [[bpeFit]]: the unrolled merge sequence. */
  def bpeFitSql(table: String, textCol: String, k: Int,
                byteLevel: Boolean = false): String = {
    val rows = (1 to k).map(i =>
      s"SELECT $i AS step, lft AS merge_left, rgt AS merge_right, cnt FROM b$i")
      .mkString(" UNION ALL ")
    s"WITH ${bpeCtesSql(table, textCol, k, byteLevel)} SELECT * FROM ($rows)"
      .replaceAll("\\s+", " ")
  }

  // ---------------------------------------------------------------------
  // WordPiece training (round 11) — the third dominant tokenizer-training
  // algorithm (Schuster & Nakajima 2012, "Japanese and Korean Voice
  // Search"; the BERT tokenizer): BPE's loop with a LIKELIHOOD-scored
  // merge rule — each round merges the pair maximizing
  // cnt(l,r) / (cnt(l)·cnt(r)), the pair whose merge most increases a
  // unigram LM's corpus likelihood, instead of raw pair count.
  // ---------------------------------------------------------------------

  /** The (merges, finalVocab) of `k` WordPiece merge rounds. Same scale
    * contract as [[bpeFitWithVocab]] — the corpus is read once (vocab
    * build); each round adds ONE more |vocab|-bounded aggregation (the
    * per-symbol counts the score denominator needs) joined to the pair
    * counts, a 1-row argmax to the driver, and the same [[greedyMerge]]
    * map-only rewrite. The score quotient is computed double/double
    * (each factor an exact-integer cast, so the IEEE result is
    * bit-identical cross-engine; the double PRODUCT in the denominator
    * also avoids int64 overflow at corpus-scale symbol counts);
    * ties break (lft ASC, rgt ASC). */
  def wordpieceFitWithVocab(docs: DataFrame, textCol: String, k: Int,
                            byteLevel: Boolean = false)
      : (DataFrame, DataFrame) = {
    require(k >= 1, "need at least one merge round")
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .filter(!col("w").contains(Sep))
      .withColumn("ws", packedSyms(col("w"), byteLevel))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= k && !exhausted) {
      val symCounts = vocab
        .withColumn("__l", expr(s"filter(split(ws, '$Sep'), x -> x <> '')"))
        .select(col("freq"), explode(col("__l")).as("s"))
        .groupBy("s").agg(sum("freq").as("c"))
      val best = pairCountsOf(vocab)
        .join(symCounts.select(col("s").as("lft"), col("c").as("cl")), "lft")
        .join(symCounts.select(col("s").as("rgt"), col("c").as("cr")), "rgt")
        .withColumn("__score", col("cnt").cast("double")
          / (col("cl").cast("double") * col("cr").cast("double")))
        .orderBy(col("__score").desc, col("lft").asc, col("rgt").asc)
        .limit(1)
        .select("lft", "rgt", "cnt")
        .as[(String, String, Long)].collect()
      best.headOption match {
        case None => exhausted = true
        case Some((l, r, cnt)) =>
          merges += ((step, l, r, cnt))
          vocab = vocab
            .withColumn("ws", greedyMerge(col("ws"), l, r))
            .localCheckpoint(true)
          step += 1
      }
    }
    (merges.result().toDF("step", "merge_left", "merge_right", "cnt"), vocab)
  }

  /** Just the ordered merge table of [[wordpieceFitWithVocab]]. */
  def wordpieceFit(docs: DataFrame, textCol: String, k: Int): DataFrame =
    wordpieceFitWithVocab(docs, textCol, k)._1

  /** Encode the corpus with a TRAINED WordPiece vocab — the vocab-join
    * path of [[bpeApplyTrained]] (on the training corpus every word is
    * in the vocab, and a WordPiece-trained `ws` IS the word's greedy
    * segmentation), renamed to the WordPiece contract columns. */
  def wordpieceApplyTrained(docs: DataFrame, idCol: String, textCol: String,
                            vocab: DataFrame, byteLevel: Boolean = false): DataFrame =
    bpeApplyTrained(docs, idCol, textCol, vocab, byteLevel)
      .withColumnRenamed("n_bpe_tokens", "n_wp_tokens")
      .withColumnRenamed("bpe_md5", "wp_md5")

  /** The unrolled CTE chain replaying [[wordpieceFitWithVocab]]: per
    * round, pair counts pI, symbol counts sI, the likelihood-argmax bI,
    * and the same greedy-fold rewrite vI as BPE. */
  private def wordpieceCtesSql(table: String, textCol: String, k: Int,
                               byteLevel: Boolean = false): String = {
    val steps = (1 to k).map { i =>
      s"""${pairCte(i)},
          s$i AS (SELECT s, CAST(SUM(freq) AS BIGINT) AS c FROM (
            SELECT unnest(list_filter(string_split(ws, chr(31)), x -> x <> '')) AS s, freq
            FROM v${i - 1}) GROUP BY s),
          b$i AS (SELECT lft, rgt, cnt FROM (
            SELECT p.lft, p.rgt, p.cnt,
              CAST(p.cnt AS DOUBLE) / (CAST(sl.c AS DOUBLE) * CAST(sr.c AS DOUBLE)) AS score
            FROM p$i p JOIN s$i sl ON sl.s = p.lft JOIN s$i sr ON sr.s = p.rgt)
            ORDER BY score DESC, lft ASC, rgt ASC LIMIT 1),
          ${rewriteCte(i)}"""
    }
    (packedVocabCtes(table, textCol, byteLevel) +: steps).mkString(", ")
  }

  /** DuckDB oracle for [[wordpieceFit]]. */
  def wordpieceFitSql(table: String, textCol: String, k: Int,
                      byteLevel: Boolean = false): String = {
    val rows = (1 to k).map(i =>
      s"SELECT $i AS step, lft AS merge_left, rgt AS merge_right, cnt FROM b$i")
      .mkString(" UNION ALL ")
    s"WITH ${wordpieceCtesSql(table, textCol, k, byteLevel)} SELECT * FROM ($rows)"
      .replaceAll("\\s+", " ")
  }

  /** DuckDB oracle for [[wordpieceApplyTrained]] over the fit's corpus. */
  def wordpieceApplySql(table: String, textCol: String, k: Int,
                        idCol: String, byteLevel: Boolean = false): String = {
    val toks = TextFunctions.tokensSql(textCol)
    s"""WITH ${wordpieceCtesSql(table, textCol, k, byteLevel)},
       tok AS (SELECT $idCol, i, l[i] AS w FROM (
         SELECT $idCol, $toks AS l FROM $table), UNNEST(range(1, len(l) + 1)) AS t(i)),
       enc AS (SELECT tok.$idCol, tok.i,
         list_filter(string_split(vk.ws, chr(31)), x -> x <> '') AS syms
         FROM tok JOIN v$k vk USING (w)),
       sym AS (SELECT $idCol, i, unnest(syms) AS s,
         unnest(range(1, len(syms) + 1)) AS j FROM enc)
       SELECT $idCol, CAST(COUNT(*) AS BIGINT) AS n_wp_tokens,
         md5(string_agg(s, ' ' ORDER BY i, j)) AS wp_md5
       FROM sym GROUP BY $idCol""".replaceAll("\\s+", " ")
  }

  // ---------------------------------------------------------------------
  // Unigram-LM tokenizer (Kudo 2018, arXiv:1804.10959 — the SentencePiece
  // unigram model): seed inventory → hard-EM Viterbi refinement → apply.
  // ---------------------------------------------------------------------

  /** OOV floor: the log-prob (micro-units) charged for a single character
    * no piece covers — guarantees every word is segmentable. */
  val UnkLogpU: Long = -20000000L

  /** ln(p) quantized to the same micro-unit grid the SQL oracles use. */
  private def lnMicro(p: Double): Long =
    math.floor(BigDecimal(math.log(p)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble * 1000000 + 0.5).toLong

  /** The distinct-word table (w, freq) — every unigram stage runs over
    * this, never the corpus. In byte-level mode, `w` is the word's
    * [[org.apache.spark.sql.graft.ByteAlpha]] encoding (injective, so
    * the counts are identical); pieces are then substrings over the
    * closed 256-symbol alphabet and the coverage guarantee extends to
    * every byte the corpus contains. */
  private def wordTable(docs: DataFrame, textCol: String,
                        byteLevel: Boolean = false): DataFrame = {
    val tok = explode(TextFunctions.tokens(col(textCol))).as("w")
    val base = docs.select(tok)
    (if (byteLevel)
       base.select(org.apache.spark.sql.graft.ByteAlpha(col("w")).as("w"))
     else base)
      .groupBy("w").agg(count(lit(1)).as("freq"))
  }

  /** Seed piece inventory of the unigram fit: every substring of every
    * word up to `maxPieceLen` chars, frequency-weighted; ALL single
    * characters survive (coverage guarantee) plus the top `seedSize`
    * multi-char pieces by (cnt DESC, piece ASC); scores are
    * ln(cnt / total-over-selected) in exact micro-units. All stages are
    * |vocab|-bounded (the corpus is read once for the word table); the
    * substring explode is |vocab| × maxPieceLen × word-length, the total
    * is a broadcast 1-row aggregate. */
  def unigramSeed(docs: DataFrame, textCol: String,
                  maxPieceLen: Int, seedSize: Int,
                  byteLevel: Boolean = false): DataFrame = {
    require(maxPieceLen >= 1 && seedSize >= 1)
    val pieces = wordTable(docs, textCol, byteLevel)
      .select(col("freq"), explode(expr(
        s"""flatten(transform(sequence(1, length(w)),
              s -> transform(sequence(s, least(length(w), s + ${maxPieceLen - 1})),
                e -> substring(w, s, e - s + 1))))""")).as("piece"))
      .groupBy("piece").agg(sum("freq").as("cnt"))
    val chars = pieces.filter(length(col("piece")) === 1)
    val multi = pieces.filter(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece").asc).limit(seedSize)
    val sel = chars.unionAll(multi)
    val tot = sel.agg(sum("cnt").as("t"))
    sel.crossJoin(broadcast(tot))
      .select(col("piece"), col("cnt"),
        floor(round(log(col("cnt").cast("double") / col("t").cast("double")), 6)
          * 1000000 + 0.5).cast("long").as("logp_u"))
  }

  /** Hard-EM (Viterbi-training) refinement of the seed inventory — the
    * unigram tokenizer FIT: each round segments every distinct word with
    * [[org.apache.spark.sql.graft.UnigramViterbi]] under the current
    * scores (E), re-estimates scores from the frequency-weighted piece
    * counts (M), drops multi-char pieces the best segmentations stopped
    * using, and keeps unused single chars at a floor one unit below the
    * worst used piece (coverage). After `emRounds`, the inventory is
    * pruned to all chars + the top multi-char pieces by (logp_u DESC,
    * piece ASC) up to `vocabSize`. Returns (piece, logp_u).
    *
    * Scale shape: the corpus is read ONCE (word table, localCheckpointed);
    * each round is one |vocab|-bounded map + piece-keyed groupBy; the
    * piece table itself (≤ chars + seedSize rows — tokenizer-vocab sized,
    * like the IVF centroid set) is the only driver residency. Hard-EM's
    * Viterbi likelihood is monotonically non-decreasing over rounds (the
    * M-step maximizes the E-step's objective; UnigramSpec pins it). */
  def unigramFit(docs: DataFrame, textCol: String, maxPieceLen: Int = 6,
                 seedSize: Int = 2000, emRounds: Int = 3,
                 vocabSize: Int = 1000, byteLevel: Boolean = false): DataFrame = {
    require(emRounds >= 1 && vocabSize >= 1)
    val spark = docs.sparkSession
    import spark.implicits._
    val words = wordTable(docs, textCol, byteLevel).localCheckpoint(true)
    var pieces: Array[(String, Long)] =
      unigramSeed(docs, textCol, maxPieceLen, seedSize, byteLevel)
        .select("piece", "logp_u").as[(String, Long)].collect().sortBy(_._1)
    var round = 0
    while (round < emRounds) {
      val model = pieces.toMap
      val counts = words
        .select(col("freq"), explode(org.apache.spark.sql.graft.UnigramViterbi(
          col("w"), model, UnkLogpU)).as("piece"))
        .groupBy("piece").agg(sum("freq").as("cnt"))
        .as[(String, Long)].collect().toMap
      val total = counts.values.sum.toDouble
      val used = pieces.filter(p => counts.contains(p._1))
        .map { case (p, _) => p -> lnMicro(counts(p) / total) }
      val floorU = (if (used.nonEmpty) used.map(_._2).min else UnkLogpU) - 1000000L
      val keptChars = pieces.collect {
        case (p, _) if p.length == 1 && !counts.contains(p) => p -> floorU
      }
      pieces = (used ++ keptChars).sortBy(_._1)
      round += 1
    }
    val chars = pieces.filter(_._1.length == 1)
    val multi = pieces.filter(_._1.length > 1)
      .sortBy { case (p, lp) => (-lp, p) }.take(vocabSize)
    spark.createDataset((chars ++ multi).sortBy(_._1).toSeq)
      .toDF("piece", "logp_u")
  }

  /** Encode a corpus with a TRAINED unigram inventory: the DISTINCT word
    * table is Viterbi-segmented once (|vocab|-bounded — the expression
    * never runs corpus-wide), corpus tokens join their word's encoding
    * (map-side against a broadcastable table; Catalyst decides), docs
    * re-assemble in token order to (idCol, n_pieces, pieces_md5) — the
    * same compare-friendly projection as [[bpeApplyTrained]]. */
  def unigramApplyTrained(docs: DataFrame, idCol: String, textCol: String,
                          pieces: Map[String, Long],
                          byteLevel: Boolean = false): DataFrame = {
    val enc = wordTable(docs, textCol, byteLevel)
      .select(col("w"), org.apache.spark.sql.graft.UnigramViterbi(
        col("w"), pieces, UnkLogpU).as("__syms"))
    val toks = docs
      .select(col(idCol), posexplode(TextFunctions.tokens(col(textCol))).as(Seq("i", "w")))
    (if (byteLevel)
       toks.withColumn("w", org.apache.spark.sql.graft.ByteAlpha(col("w")))
     else toks)
      .join(enc, Seq("w"))
      .groupBy(col(idCol))
      .agg(sum(size(col("__syms"))).as("n_pieces"),
        collect_list(struct(col("i"), col("__syms"))).as("__parts"))
      .select(col(idCol), col("n_pieces"),
        md5(concat_ws(" ",
          flatten(transform(array_sort(col("__parts")), p => p("__syms"))))
          .cast("binary")).as("pieces_md5"))
  }

  /** DuckDB oracle for [[unigramSeed]] over a (textCol) relation. */
  def unigramSeedSql(table: String, textCol: String,
                     maxPieceLen: Int, seedSize: Int,
                     byteLevel: Boolean = false): String = {
    val toks = TextFunctions.tokensSql(textCol)
    val wExpr = if (byteLevel) byteAlphaSql("w0") else "w0"
    s"""WITH v AS (SELECT w, COUNT(*) AS freq FROM (
           SELECT $wExpr AS w FROM (SELECT unnest($toks) AS w0 FROM $table)) GROUP BY w),
       p AS (SELECT substr(w, CAST(s AS INT), CAST(e - s + 1 AS INT)) AS piece,
           CAST(SUM(freq) AS BIGINT) AS cnt
         FROM v, UNNEST(range(1, len(w) + 1)) AS t1(s),
           UNNEST(range(s, least(len(w), s + ${maxPieceLen - 1}) + 1)) AS t2(e)
         GROUP BY 1),
       sel AS (SELECT piece, cnt FROM p WHERE len(piece) = 1
         UNION ALL
         SELECT piece, cnt FROM (SELECT piece, cnt FROM p WHERE len(piece) > 1
           ORDER BY cnt DESC, piece ASC LIMIT $seedSize)),
       tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS t FROM sel)
       SELECT piece, cnt,
         CAST(FLOOR(ROUND(LN(CAST(cnt AS DOUBLE) / t), 6) * 1000000 + 0.5E0)
           AS BIGINT) AS logp_u
       FROM sel CROSS JOIN tot""".replaceAll("\\s+", " ")
  }

  // ---------------------------------------------------------------------
  // Unrolled Viterbi-DP oracle for the unigram fit/apply (round 12) —
  // promotes q_unigram_fit / q_unigram_apply / q_token_fertility_unigram
  // from rows-only to oracle-green.
  // ---------------------------------------------------------------------

  /** The Viterbi DP as a DuckDB RECURSIVE CTE, replaying
    * [[org.apache.spark.sql.graft.UnigramViterbi]] exactly: the working
    * row per word carries a sliding window of the last `maxPieceLen`
    * best scores (s1 = best(j), s2 = best(j−1), …) plus the backpointer
    * string `backs` (one digit per position — piece lengths are ≤ 9),
    * so each iteration advances j by one for EVERY word with ONE scan
    * and `maxPieceLen` LEFT JOINs into the model — no aggregate in the
    * recursive term. Candidates for piece length l coalesce to a
    * sentinel far below any reachable score; `greatest` takes the max
    * and the descending CASE resolves score ties to the LARGER l — the
    * expression's exact tie rule. A second recursive CTE walks `backs`
    * from the end, prepending pieces, reproducing the engine's
    * backtrace. Emits `dp$tag`/`fin$tag`/`rec$tag`/`seg$tag(w, pieces)`
    * against model CTE `$model(piece, logp_u)` over word CTE
    * `vw(w, freq)`. */
  private def viterbiCtes(tag: String, model: String, maxPieceLen: Int): String = {
    require(maxPieceLen <= 9, "backs packs one digit per position")
    val S = "-900000000000000"
    val ls = 1 to maxPieceLen
    val joins = ls.map { l =>
      s"LEFT JOIN $model m$l ON d.j + 1 >= $l AND m$l.piece = substr(d.w, d.j + 2 - $l, $l)"
    }.mkString(" ")
    val cands = ls.map { l =>
      val cost = if (l == 1) s"COALESCE(m1.logp_u, $UnkLogpU)" else s"m$l.logp_u"
      s"COALESCE(CASE WHEN d.j + 1 >= $l THEN d.s$l + ($cost) END, $S) AS c$l"
    }.mkString(", ")
    val sCols = ls.map(l => s"CAST($S AS BIGINT) AS s$l").mkString(", ")
    val shift = (2 to maxPieceLen).map(l => s"s${l - 1}").mkString(", ")
    val backl = ls.reverse.init.map(l => s"WHEN c$l = best THEN $l").mkString(" ")
    s"""dp$tag(w, L, j, ${ls.map("s" + _).mkString(", ")}, backs) AS (
         SELECT w, len(w), 0, CAST(0 AS BIGINT) AS s1,
           ${ls.tail.map(l => s"CAST($S AS BIGINT) AS s$l").mkString(", ")}, '' FROM vw
         UNION ALL
         SELECT w, L, j + 1, best, $shift,
           backs || CAST((CASE $backl ELSE 1 END) AS VARCHAR)
         FROM (
           SELECT q.*, greatest(${ls.map("c" + _).mkString(", ")}) AS best FROM (
             SELECT d.w, d.L, d.j, ${ls.map(l => s"d.s$l").mkString(", ")}, d.backs, $cands
             FROM dp$tag d $joins
             WHERE d.j < d.L) q)
       ),
       fin$tag AS (SELECT w, backs FROM dp$tag WHERE j = L),
       rec$tag(w, p, pieces) AS (
         SELECT w, len(w), CAST([] AS VARCHAR[]) FROM fin$tag
         UNION ALL
         SELECT r.w, r.p - CAST(substr(f.backs, r.p, 1) AS INT),
           list_prepend(substr(r.w,
             r.p - CAST(substr(f.backs, r.p, 1) AS INT) + 1,
             CAST(substr(f.backs, r.p, 1) AS INT)), r.pieces)
         FROM rec$tag r JOIN fin$tag f ON f.w = r.w
         WHERE r.p > 0
       ),
       seg$tag AS MATERIALIZED (SELECT w, pieces FROM rec$tag WHERE p = 0)"""
  }

  /** The full unrolled fit chain: word table → seed model → `emRounds` ×
    * (Viterbi-segment every distinct word → re-estimate scores → floor
    * unused chars, drop unused multis) → prune to chars + top
    * `vocabSize` multi-char pieces. Replays [[unigramFit]]'s hard-EM
    * loop CTE-for-collect: counts share the corpus total (unk pieces
    * included, as the engine's `counts.values.sum` does), scores are the
    * same ROUND(LN(·),6) micro-units every iterative oracle uses, and
    * the floor is min(used) − 1e6 with the UnkLogpU fallback. Ends in
    * `modelF(piece, logp_u)` plus `seg_f$emRounds` helpers. */
  private def unigramFitCtes(table: String, textCol: String, maxPieceLen: Int,
                             seedSize: Int, emRounds: Int, vocabSize: Int,
                             byteLevel: Boolean = false): String = {
    val toks = TextFunctions.tokensSql(textCol)
    val wExpr = if (byteLevel) byteAlphaSql("w0") else "w0"
    val head =
      s"""vw AS MATERIALIZED (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM (
            SELECT $wExpr AS w FROM (SELECT unnest($toks) AS w0 FROM $table)) GROUP BY w),
          model0 AS MATERIALIZED (SELECT piece, logp_u FROM
            (${unigramSeedSql(table, textCol, maxPieceLen, seedSize, byteLevel)}))"""
    val rounds = (0 until emRounds).map { r =>
      s"""${viterbiCtes(s"_f$r", s"model$r", maxPieceLen)},
          cnt$r AS MATERIALIZED (SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
            SELECT v.freq, unnest(s.pieces) AS piece
            FROM seg_f$r s JOIN vw v USING (w)) GROUP BY piece),
          tot$r AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS t FROM cnt$r),
          used$r AS (SELECT m.piece,
              CAST(FLOOR(ROUND(LN(CAST(c.cnt AS DOUBLE) / t.t), 6) * 1000000 + 0.5E0)
                AS BIGINT) AS logp_u
            FROM model$r m JOIN cnt$r c USING (piece) CROSS JOIN tot$r t),
          flo$r AS (SELECT COALESCE(MIN(logp_u), $UnkLogpU) - 1000000 AS f FROM used$r),
          model${r + 1} AS MATERIALIZED (
            SELECT piece, logp_u FROM used$r
            UNION ALL
            SELECT m.piece, flo.f AS logp_u FROM model$r m CROSS JOIN flo$r flo
            WHERE len(m.piece) = 1
              AND m.piece NOT IN (SELECT piece FROM cnt$r))"""
    }
    val prune =
      s"""modelF AS MATERIALIZED (
            SELECT piece, logp_u FROM model$emRounds WHERE len(piece) = 1
            UNION ALL
            SELECT piece, logp_u FROM (
              SELECT piece, logp_u FROM model$emRounds WHERE len(piece) > 1
              ORDER BY logp_u DESC, piece ASC LIMIT $vocabSize))"""
    (head +: rounds :+ prune).mkString(", ")
  }

  /** DuckDB oracle for [[unigramFit]] — the pruned (piece, logp_u). */
  def unigramFitSql(table: String, textCol: String, maxPieceLen: Int,
                    seedSize: Int, emRounds: Int, vocabSize: Int,
                    byteLevel: Boolean = false): String =
    (s"WITH RECURSIVE ${unigramFitCtes(table, textCol, maxPieceLen, seedSize, emRounds, vocabSize, byteLevel)} " +
      "SELECT piece, logp_u FROM modelF").replaceAll("\\s+", " ")

  /** The fit chain plus one more Viterbi pass under the PRUNED model —
    * `segA(w, pieces)` is each distinct word's final segmentation. */
  private def unigramApplyCtes(table: String, textCol: String, maxPieceLen: Int,
                               seedSize: Int, emRounds: Int, vocabSize: Int,
                               byteLevel: Boolean = false): String =
    s"""${unigramFitCtes(table, textCol, maxPieceLen, seedSize, emRounds, vocabSize, byteLevel)},
       ${viterbiCtes("A", "modelF", maxPieceLen)}"""

  /** DuckDB oracle for [[unigramApplyTrained]] over the fit's corpus. */
  def unigramApplySql(table: String, textCol: String, maxPieceLen: Int,
                      seedSize: Int, emRounds: Int, vocabSize: Int,
                      idCol: String, byteLevel: Boolean = false): String = {
    val toks = TextFunctions.tokensSql(textCol)
    // unigram segmentations key on the (byte-encoded) word itself, so in
    // byte mode the tok CTE maps corpus tokens through the byte alphabet
    // — mirroring unigramApplyTrained's ByteAlpha(col("w")) join side
    val wExpr = if (byteLevel) byteAlphaSql("l[i]") else "l[i]"
    s"""WITH RECURSIVE ${unigramApplyCtes(table, textCol, maxPieceLen, seedSize, emRounds, vocabSize, byteLevel)},
       tok AS (SELECT $idCol, i, $wExpr AS w FROM (
         SELECT $idCol, $toks AS l FROM $table), UNNEST(range(1, len(l) + 1)) AS t(i)),
       sym AS (SELECT tok.$idCol, tok.i, unnest(s.pieces) AS piece,
         unnest(range(1, len(s.pieces) + 1)) AS j2
         FROM tok JOIN segA s USING (w))
       SELECT $idCol, CAST(COUNT(*) AS BIGINT) AS n_pieces,
         md5(string_agg(piece, ' ' ORDER BY i, j2)) AS pieces_md5
       FROM sym GROUP BY $idCol""".replaceAll("\\s+", " ")
  }

  /** DuckDB oracle for [[bpeApplyTrained]] over the fit's own corpus.
    * In byte mode only the packed-vocab alphabet changes — the vocab
    * join key stays the original word, so the tok CTE is untouched. */
  def bpeApplySql(table: String, textCol: String, k: Int, idCol: String,
                  byteLevel: Boolean = false): String = {
    val toks = TextFunctions.tokensSql(textCol)
    s"""WITH ${bpeCtesSql(table, textCol, k, byteLevel)},
       tok AS (SELECT $idCol, i, l[i] AS w FROM (
         SELECT $idCol, $toks AS l FROM $table), UNNEST(range(1, len(l) + 1)) AS t(i)),
       enc AS (SELECT tok.$idCol, tok.i,
         list_filter(string_split(vk.ws, chr(31)), x -> x <> '') AS syms
         FROM tok JOIN v$k vk USING (w)),
       sym AS (SELECT $idCol, i, unnest(syms) AS s,
         unnest(range(1, len(syms) + 1)) AS j FROM enc)
       SELECT $idCol, CAST(COUNT(*) AS BIGINT) AS n_bpe_tokens,
         md5(string_agg(s, ' ' ORDER BY i, j)) AS bpe_md5
       FROM sym GROUP BY $idCol""".replaceAll("\\s+", " ")
  }
}
