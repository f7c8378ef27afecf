package graft.operators

import org.apache.spark.sql.DataFrame
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
    * kept as `·s1·s2·…·sn·` (leading + trailing separator), so a merge
    * of pair (a, b) is `replace(ws, ·a·b·, ·ab·)` — applied TWICE,
    * because a left-to-right string replace shares the boundary
    * separator with an immediately following occurrence and skips it;
    * skipped occurrences are provably isolated (a skip needs its leading
    * separator consumed by a MATCH, so two in a row are impossible), so
    * the second pass catches them all and the result equals greedy
    * left-to-right BPE merging. The same double-replace runs in the
    * DuckDB oracle — merge application is engine-identical BY
    * CONSTRUCTION, and BpeSpec pins the greedy equivalence against the
    * native [[org.apache.spark.sql.graft.BpeEncode]] walker. */
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
  def bpeFitWithVocab(docs: DataFrame, textCol: String, k: Int)
      : (DataFrame, DataFrame) = {
    require(k >= 1, "need at least one merge round")
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .filter(!col("w").contains(Sep)) // separator-carrying words would corrupt the packing
      .withColumn("ws", concat(lit(Sep), regexp_replace(col("w"), "(.)", "$1" + Sep)))
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
          val pat = Sep + l + Sep + r + Sep
          val rep = Sep + l + r + Sep
          vocab = vocab
            .withColumn("ws",
              replace(replace(col("ws"), lit(pat), lit(rep)), lit(pat), lit(rep)))
            .localCheckpoint(true)
          step += 1
      }
    }
    (merges.result().toDF("step", "merge_left", "merge_right", "cnt"), vocab)
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
                      vocab: DataFrame): DataFrame = {
    val enc = docs
      .select(col(idCol), posexplode(TextFunctions.tokens(col(textCol))).as(Seq("i", "w")))
      .join(vocab.select(col("w"), col("ws")), Seq("w"), "left")
      .withColumn("__ws", coalesce(col("ws"),
        concat(lit(Sep), regexp_replace(col("w"), "(.)", "$1" + Sep))))
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

  /** The shared unrolled CTE chain replaying [[bpeFitWithVocab]] in
    * DuckDB: v0 (packed vocab) then, per round i, pair counts pI, the
    * argmax bI, and the rewritten vocab vI via the SAME double-replace.
    * Ends with CTEs `b1..b$k` and `v$k` for callers to select from. */
  private def bpeCtesSql(table: String, textCol: String, k: Int): String = {
    val toks = TextFunctions.tokensSql(textCol)
    val head =
      s"""v AS (SELECT w, COUNT(*) AS freq FROM (
            SELECT unnest($toks) AS w FROM $table) GROUP BY w
            HAVING instr(w, chr(31)) = 0),
          v0 AS (SELECT w, chr(31) || regexp_replace(w, '(.)', '\\1' || chr(31), 'g') AS ws,
            freq FROM v)"""
    val steps = (1 to k).map { i =>
      s"""p$i AS (SELECT l[j] AS lft, l[j+1] AS rgt, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
            SELECT list_filter(string_split(ws, chr(31)), x -> x <> '') AS l, freq
            FROM v${i - 1}), UNNEST(range(1, len(l))) AS t(j)
            GROUP BY 1, 2),
          b$i AS (SELECT lft, rgt, cnt FROM p$i ORDER BY cnt DESC, lft ASC, rgt ASC LIMIT 1),
          v$i AS (SELECT w, replace(replace(ws,
            chr(31) || b.lft || chr(31) || b.rgt || chr(31),
            chr(31) || b.lft || b.rgt || chr(31)),
            chr(31) || b.lft || chr(31) || b.rgt || chr(31),
            chr(31) || b.lft || b.rgt || chr(31)) AS ws, freq FROM v${i - 1}, b$i b)"""
    }
    (head +: steps).mkString(", ")
  }

  /** DuckDB oracle for [[bpeFit]]: the unrolled merge sequence. */
  def bpeFitSql(table: String, textCol: String, k: Int): String = {
    val rows = (1 to k).map(i =>
      s"SELECT $i AS step, lft AS merge_left, rgt AS merge_right, cnt FROM b$i")
      .mkString(" UNION ALL ")
    s"WITH ${bpeCtesSql(table, textCol, k)} SELECT * FROM ($rows)"
      .replaceAll("\\s+", " ")
  }

  /** DuckDB oracle for [[bpeApplyTrained]] over the fit's own corpus. */
  def bpeApplySql(table: String, textCol: String, k: Int, idCol: String): String = {
    val toks = TextFunctions.tokensSql(textCol)
    s"""WITH ${bpeCtesSql(table, textCol, k)},
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
