package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Distributed logistic-regression FIT over hashing-trick features — the
  * training half of the fastText/CCNet-style quality classifier whose
  * inference shape is `TextFunctions.hashedLinearScoreU` (reference:
  * the quality/language keep-drop filters of CCNet, Wenzek et al. 2020,
  * and fastText supervised training, Joulin et al. 2017 — implemented
  * from the published algorithm, full-batch gradient descent).
  *
  * All state is INTEGER micro-units so the whole training trajectory is
  * engine-exact and oracle-certifiable (the q_bpe_fit/q_pagerank
  * pattern — the oracle unrolls the same K rounds as chained CTEs):
  *
  *   - features: token -> bucket b = hash32(tok) mod dim; per-doc counts
  *     c_b (exact longs), built IN-ROW (sort the bucket array, cut runs)
  *     — no featurization shuffle, one corpus read, localCheckpointed.
  *   - forward pass: dot_u = sum_b w_u[b]*c_b (exact long; weights enter
  *     the plan as a broadcast map literal, so the pass is MAP-ONLY);
  *     p_u = floor(sigmoid(dot_u/1e6)*1e6 + 0.5) — the one double step,
  *     identical parenthesization both engines (1-ULP exp drift absorbed
  *     by the micro-unit floor).
  *   - gradient: g_b = sum_docs (p_u - y_u)*c_b — an exact long sum,
  *     order-independent, so the corpus-wide aggregation is shuffle-safe
  *     cross-engine. ONE exchange per round, collapsing to <= dim rows.
  *   - update: w_u <- w_u - g_b div (nDocs*lrScale), JVM truncating Long
  *     division == DuckDB `//` (verified: both -7/2 -> -3).
  *
  * Scale shape: the corpus is read once (featurize) and each round costs
  * one map-only pass + one partial-agg exchange of tasks x dim rows + a
  * <= dim driver collect — the same "driver loop over bounded state"
  * contract as the BPE fit. Above [[MapLiteralMaxDim]] buckets the map
  * literal automatically swaps for a broadcast join on the exploded
  * features (`withErr`'s join path — same exact integer arithmetic, one
  * extra idCol-keyed exchange per round), so production dims never
  * compile a 100k-entry literal into every task.
  */
object Classifier {

  /** Per-doc hashed-feature rows: (idCol, y_u, fs: array<struct<b,c>>).
    * Bucket counts are computed in-row: hash the tokens to buckets, sort
    * the bucket array, and cut it at run starts — no shuffle, no explode.
    * Docs with zero tokens are excluded (no features, both engines). */
  def featurize(docs: DataFrame, idCol: String, textCol: String,
                labelU: Column, dim: Int): DataFrame = {
    require(dim > 0, "dim must be positive")
    docs
      .withColumn("__toks", TextFunctions.tokens(col(textCol)))
      .filter(size(col("__toks")) >= 1)
      .withColumn("__bs", array_sort(transform(col("__toks"),
        t => TextFunctions.expr_hash32(t) % dim)))
      // run starts of the sorted bucket array (0-based); get() is
      // null-safe at i-1 = -1, and true||null = true keeps i = 0
      .withColumn("__st", filter(sequence(lit(0), size(col("__bs")) - 1),
        i => (i === 0) || (get(col("__bs"), i) =!= get(col("__bs"), i - 1))))
      .select(col(idCol), labelU.cast("long").as("y_u"),
        transform(sequence(lit(0), size(col("__st")) - 1), j => struct(
          get(col("__bs"), get(col("__st"), j)).as("b"),
          (coalesce(get(col("__st"), j + 1), size(col("__bs")))
            - get(col("__st"), j)).cast("long").as("c"))).as("fs"))
  }

  /** dot_u over the in-row feature list against a broadcast weight-map
    * literal (empty map = round 0 = all-zero weights). */
  private def dotU(w: Map[Long, Long]): Column =
    if (w.isEmpty) lit(0L)
    else aggregate(col("fs"), lit(0L), (acc, f) =>
      acc + f.getField("c") *
        coalesce(try_element_at(typedLit(w), f.getField("b")), lit(0L)))

  /** Above this dim the per-round weight state stops entering the plan
    * as a map literal (a 100k-entry literal would compile into every
    * task) and switches to the broadcast-join path. */
  private[graft] val MapLiteralMaxDim = 4096

  /** feat + `__err` column for one GD round. Literal path (small dim):
    * map-only in-row fold against the weight-map literal. Join path
    * (production dim): features explode against a BROADCAST weight
    * table, per-doc dot re-assembles with one idCol-keyed exchange, and
    * errs join back to the checkpointed features — same exact integer
    * arithmetic, one extra bounded exchange per round. */
  private[graft] def withErr(feat: DataFrame, w: Map[Long, Long],
                             idCol: String, joinPath: Boolean): DataFrame =
    if (!joinPath) feat.withColumn("__err", pU(dotU(w)) - col("y_u"))
    else {
      val spark = feat.sparkSession
      import spark.implicits._
      val wDf = w.toSeq.toDF("__wb", "__w")
      val dots = feat
        .select(col(idCol), explode(col("fs")).as("__f"))
        .join(broadcast(wDf), col("__f")("b") === col("__wb"), "left")
        .groupBy(col(idCol))
        .agg(sum(col("__f")("c") * coalesce(col("__w"), lit(0L))).as("__dot"))
      feat.join(dots, Seq(idCol))
        .withColumn("__err", pU(col("__dot")) - col("y_u"))
        .drop("__dot")
    }

  /** floor(sigmoid(dot_u/1e6)*1e6 + 0.5) — micro-unit probability; the
    * EXACT same parenthesization is emitted on the oracle side. */
  private def pU(dot: Column): Column =
    floor(lit(1.0) / (lit(1.0) + exp(-(dot.cast("double") / lit(1.0e6))))
      * lit(1.0e6) + lit(0.5)).cast("long")

  /** Run `rounds` of full-batch GD; returns (weights, nDocs, feat) where
    * feat is the localCheckpointed featurization the weights were fit
    * on (reusable for eval without re-reading the corpus). */
  def fitWeights(docs: DataFrame, idCol: String, textCol: String,
                 labelU: Column, dim: Int, rounds: Int,
                 lrScale: Long): (Map[Long, Long], Long, DataFrame) = {
    require(rounds >= 1 && lrScale >= 1)
    val feat = featurize(docs, idCol, textCol, labelU, dim)
      .localCheckpoint(true)
    val n = feat.count()
    require(n > 0, "classifier fit needs at least one non-empty document")
    val lrDiv = n * lrScale
    val joinPath = dim > MapLiteralMaxDim
    var w = Map.empty[Long, Long]
    var r = 0
    while (r < rounds) {
      val grads = withErr(feat, w, idCol, joinPath)
        .select(col("__err"), explode(col("fs")).as("f"))
        .groupBy(col("f.b").as("b"))
        .agg(sum(col("__err") * col("f.c")).as("g"))
        .collect() // <= dim rows
      val upd = grads.map { row =>
        val b = row.getLong(0)
        b -> (w.getOrElse(b, 0L) - row.getLong(1) / lrDiv)
      }.toMap
      w = w ++ upd
      r += 1
    }
    (w, n, feat)
  }

  /** Contract shape: the learned weight table (b, w_u), <= dim rows. */
  def fitLogistic(docs: DataFrame, idCol: String, textCol: String,
                  labelU: Column, dim: Int, rounds: Int,
                  lrScale: Long): DataFrame = {
    val (w, _, feat) = fitWeights(docs, idCol, textCol, labelU, dim,
      rounds, lrScale)
    val rows = w.toSeq.sortBy(_._1)
    import feat.sparkSession.implicits._
    rows.toDF("b", "w_u")
  }

  /** Contract shape: per-doc evaluation of the LEARNED model on its
    * training corpus — (idCol, p_u, y_u, correct); prediction threshold
    * p_u >= 500000 (sigmoid 0.5). Map-only over the fit's checkpointed
    * features. */
  def evalLogistic(docs: DataFrame, idCol: String, textCol: String,
                   labelU: Column, dim: Int, rounds: Int,
                   lrScale: Long): DataFrame = {
    val (w, _, feat) = fitWeights(docs, idCol, textCol, labelU, dim,
      rounds, lrScale)
    withErr(feat, w, idCol, joinPath = dim > MapLiteralMaxDim)
      .select(col(idCol), (col("__err") + col("y_u")).as("p_u"), col("y_u"))
      .withColumn("correct",
        (col("p_u") >= 500000L) === (col("y_u") === 1000000L))
  }

  // -------------------------------------------------------------------
  // DuckDB oracle: the K training rounds unrolled as chained CTEs with
  // byte-identical integer arithmetic and the same sigmoid formula.
  // -------------------------------------------------------------------

  /** Shared CTE prefix (f/lr/w0/e0/g0/w1/.../wK) used VERBATIM by the
    * fit and eval oracles so the two cannot drift. `labelUSql` must
    * yield micro-units (1000000 / 0) like the Spark `labelU` column. */
  def fitChainSql(table: String, idCol: String, textCol: String,
                  labelUSql: String, dim: Int, rounds: Int,
                  lrScale: Long): String = {
    val toks = TextFunctions.tokensSql(textCol)
    val b = s"(${TextFunctions.hash32Sql("t")}) % $dim"
    val sig = // identical parenthesization to pU()
      "CAST(FLOOR(1E0 / (1E0 + exp(-(CAST(CAST(SUM(c * w) AS BIGINT) AS DOUBLE) " +
        "/ 1000000E0))) * 1000000E0 + 0.5E0) AS BIGINT)"
    val head =
      s"""WITH f AS (
           SELECT $idCol, y_u, b, CAST(COUNT(*) AS BIGINT) AS c FROM (
             SELECT $idCol, y_u, $b AS b FROM (
               SELECT $idCol, y_u, unnest(l) AS t
               FROM (SELECT $idCol, $labelUSql AS y_u, $toks AS l FROM $table)
               WHERE len(l) >= 1))
           GROUP BY 1, 2, 3),
         lr AS (SELECT CAST(COUNT(DISTINCT $idCol) * $lrScale AS BIGINT) AS d FROM f),
         w0 AS (SELECT DISTINCT b, CAST(0 AS BIGINT) AS w FROM f)"""
    val roundsSql = (0 until rounds).map { r =>
      s""", e$r AS (
           SELECT $idCol, $sig - y_u AS err
           FROM f JOIN w$r USING (b) GROUP BY $idCol, y_u),
         g$r AS (
           SELECT b, CAST(SUM(err * c) AS BIGINT) AS g
           FROM f JOIN e$r USING ($idCol) GROUP BY b),
         w${r + 1} AS (
           SELECT w$r.b, w$r.w - g$r.g // lr.d AS w
           FROM w$r JOIN g$r ON w$r.b = g$r.b, lr)"""
    }.mkString
    (head + roundsSql).replaceAll("\\s+", " ")
  }

  def fitSql(table: String, idCol: String, textCol: String,
             labelUSql: String, dim: Int, rounds: Int,
             lrScale: Long): String =
    fitChainSql(table, idCol, textCol, labelUSql, dim, rounds, lrScale) +
      s" SELECT b, w AS w_u FROM w$rounds"

  def evalSql(table: String, idCol: String, textCol: String,
              labelUSql: String, dim: Int, rounds: Int,
              lrScale: Long): String = {
    val sig =
      "CAST(FLOOR(1E0 / (1E0 + exp(-(CAST(CAST(SUM(c * w) AS BIGINT) AS DOUBLE) " +
        "/ 1000000E0))) * 1000000E0 + 0.5E0) AS BIGINT)"
    fitChainSql(table, idCol, textCol, labelUSql, dim, rounds, lrScale) +
      s""" SELECT $idCol, p_u, y_u, (p_u >= 500000) = (y_u = 1000000) AS correct
         FROM (SELECT $idCol, y_u, $sig AS p_u
               FROM f JOIN w$rounds USING (b) GROUP BY $idCol, y_u)"""
        .replaceAll("\\s+", " ")
  }
}
